package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded top-k heap: the aggregation buffer of [[TopKByScore]].
 *
 * Holds at most k (score, id) entries; inserting beyond k evicts the
 * WORST entry, so the buffer is O(k) regardless of how many candidate
 * rows flow through — the partial (map-side) aggregate reduces each
 * input partition to <= k rows per group BEFORE the shuffle, and the
 * final merge sees only numPartitions * k entries per group. This is
 * the two-phase top-k that replaces a global
 * `Window.partitionBy(qid).orderBy(...)` + `row_number <= k` (which
 * shuffles EVERY scored candidate of a query into one task and sorts
 * the full corpus there — a single-reducer scale-killer at 10^12 rows).
 *
 * Ordering contract (must match the window formulation it replaces and
 * the DuckDB oracle's `row_number() OVER (ORDER BY score [DESC], id)`):
 * best = lowest score when `ascending`, highest otherwise; ties break
 * toward the smaller id; NULL scores order last in BOTH directions
 * (callers' scores are non-null by construction; the rule just keeps
 * the operator total).
 */
final class TopKBuffer(val k: Int, val ascending: Boolean) {
  // parallel arrays, worst-first binary heap (array 0 = worst kept entry)
  private[functions] var scores = new Array[Double](math.min(k, 16))
  private[functions] var nulls = new Array[Boolean](math.min(k, 16))
  private[functions] var ids = new Array[Long](math.min(k, 16))
  private[functions] var size = 0

  /** true iff entry a is strictly better (ranks earlier) than entry b.
    * Double.compare (not `<`) keeps the order TOTAL for NaN — NaN sorts
    * as the largest double, matching both Spark's sort order and the
    * DuckDB oracle's row_number ORDER BY; with raw `<` a NaN (reachable
    * via 0/0 cosine on an all-zero quantized vector) compares false both
    * ways, can block the heap root, and violates sortWith's contract. */
  private def better(sa: Double, na: Boolean, ia: Long,
                     sb: Double, nb: Boolean, ib: Long): Boolean = {
    if (na != nb) return nb // non-null beats null
    if (!na && sa != sb) { // `!=` first: -0.0 == 0.0 falls to id tiebreak
      val c = java.lang.Double.compare(sa, sb)
      if (c != 0) return if (ascending) c < 0 else c > 0
    }
    ia < ib
  }

  private def worseAt(i: Int, j: Int): Boolean =
    better(scores(j), nulls(j), ids(j), scores(i), nulls(i), ids(i))

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val n = nulls(i); nulls(i) = nulls(j); nulls(j) = n
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && worseAt(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var w = i
      if (l < size && worseAt(l, w)) w = l
      if (r < size && worseAt(r, w)) w = r
      if (w == i) done = true else { swap(i, w); i = w }
    }
  }

  def insert(score: Double, isNull: Boolean, id: Long): Unit = {
    if (size < k) {
      if (size == scores.length) {
        val cap = math.min(k, scores.length * 2)
        scores = java.util.Arrays.copyOf(scores, cap)
        nulls = java.util.Arrays.copyOf(nulls, cap)
        ids = java.util.Arrays.copyOf(ids, cap)
      }
      scores(size) = score; nulls(size) = isNull; ids(size) = id
      size += 1
      siftUp(size - 1)
    } else if (k > 0 && better(score, isNull, id, scores(0), nulls(0), ids(0))) {
      scores(0) = score; nulls(0) = isNull; ids(0) = id
      siftDown()
    }
  }

  def mergeInto(target: TopKBuffer): Unit = {
    var i = 0
    while (i < size) { target.insert(scores(i), nulls(i), ids(i)); i += 1 }
  }

  /** Entries best-first as (id, score) internal rows. */
  def sorted(): Array[Any] = {
    val idx = (0 until size).sortWith { (a, b) =>
      better(scores(a), nulls(a), ids(a), scores(b), nulls(b), ids(b))
    }
    idx.map { i =>
      new GenericInternalRow(Array[Any](ids(i),
        if (nulls(i)) null else scores(i)))
    }.toArray[Any]
  }
}

/**
 * topk_by(score, id, k, ascending): per-group bounded top-k as a native
 * typed-imperative aggregate — runs in ObjectHashAggregate with a
 * partial stage below the exchange (verified by PlanShapeSpec), exactly
 * like Spark's own collect_list/percentile family. Output is
 * array<struct<id: long, score: double>> sorted best-first; callers
 * posexplode to recover (rank, id, score).
 */
case class TopKByScore(scoreExpr: Expression, idExpr: Expression,
                       k: Int, ascending: Boolean,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with ExpectsInputTypes {
  require(k > 0, s"topk_by needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def inputTypes = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "topk_by"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, ascending)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val idv = idExpr.eval(input)
    if (idv != null) {
      val sv = scoreExpr.eval(input)
      if (sv == null) buffer.insert(0.0, isNull = true, idv.asInstanceOf[Long])
      else buffer.insert(sv.asInstanceOf[Double], isNull = false, idv.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.mergeInto(buffer)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = new GenericArrayData(buffer.sorted())

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      out.writeDouble(buffer.scores(i))
      out.writeBoolean(buffer.nulls(i))
      out.writeLong(buffer.ids(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k, ascending)
    var i = 0
    while (i < n) {
      val s = in.readDouble(); val nl = in.readBoolean(); val id = in.readLong()
      buf.insert(s, nl, id)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}
