package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cell.CellIndex
import graft.lineage.Lineage

/**
 * Iceberg-style cell-partitioned store (SURVEY.md §4.4; north_rule:
 * "explicit range-partitioning by cell prefix"). No Iceberg runtime jar
 * ships in this image (§7.4), so the layout is plain parquet with the
 * same pruning surface:
 *
 *  - directory partition column `cell_prefix = cell >> prefixShift`
 *    (the Iceberg partition transform analog) → partition pruning;
 *  - `repartitionByRange(cell)` + `sortWithinPartitions(cell)` before
 *    write → tight per-file/row-group min/max stats on `cell` → range
 *    predicates prune files and row groups (the `load_window` pushdown,
 *    geoRpro raster.py:388-392, now on STORAGE rather than in GDAL).
 *
 * `scanCover` is the read path every windowed/clipped scan uses: coarse
 * cover cells → merged descendant ranges → partition filter on
 * cell_prefix + BETWEEN disjunction on cell (pushdown-friendly on this
 * stored column; the derived-column binary-search path in Clip is for
 * computed cells).
 */
object TileStore {

  val DefaultPrefixShift = 14

  /** Write `df` (must carry a LONG `cell` column) cell-range-partitioned. */
  def write(df: DataFrame, path: String,
            prefixShift: Int = DefaultPrefixShift,
            numRanges: Int = 0): Unit = {
    val withPrefix = df.withColumn("cell_prefix",
      shiftrightunsigned(col("cell"), prefixShift))
    val ranged =
      if (numRanges > 0)
        withPrefix.repartitionByRange(numRanges, col("cell"))
      else withPrefix.repartitionByRange(col("cell"))
    ranged.sortWithinPartitions("cell")
      .write.partitionBy("cell_prefix").mode("overwrite").parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S7 multi-band ordered sink (the Rstack `interleave='band'` +
    * reorder_items write, sent2_charcoal.py:87-92): band columns land
    * in the CALLER's order after `cell` — parquet schema order is the
    * band order, so a reader's positional band access matches the
    * reference's band indices. */
  def writeBands(stacked: DataFrame, path: String, bands: Seq[String],
                 prefixShift: Int = DefaultPrefixShift): Unit =
    write(stacked.select((col("cell") +: bands.map(col)): _*), path, prefixShift)

  /** Above this many merged ranges, fall back to prefix pruning + one
    * binary-search probe (a 1000-term BETWEEN disjunction costs more in
    * filter evaluation than it saves in row-group pruning). */
  val MaxStoredDisjuncts = 64

  /** Cover-pruned scan: partition filter on cell_prefix + cell range
    * predicate (both reach the parquet reader). */
  def scanCover(spark: SparkSession, path: String, cover: Array[Long],
                res: Int, prefixShift: Int = DefaultPrefixShift): DataFrame = {
    val flat = CellIndex.coverRanges(cover, res)
    // an empty cover (degenerate clip geometry) scans nothing — not a
    // reduce-on-empty crash
    if (flat.isEmpty) return read(spark, path).filter(lit(false))
    // adjacent cell ranges usually share a prefix: merge the shifted
    // (lo, hi) pairs before building the partition predicate, or a
    // fragmented cover makes an O(ranges)-term disjunction where a
    // handful of prefix intervals suffice
    val prefixRanges = flat.grouped(2)
      .map { case Array(lo, hi) => (lo >>> prefixShift, hi >>> prefixShift) }
      .foldLeft(List.empty[(Long, Long)]) {
        case ((plo, phi) :: rest, (lo, hi)) if lo <= phi + 1 =>
          (plo, math.max(phi, hi)) :: rest // ranges arrive lo-sorted
        case (acc, r) => r :: acc
      }.reverse
    val prefixPred = prefixRanges
      .map { case (lo, hi) => col("cell_prefix").between(lo, hi) }
      .reduce(_ || _)
    val cellPred =
      if (flat.length / 2 <= MaxStoredDisjuncts)
        flat.grouped(2).map { case Array(lo, hi) => col("cell").between(lo, hi) }
          .reduce(_ || _)
      else graft.functions.cell_in_ranges(col("cell"), flat)
    read(spark, path).filter(prefixPred).filter(cellPred)
  }

  // ---- snapshot surface (Iceberg-style versioned commits, §7.5) ----------
  //
  // Layout:   <store>/data/snap=<id>/...        cell-partitioned parquet
  //           <store>/data/snap=<id>/_manifest  that snapshot's lineage
  //                                             rows (read via lineage();
  //                                             kept INSIDE the snap dir
  //                                             so a retried commit's
  //                                             overwrite wipes orphans —
  //                                             NOT the Lineage
  //                                             _graft_manifest layout)
  //           <store>/_snapshots/<id>           commit markers
  //
  // The MARKER is the commit point (the analog of Iceberg's atomic
  // metadata swap): data files and manifest rows land first, the marker
  // is created via write-to-temp + atomic rename LAST. Readers resolve
  // only marked snapshots, so a crash anywhere before the rename leaves
  // the store logically at the previous snapshot — re-running the job
  // overwrites the orphaned snap directory (idempotent).

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def snapshotDir(store: String): String = s"$store/_snapshots"
  def dataDir(store: String, snapshotId: String): String =
    s"$store/data/snap=$snapshotId"

  /** Committed snapshot ids, ascending by sequence number. */
  def snapshots(spark: SparkSession, store: String): Seq[String] = {
    val dir = new Path(snapshotDir(store))
    val f = fs(spark, store)
    if (!f.exists(dir)) Seq.empty
    // strict s<digits> match, digits bounded to Long range: a stray
    // file in _snapshots (partially written marker on a non-atomic FS,
    // unrelated junk, even an adversarial s<20-digits> name) must be
    // ignored, not NumberFormatException every read/commit
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(_.matches("s\\d{1,18}")).sortBy(_.drop(1).toLong).toSeq
  }

  /** Snapshot-carrying atomic commit: writes `df` (must carry a LONG
    * `cell` column) cell-range-partitioned under a fresh snapshot id,
    * writes the per-coarse-tile lineage rows (`rows_out` counts — the
    * north_rule "per-partition checkpoints carrying lineage") INSIDE
    * the snapshot directory, then atomically publishes the marker.
    * A crashed attempt leaves only an unmarked snap dir; the retry
    * reuses the id and its overwrite wipes BOTH orphan data and orphan
    * lineage rows — commit is idempotent end to end (an append-style
    * global manifest would duplicate rows on retry). Single-writer per
    * store by contract (real Iceberg arbitrates concurrent committers
    * with optimistic locking on the metadata swap).
    * `input`: the UPSTREAM relation the committed rows were derived
    * from (must carry a fine-res `cell` column) — its per-coarse-tile
    * counts become the manifest's `rows_in`. None means df itself IS
    * the input (a plain sink write transforms nothing), so
    * rows_in == rows_out is the honest count, not a placeholder.
    * Returns the new snapshot id. */
  def commit(df: DataFrame, store: String, jobId: String,
             coarseSteps: Int = 6,
             prefixShift: Int = DefaultPrefixShift,
             input: Option[DataFrame] = None): String = {
    val spark = df.sparkSession
    val nextSeq = snapshots(spark, store)
      .lastOption.map(_.drop(1).toLong + 1).getOrElse(0L)
    val snapshotId = s"s$nextSeq"
    write(df, dataDir(store, snapshotId), prefixShift)
    val outCounts = read(spark, dataDir(store, snapshotId))
      .groupBy(graft.functions.cell_parent(col("cell"), coarseSteps).as("cell"))
      .agg(count(lit(1)).as("rows_out"))
    val withIn = input match {
      case None => outCounts.withColumn("rows_in", col("rows_out"))
      case Some(in) =>
        val inCounts = in
          .groupBy(graft.functions.cell_parent(col("cell"), coarseSteps).as("cell"))
          .agg(count(lit(1)).as("rows_in"))
        // full outer: a coarse tile can exist on only one side (all its
        // input rows filtered out, or output cells the input lacked)
        outCounts.join(inCounts, Seq("cell"), "full_outer")
          .select(col("cell"),
            coalesce(col("rows_out"), lit(0L)).as("rows_out"),
            coalesce(col("rows_in"), lit(0L)).as("rows_in"))
    }
    withIn
      .select(lit(jobId).as("job_id"), lit(snapshotId).as("snapshot_id"),
        col("cell"), col("rows_in"), col("rows_out"),
        // stamped when the lineage rows land (pre-marker; the marker's
        // mtime is the commit point) — same meaning as
        // Lineage.recordCompleted, not a 0L placeholder
        lit(System.currentTimeMillis()).as("completed_at"))
      // underscore prefix: data scans of the snap dir skip it (hidden
      // path convention), only lineage() reads it explicitly
      .write.mode("overwrite").parquet(s"${dataDir(store, snapshotId)}/_manifest")
    // commit point: temp file + atomic rename
    val f = fs(spark, store)
    f.mkdirs(new Path(snapshotDir(store)))
    val tmp = new Path(snapshotDir(store), s".$snapshotId.tmp")
    val out = f.create(tmp, true)
    out.write(s"""{"snapshot_id":"$snapshotId","job_id":"$jobId"}"""
      .getBytes("UTF-8"))
    out.close()
    if (!f.rename(tmp, new Path(snapshotDir(store), snapshotId)))
      throw new java.io.IOException(s"snapshot publish failed: $snapshotId")
    snapshotId
  }

  /** Lineage rows of all COMMITTED snapshots (Lineage.ManifestSchema
    * shape — feed straight into Lineage.pending for resume). Unmarked
    * snap dirs are invisible here too. */
  def lineage(spark: SparkSession, store: String): DataFrame =
    snapshots(spark, store)
      .map(id => spark.read.schema(Lineage.ManifestSchema)
        .parquet(s"${dataDir(store, id)}/_manifest"))
      .reduceOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(Lineage.ManifestSchema)))

  /** Read the store AT a committed snapshot (time travel). */
  def readAt(spark: SparkSession, store: String, snapshotId: String): DataFrame = {
    require(snapshots(spark, store).contains(snapshotId),
      s"snapshot $snapshotId is not committed in $store")
    read(spark, dataDir(store, snapshotId))
  }

  /** Read the latest committed snapshot. */
  def readLatest(spark: SparkSession, store: String): DataFrame = {
    val ids = snapshots(spark, store)
    require(ids.nonEmpty, s"no committed snapshots in $store")
    read(spark, dataDir(store, ids.last))
  }

  /** Cover-pruned scan at a committed snapshot. */
  def scanCoverAt(spark: SparkSession, store: String, snapshotId: String,
                  cover: Array[Long], res: Int,
                  prefixShift: Int = DefaultPrefixShift): DataFrame = {
    require(snapshots(spark, store).contains(snapshotId),
      s"snapshot $snapshotId is not committed in $store")
    scanCover(spark, dataDir(store, snapshotId), cover, res, prefixShift)
  }

  /** Iceberg-style `expire_snapshots`: drop all but the newest
    * `keepLast` committed snapshots and every unmarked orphan snap dir
    * (crashed attempts). Order matters for readers: the MARKER is
    * removed first, so a concurrent reader can never resolve a
    * snapshot whose data is mid-delete — it either reads the fully
    * intact snapshot or doesn't see it at all. Single-writer per store
    * by contract (same as commit). Returns the expired snapshot ids. */
  def expireSnapshots(spark: SparkSession, store: String,
                      keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val f = fs(spark, store)
    val committed = snapshots(spark, store)
    val expire = committed.dropRight(keepLast)
    expire.foreach { id =>
      // marker FIRST, and abort loudly if it did not go: proceeding to
      // delete the data of a still-resolvable snapshot would create
      // exactly the committed-but-dataless state the ordering prevents
      if (!f.delete(new Path(snapshotDir(store), id), false))
        throw new java.io.IOException(
          s"expireSnapshots: could not remove marker $id in $store")
      f.delete(new Path(dataDir(store, id)), true)
    }
    // orphan data dirs with no marker (crashed before publish): the
    // NEXT commit would reuse the lowest free sequence and overwrite,
    // but until then they hold dead bytes — vacuum them too
    val dataRoot = new Path(s"$store/data")
    val keep = snapshots(spark, store).toSet
    val orphans =
      if (!f.exists(dataRoot)) Seq.empty
      else f.listStatus(dataRoot).map(_.getPath).toSeq
        .filter(p => p.getName.startsWith("snap="))
        .filterNot(p => keep.contains(p.getName.stripPrefix("snap=")))
    orphans.foreach(p => f.delete(p, true))
    expire
  }

  /** R3 pyramid streamed to storage (the at-scale form of
    * Resample.pyramid): each level is written under level=<r> as soon
    * as it is built from the previous one, and the parent's cache is
    * released immediately — at most TWO levels are ever persisted,
    * instead of the whole rollup chain. */
  def writePyramid(base: DataFrame, res: Int, minRes: Int, valueCol: String,
                   how: String, store: String,
                   prefixShift: Int = DefaultPrefixShift): Unit = {
    require(how == "sum" || how == "count" || how == "min" || how == "max")
    val reAgg = if (how == "count") "sum" else how
    var level = base.persist()
    write(level, s"$store/level=$res", prefixShift)
    var r = res
    while (r > minRes) {
      val next = graft.ops.Resample
        .downsample(level.drop("cell_prefix"), valueCol, 1,
          if (r == res) how else reAgg)
        .persist()
      write(next, s"$store/level=${r - 1}", prefixShift)
      level.unpersist()
      level = next
      r -= 1
    }
    level.unpersist()
  }
}
