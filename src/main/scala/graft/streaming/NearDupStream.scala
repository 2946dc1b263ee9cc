package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

/**
 * Streaming near-duplicate detection over a continuous page stream —
 * the streaming members of the dedup family (batch twins:
 * graft.text.Dedup.simhashPairs, Dedup.candidates over minhash bands,
 * graft.vector.Ann.bandedCandidates over hyperplane bands).
 * Beyond-reference (the reference is batch-only).
 *
 * Shape: each page's signature (the SAME kernels as batch) explodes
 * into its pigeonhole band keys; state lives PER BAND BUCKET
 * (flatMapGroupsWithState keyed by (band, key)) and holds the
 * (id, payload, event-time) of pages seen in that bucket within the
 * pairing horizon. An arriving page emits one pair row per qualifying
 * state entry — pairs surface the moment the second member arrives,
 * stamped with that member's event time (`ts`), and a pair sharing
 * several bands emits once per shared band: collapse downstream with
 * `.withWatermark("ts", d).dropDuplicatesWithinWatermark("id_a", "id_b")`
 * if exactly-once pairs are required.
 *
 * Horizon contract: two pages pair iff their event times are within
 * `horizon` of each other (given a band match) — the same guarantee
 * window dropDuplicatesWithinWatermark gives. That requires keeping a
 * state entry until the WATERMARK passes `entry.ts + horizon` (a
 * future non-late event has ts >= watermark, so only then can no
 * pairable event still arrive); evicting at `entry.ts < watermark`
 * would silently miss non-late pairs depending on micro-batch timing.
 *
 * State is bounded two ways, the same discipline as the batch path:
 *  - TIME: eviction + whole-bucket event-time timeout as above;
 *  - SIZE: a bucket holds at most `maxBucket` entries (the streaming
 *    form of Dedup.capBuckets — a boilerplate bucket would otherwise
 *    grow state AND emit quadratically); overflow drops OLDEST first,
 *    deterministically, and every dropped entry counts into the
 *    caller's `overflowDrops` accumulator (the streaming analog of
 *    batch bucketStats — "no silent truncation": operators can see
 *    when the cap is eating recall).
 */
object NearDupStream {

  case class BandEvent(band: Int, key: String, doc_id: Long, sig: Long,
                       ts: java.sql.Timestamp)
  case class BucketState(entries: List[(Long, Long, Long)]) // (id, sig, tsMs)
  case class PairHit(id_a: Long, id_b: Long, hamming: Int, band: Int,
                     ts: java.sql.Timestamp)
  case class CandHit(id_a: Long, id_b: Long, band: Int,
                     ts: java.sql.Timestamp)

  /** Shared bucket-pairing core over a banded event stream: keyed by
    * (band, key), an arriving event pairs with every live same-bucket
    * entry within the horizon that passes `verify(sigA, sigB)` (None =
    * not a pair; Some(h) = pair with verify metric h). The state/
    * timeout/cap discipline is identical for every signature family —
    * only the banding and the verify differ. */
  private def bandedPairStream(banded: Dataset[BandEvent], horizonMs: Long,
                               maxBucket: Int,
                               verify: (Long, Long) => Option[Int],
                               overflowDrops: Option[LongAccumulator])
      : Dataset[PairHit] = {
    import banded.sparkSession.implicits._

    def update(bandKey: (Int, String), it: Iterator[BandEvent],
               state: GroupState[BucketState]): Iterator[PairHit] = {
      val wm = state.getCurrentWatermarkMs()
      if (state.hasTimedOut) {
        // nothing in the bucket can pair with any future event: drop it
        state.remove()
        Iterator.empty
      } else {
        // evict entries whose pairing window closed (ts + horizon < wm)
        var entries = state.getOption.map(_.entries).getOrElse(Nil)
          .filter(_._3 + horizonMs >= wm)
        // deterministic processing order regardless of arrival batching
        val events = it.toSeq.sortBy(e => (e.ts.getTime, e.doc_id))
        val out = Seq.newBuilder[PairHit]
        events.foreach { e =>
          val eMs = e.ts.getTime
          entries.foreach { case (oid, osig, oMs) =>
            if (oid != e.doc_id && math.abs(eMs - oMs) <= horizonMs)
              verify(osig, e.sig).foreach { h =>
                out += PairHit(math.min(oid, e.doc_id),
                  math.max(oid, e.doc_id), h, e.band,
                  new java.sql.Timestamp(math.max(eMs, oMs)))
              }
          }
          val grown = ((e.doc_id, e.sig, eMs) :: entries)
            .sortBy { case (id, _, t) => (-t, -id) } // newest first
          entries = grown.take(maxBucket) // size cap: oldest drop first
          val dropped = grown.length - entries.length
          if (dropped > 0) overflowDrops.foreach(_.add(dropped.toLong))
        }
        state.update(BucketState(entries))
        // the bucket is fully dead once the watermark passes the
        // newest member's pairing window
        val newest = entries.map(_._3).maxOption.getOrElse(wm)
        state.setTimeoutTimestamp(math.max(newest + horizonMs, wm + 1))
        out.result().iterator
      }
    }

    banded
      .groupByKey(e => (e.band, e.key))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** SimHash streaming near-dup. pages must carry (idCol: long,
    * textCol: string, tsCol: timestamp). `horizon` is both the
    * watermark delay and the pairing window; the band count derives
    * from `maxHamming` exactly as in batch (Dedup.simhashNumBands), so
    * the pigeonhole recall guarantee holds for any supported value.
    * Returns the append-mode pair stream. */
  def nearDupPairs(pages: DataFrame, idCol: String, textCol: String,
                   tsCol: String,
                   horizon: java.time.Duration = java.time.Duration.ofHours(1),
                   maxHamming: Int = 3, maxBucket: Int = 64,
                   overflowDrops: Option[LongAccumulator] = None)
      : Dataset[PairHit] = {
    import pages.sparkSession.implicits._
    import graft.functions.simhash60
    val numBands = graft.text.Dedup.simhashNumBands(maxHamming)
    val sig = pages.select(col(idCol).as("doc_id"),
        simhash60(col(textCol)).as("sig"), col(tsCol).as("ts"))
      .withWatermark("ts", s"${horizon.toSeconds} seconds")
    val banded = sig.select(col("doc_id"), col("sig"), col("ts"),
        explode(graft.text.Dedup.simhashBandStructs(col("sig"), numBands))
          .as("bk"))
      .select(col("bk.band").as("band"),
        col("bk.k0").cast("string").as("key"),
        col("doc_id"), col("sig"), col("ts"))
      .as[BandEvent]
    bandedPairStream(banded, horizon.toMillis, maxBucket,
      (a, b) => {
        val h = java.lang.Long.bitCount(a ^ b)
        if (h <= maxHamming) Some(h) else None
      }, overflowDrops)
  }

  /** Per-row MinHash band keys of a page relation — streaming-safe
    * (no groupBy): all of a doc's shingles live in its own text value,
    * so the per-row array minimum equals the batch groupBy("id").min
    * over exploded occurrences (Dedup.minhash), hash for hash. Emits
    * (band, key, doc_id, ts) with key = the band's rowsPerBand minima
    * joined ':' — the same (band, values) bucket identity as
    * Dedup.bands, in a form one groupByKey can key on at any
    * rowsPerBand. Docs too short to have a shingle emit nothing (they
    * have no batch signature row either). */
  def minhashBandKeys(pages: DataFrame, idCol: String, textCol: String,
                      tsCol: String, numHashes: Int = 8,
                      rowsPerBand: Int = 2, k: Int = 3): DataFrame = {
    require(numHashes % 4 == 0, "numHashes must be a multiple of 4")
    require(numHashes % rowsPerBand == 0, "rowsPerBand must divide numHashes")
    val nSalts = numHashes / 4
    val nBands = numHashes / rowsPerBand
    val sh = graft.text.TextOps.shingles(col(textCol), k)
    // one md5 per (shingle, salt) — the same digest economics as batch
    // minhash (4 independent 32-bit words per digest)
    def salted(s: Int): Column = transform(sh, x =>
      graft.functions.md5_words(
        if (s == 0) x else concat(x, lit(s"#$s"))))
    val withWords = pages.select(
      (col(idCol).as("doc_id") +: col(tsCol).as("ts") +:
        (0 until nSalts).map(s => salted(s).as(s"w$s"))): _*)
    val mins = withWords.select(
      (col("doc_id") +: col("ts") +:
        (0 until numHashes).map(i => array_min(transform(col(s"w${i / 4}"),
          w => element_at(w, i % 4 + 1))).as(s"m$i"))): _*)
      .filter(col("m0").isNotNull)
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(":", (0 until rowsPerBand)
          .map(r => col(s"m${b * rowsPerBand + r}")): _*).as("key"))
    }
    mins.select(col("doc_id"), col("ts"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("doc_id"), col("ts"))
  }

  /** MinHash streaming near-dup CANDIDATES (the streaming twin of
    * `Dedup.candidates(Dedup.bands(Dedup.minhash(...)))`): two docs
    * emit a candidate the moment they share any minhash band bucket
    * within the horizon. Downstream verifies exactly as in batch
    * (exact Jaccard needs the shingle sets — join the candidate stream
    * to a doc-keyed store, or feed a batch Dedup.jaccard over the
    * micro-batch sink). Same state discipline as the simhash stream. */
  def minhashCandidates(pages: DataFrame, idCol: String, textCol: String,
                        tsCol: String,
                        horizon: java.time.Duration = java.time.Duration.ofHours(1),
                        numHashes: Int = 8, rowsPerBand: Int = 2, k: Int = 3,
                        maxBucket: Int = 64,
                        overflowDrops: Option[LongAccumulator] = None)
      : Dataset[CandHit] = {
    import pages.sparkSession.implicits._
    val banded = minhashBandKeys(pages, idCol, textCol, tsCol, numHashes,
        rowsPerBand, k)
      .withWatermark("ts", s"${horizon.toSeconds} seconds")
      .select(col("band"), col("key"), col("doc_id"),
        lit(0L).as("sig"), col("ts"))
      .as[BandEvent]
    bandedPairStream(banded, horizon.toMillis, maxBucket,
      (_, _) => Some(0), overflowDrops)
      .map(p => CandHit(p.id_a, p.id_b, p.band, p.ts))
  }

  /** Embedding streaming near-dup CANDIDATES (the vector member of the
    * streaming dedup family; batch twin: Ann.bandedCandidates — the
    * blocking half of cosineNearDupBanded): two vectors emit a
    * candidate the moment they share any r-of-b hyperplane band bucket
    * within the horizon. The signature is per-row (quantize ->
    * lshSignature — pure expressions, streaming-safe) and the band
    * layout is the SHARED Ann.lshBandStructs, so stream and batch
    * cannot drift. Downstream verifies exact cosine as in batch (join
    * the candidate stream to a vector store by id). Same state
    * discipline as the simhash/minhash streams. */
  def embedNearDupCandidates(vecs: DataFrame, idCol: String, vecCol: String,
                             tsCol: String, dim: Int,
                             horizon: java.time.Duration = java.time.Duration.ofHours(1),
                             numPlanes: Int = 16, rowsPerBand: Int = 8,
                             maxBucket: Int = 64,
                             overflowDrops: Option[LongAccumulator] = None)
      : Dataset[CandHit] = {
    import vecs.sparkSession.implicits._
    import graft.vector.Ann
    val banded = vecs.select(col(idCol).as("doc_id"), col(tsCol).as("ts"),
        Ann.lshSignature(Ann.quantize(col(vecCol)), dim, numPlanes).as("sig"))
      .withWatermark("ts", s"${horizon.toSeconds} seconds")
      .select(col("doc_id"), col("ts"), col("sig"),
        explode(Ann.lshBandStructs(col("sig"), numPlanes, rowsPerBand))
          .as("bk"))
      .select(col("bk.band").as("band"),
        col("bk.k0").cast("string").as("key"),
        col("doc_id"), col("sig"), col("ts"))
      .as[BandEvent]
    bandedPairStream(banded, horizon.toMillis, maxBucket,
      (_, _) => Some(0), overflowDrops)
      .map(p => CandHit(p.id_a, p.id_b, p.band, p.ts))
  }
}
