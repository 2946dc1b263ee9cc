package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming near-duplicate detection over a continuous page stream —
 * the streaming member of the SimHash dedup family (batch:
 * graft.text.Dedup.simhashPairs). Beyond-reference (the reference is
 * batch-only).
 *
 * Shape: each page's 60-bit simhash signature (the same codegen kernel
 * as batch) explodes into its 4 pigeonhole band keys (the SHARED
 * Dedup.simhashBandStructs layout — stream and batch cannot drift);
 * state lives PER BAND BUCKET (flatMapGroupsWithState keyed by
 * (band, key)) and holds the (id, sig, event-time) of pages seen in
 * that bucket within the pairing horizon. An arriving page emits one
 * pair row per state entry within `maxHamming` — pairs surface the
 * moment the second member arrives, stamped with that member's event
 * time (`ts`), and a pair sharing several bands emits once per shared
 * band: collapse downstream with
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
 *    deterministically.
 */
object NearDupStream {

  case class BandEvent(band: Int, key: Long, doc_id: Long, sig: Long,
                       ts: java.sql.Timestamp)
  case class BucketState(entries: List[(Long, Long, Long)]) // (id, sig, tsMs)
  case class PairHit(id_a: Long, id_b: Long, hamming: Int, band: Int,
                     ts: java.sql.Timestamp)

  /** pages must carry (idCol: long, textCol: string, tsCol: timestamp).
    * `horizon` is both the watermark delay and the pairing window.
    * Returns the append-mode pair stream. */
  def nearDupPairs(pages: DataFrame, idCol: String, textCol: String,
                   tsCol: String,
                   horizon: java.time.Duration = java.time.Duration.ofHours(1),
                   maxHamming: Int = 3, maxBucket: Int = 64): Dataset[PairHit] = {
    import pages.sparkSession.implicits._
    import graft.functions.simhash60
    val horizonMs = horizon.toMillis
    val sig = pages.select(col(idCol).as("doc_id"),
        simhash60(col(textCol)).as("sig"), col(tsCol).as("ts"))
      .withWatermark("ts", s"${horizon.toSeconds} seconds")
    val banded = sig.select(col("doc_id"), col("sig"), col("ts"),
        explode(graft.text.Dedup.simhashBandStructs(col("sig"))).as("bk"))
      .select(col("bk.band").as("band"), col("bk.k0").as("key"),
        col("doc_id"), col("sig"), col("ts"))
      .as[BandEvent]

    def update(bandKey: (Int, Long), it: Iterator[BandEvent],
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
            if (oid != e.doc_id && math.abs(eMs - oMs) <= horizonMs) {
              val h = java.lang.Long.bitCount(osig ^ e.sig)
              if (h <= maxHamming)
                out += PairHit(math.min(oid, e.doc_id),
                  math.max(oid, e.doc_id), h, bandKey._1,
                  new java.sql.Timestamp(math.max(eMs, oMs)))
            }
          }
          entries = ((e.doc_id, e.sig, eMs) :: entries)
            .sortBy { case (id, _, t) => (-t, -id) } // newest first
            .take(maxBucket) // size cap: oldest drop first
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
}
