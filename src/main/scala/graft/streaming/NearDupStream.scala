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
 * as batch) explodes into its 4 pigeonhole band keys; state lives PER
 * BAND BUCKET (flatMapGroupsWithState keyed by (band, key)) and holds
 * the (id, sig, event-time) of pages seen in that bucket within the
 * watermark horizon. An arriving page emits one pair row per state
 * entry within `maxHamming` — pairs surface the moment the second
 * member arrives (streaming latency), and a pair sharing several bands
 * emits once per shared band (collapse downstream with
 * dropDuplicatesWithinWatermark on (id_a, id_b) if exact-once pairs
 * are required).
 *
 * State is bounded two ways, the same discipline as the batch path:
 *  - TIME: entries older than the watermark evict (an old page can no
 *    longer pair with in-watermark arrivals), via event-time timeout;
 *  - SIZE: a bucket holds at most `maxBucket` entries (the streaming
 *    form of Dedup.capBuckets — a boilerplate bucket would otherwise
 *    grow state AND emit quadratically); overflow drops OLDEST first,
 *    deterministically.
 */
object NearDupStream {

  case class BandEvent(band: Int, key: Long, doc_id: Long, sig: Long,
                       ts: java.sql.Timestamp)
  case class BucketState(entries: List[(Long, Long, Long)]) // (id, sig, tsMs)
  case class PairHit(id_a: Long, id_b: Long, hamming: Int, band: Int)

  /** pages must carry (idCol: long, textCol: string, tsCol: timestamp).
    * Returns the append-mode pair stream. */
  def nearDupPairs(pages: DataFrame, idCol: String, textCol: String,
                   tsCol: String, watermark: String = "1 hour",
                   maxHamming: Int = 3, maxBucket: Int = 64): Dataset[PairHit] = {
    import pages.sparkSession.implicits._
    import graft.functions.simhash60
    import graft.text.SimHash.{BandBits, NumBands}
    val mask = (1L << BandBits) - 1L
    val sig = pages.select(col(idCol).as("doc_id"),
        simhash60(col(textCol)).as("sig"), col(tsCol).as("ts"))
      .withWatermark("ts", watermark)
    val banded = sig.select(col("doc_id"), col("sig"), col("ts"),
        explode(array((0 until NumBands).map(b => struct(lit(b).as("band"),
          shiftright(col("sig"), b * BandBits).bitwiseAND(mask).as("key"))): _*))
          .as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("doc_id"), col("sig"), col("ts"))
      .as[BandEvent]

    def update(bandKey: (Int, Long), it: Iterator[BandEvent],
               state: GroupState[BucketState]): Iterator[PairHit] = {
      val wm = state.getCurrentWatermarkMs()
      if (state.hasTimedOut) {
        // whole bucket idle past the watermark horizon: drop it
        state.remove()
        Iterator.empty
      } else {
        var entries = state.getOption.map(_.entries).getOrElse(Nil)
          .filter(_._3 >= wm) // evict out-of-horizon members
        // deterministic processing order regardless of arrival batching
        val events = it.toSeq.sortBy(e => (e.ts.getTime, e.doc_id))
        val out = Seq.newBuilder[PairHit]
        events.foreach { e =>
          entries.foreach { case (oid, osig, _) =>
            if (oid != e.doc_id) {
              val h = java.lang.Long.bitCount(osig ^ e.sig)
              if (h <= maxHamming)
                out += PairHit(math.min(oid, e.doc_id),
                  math.max(oid, e.doc_id), h, bandKey._1)
            }
          }
          entries = ((e.doc_id, e.sig, e.ts.getTime) :: entries)
            .sortBy { case (id, _, t) => (-t, -id) } // newest first
            .take(maxBucket) // size cap: oldest drop first
        }
        state.update(BucketState(entries))
        // clear the bucket once nothing newer than the horizon remains
        val newest = entries.map(_._3).maxOption.getOrElse(wm)
        state.setTimeoutTimestamp(math.max(newest, wm + 1))
        out.result().iterator
      }
    }

    banded
      .groupByKey(e => (e.band, e.key))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
