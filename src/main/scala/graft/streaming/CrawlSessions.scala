package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful streaming operators for continuously-arriving crawl data
 * (SURVEY.md §2.10 / builder mandate: Structured Streaming with
 * watermarks and `flatMapGroupsWithState` custom state; the reference
 * is batch-only — these are the streaming counterparts of its
 * per-source grouping semantics).
 *
 * Parity note: `sessionize` is the STREAMING formulation (in batch mode
 * flatMapGroupsWithState never fires timeouts, so trailing open
 * sessions would be dropped) — its batch twin is [[sessionizeBatch]]
 * (window lag/cumsum), and the spec proves the two emit identical
 * sessions on the same rows. `dedupPages` runs unchanged on batch
 * frames (withWatermark is a batch no-op).
 */
object CrawlSessions {

  case class PageEvent(host: String, ts: java.sql.Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(host: String, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Long)

  /**
   * Gap-based sessionization per host: a session is a maximal run of
   * events with inter-arrival <= `gapMs` (an arrival at exactly the gap
   * still joins the session — the streaming merge and the batch twin
   * both split strictly-greater-than). Sessions closed by an
   * in-batch gap emit immediately; the trailing (still-open) session
   * emits when the event-time watermark passes `last + gapMs`
   * (GroupStateTimeout.EventTimeTimeout) — state per host is ONE
   * (start, last, n) interval, so memory is O(active hosts), not
   * O(events): the 100 TB shape for clickstream/crawl sessionization.
   *
   * Late (out-of-order, within-watermark) events are handled by an
   * interval sweep: the state interval and the batch's events merge
   * wherever they are within `gapMs` of each other — a late event
   * in-gap-of the open session EXTENDS it (including lowering its
   * start), one further in the past forms its own earlier session.
   * The one inherent approximation of append-mode streaming: an event
   * older than a session that was ALREADY emitted cannot retract it
   * and starts a fresh session instead.
   */
  def sessionize(events: Dataset[PageEvent], gapMs: Long,
                 watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def update(host: String, it: Iterator[PageEvent],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(host, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.last), s.n))
      } else {
        // sweep: state interval + point events, ordered by start; merge
        // neighbors within gapMs; everything but the final interval is
        // closed (followed by a gap) and emits now
        val intervals = (state.getOption.map(s => (s.start, s.last, s.n)).toList
            ++ it.map(e => (e.ts.getTime, e.ts.getTime, 1L)))
          .sortBy(iv => (iv._1, iv._2))
        var out = List.empty[SessionOut]
        var cur = intervals.head
        intervals.tail.foreach { iv =>
          if (iv._1 - cur._2 <= gapMs)
            cur = (cur._1, math.max(cur._2, iv._2), cur._3 + iv._3)
          else {
            out ::= SessionOut(host, new java.sql.Timestamp(cur._1),
              new java.sql.Timestamp(cur._2), cur._3)
            cur = iv
          }
        }
        state.update(SessionState(cur._1, cur._2, cur._3))
        // a timeout at-or-before the current watermark is rejected by
        // Spark — clamp so a session whose gap already elapsed fires on
        // the next microbatch instead of crashing the query
        state.setTimeoutTimestamp(
          math.max(cur._2 + gapMs, state.getCurrentWatermarkMs() + 1))
        out.reverse.iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /**
   * Batch sessionization twin (the relational lag/cumsum formulation a
   * SQL engine can replay — the oracle gate): a session starts where
   * the previous event of the same key is more than `gapUs` earlier
   * (or absent); session id = running count of starts. The per-key
   * window is the inherent shape of sessionization — key cardinality
   * (users/hosts) is the parallelism, and no key's history crosses
   * partitions. Emits (key, sid, session_start_us, session_end_us,
   * n_events); timestamps as exact epoch MICROS Longs (a seconds cast
   * truncates sub-second gaps differently across engines).
   */
  def sessionizeBatch(events: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy("ts_us", idCol)
    val run = Window.partitionBy(keyCol).orderBy("ts_us", idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      // NTZ parquet timestamps cast through LTZ under the engine's UTC
      // session zone — epoch micros then equals DuckDB's epoch_us on
      // the same naive value
      .withColumn("ts_us", unix_micros(col(tsCol).cast("timestamp_ltz")))
      .withColumn("prev", lag("ts_us", 1).over(w))
      .withColumn("nf",
        when(col("prev").isNull || col("ts_us") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("nf").over(run))
      .groupBy(col(keyCol), col("sid"))
      .agg(min("ts_us").as("session_start_us"),
        max("ts_us").as("session_end_us"),
        count(lit(1)).as("n_events"))
  }

  /** Streaming exact dedup of crawl pages: state keyed by content
    * fingerprint, evicted once the watermark passes (bounded state —
    * the streaming member of the dedup family). First occurrence wins;
    * a duplicate arriving within the watermark window is dropped. */
  def dedupPages(pages: DataFrame, textCol: String,
                 watermark: String = "1 hour"): DataFrame =
    pages
      .withColumn("fp", md5(col(textCol).cast("binary")))
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
}
