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
  case class HostSessions(intervals: List[SessionState])
  case class SessionOut(host: String, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Long)

  /**
   * Gap-based sessionization per host: a session is a maximal run of
   * events with inter-arrival <= `gapMs` (an arrival at exactly the gap
   * still joins the session — the streaming merge and the batch twin
   * both split strictly-greater-than). A session emits only once the
   * event-time WATERMARK makes it final — `session_end + gapMs <
   * watermark` — not merely when an in-batch gap follows it: any event
   * the watermark still admits has `ts >= watermark > end + gapMs` and
   * so can never extend an emitted session. (Emitting in-batch-closed
   * sessions eagerly looks equivalent but is not: a within-watermark
   * out-of-order event can BRIDGE two in-batch runs that a same-batch
   * gap had already separated.) Due sessions emit on the microbatch
   * that advances the watermark past them, or on the event-time
   * timeout for quiet hosts.
   *
   * State per host is the list of not-yet-final (start, last, n)
   * intervals — bounded by the watermark horizon: every held interval
   * has `last + gapMs >= watermark`, so at most ~horizon/gap + 1
   * intervals per host, not O(events). Late (out-of-order,
   * within-watermark) events merge into held intervals wherever they
   * are within `gapMs` — extending a session backward, bridging two, or
   * forming their own. The one inherent approximation of append-mode
   * streaming remains: an event older than the watermark (which Spark
   * drops before the operator) cannot retract an already-final session.
   */
  def sessionize(events: Dataset[PageEvent], gapMs: Long,
                 watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def update(host: String, it: Iterator[PageEvent],
               state: GroupState[HostSessions]): Iterator[SessionOut] = {
      val wm = state.getCurrentWatermarkMs()
      // sweep: held intervals + point events, ordered by start; merge
      // neighbors within gapMs (timeout invocations arrive with an
      // empty iterator and reduce to a pure emit-the-due pass)
      val intervals = (state.getOption.map(_.intervals).getOrElse(Nil)
          .map(s => (s.start, s.last, s.n))
          ++ it.map(e => (e.ts.getTime, e.ts.getTime, 1L)))
        .sortBy(iv => (iv._1, iv._2))
      if (intervals.isEmpty) { // timed-out empty state (defensive)
        if (state.exists) state.remove()
        return Iterator.empty
      }
      var merged = List.empty[(Long, Long, Long)]
      var cur = intervals.head
      intervals.tail.foreach { iv =>
        if (iv._1 - cur._2 <= gapMs)
          cur = (cur._1, math.max(cur._2, iv._2), cur._3 + iv._3)
        else { merged ::= cur; cur = iv }
      }
      merged ::= cur
      // final = the watermark can no longer extend it (strict: an event
      // at exactly ts == wm == last + gap would still join)
      val (closed, open) = merged.reverse.partition(_._2 + gapMs < wm)
      if (open.isEmpty) state.remove()
      else {
        state.update(HostSessions(
          open.map { case (s, l, n) => SessionState(s, l, n) }))
        // wake when the OLDEST held interval becomes final; a timeout
        // at-or-before the current watermark is rejected by Spark —
        // clamp so it fires on the next microbatch instead of crashing
        state.setTimeoutTimestamp(
          math.max(open.map(_._2).min + gapMs, wm + 1))
      }
      closed.iterator.map { case (s, l, n) =>
        SessionOut(host, new java.sql.Timestamp(s),
          new java.sql.Timestamp(l), n)
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
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
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
    * a duplicate arriving within the watermark window is dropped.
    * NULL-text pages (extraction failures) are NOT duplicates of each
    * other — md5(NULL) is NULL and dropDuplicates groups NULL keys, so
    * they key by `idCol` instead (the \u0000 prefix cannot collide
    * with an md5 hex digest). */
  def dedupPages(pages: DataFrame, idCol: String, textCol: String,
                 watermark: String = "1 hour"): DataFrame =
    pages
      .withColumn("fp", coalesce(md5(col(textCol).cast("binary")),
        concat(lit("\u0000"), col(idCol).cast("string"))))
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
}
