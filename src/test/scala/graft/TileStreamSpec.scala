package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{CrawlSessions, TileStream}

class TileStreamSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  private val T0 = 1704067200000L // 2024-01-01T00:00:00Z

  test("stateful sessionization: sessions emit once watermark-final, tails on timeout") {
    import CrawlSessions._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val events = mem.toDF().toDF("host", "ts").as[PageEvent]
    val gapMs = 10 * 60 * 1000L
    val q = CrawlSessions.sessionize(events, gapMs, watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    def t(min: Long) = new java.sql.Timestamp(T0 + min * 60000L)
    // host a: two sessions split by a 29-minute gap; host b: singleton
    mem.addData(("a", t(0)), ("a", t(1)), ("a", t(30)), ("b", t(2)))
    q.processAllAvailable()
    // a far-future event advances the watermark -> trailing sessions fire
    mem.addData(("z", t(300)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions_stream").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSet
    val want = Set(
      ("a", T0, T0 + 60000L, 2L),                       // watermark-final
      ("a", T0 + 30 * 60000L, T0 + 30 * 60000L, 1L),    // closed by timeout
      ("b", T0 + 2 * 60000L, T0 + 2 * 60000L, 1L))      // closed by timeout
    assert(got == want) // z's session is still open -> not emitted
  }

  test("sessionize: a within-watermark event BRIDGES two in-batch runs " +
      "(no premature emission of in-batch-closed sessions)") {
    import CrawlSessions._
    implicit val sqlCtx = spark.sqlContext
    def t(min: Long) = new java.sql.Timestamp(T0 + min * 60000L)
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val q = CrawlSessions.sessionize(
        mem.toDF().toDF("host", "ts").as[PageEvent],
        gapMs = 10 * 60 * 1000L, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_bridge")
      .outputMode("append").start()
    // batch 1: a 15-minute in-batch gap splits [0,0] from [15,15] —
    // but [0,0] is NOT final (watermark is only t(5) after this batch)
    mem.addData(("a", t(0)), ("a", t(15)))
    q.processAllAvailable()
    // batch 2: t(8) is within-watermark (>= t(5)) and within gap of
    // BOTH runs — the three events are ONE session [0,15]
    mem.addData(("a", t(8)))
    q.processAllAvailable()
    mem.addData(("zz", t(600))) // advance watermark, close tails
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_bridge").filter(col("host") === "a")
      .collect()
      .map(r => (r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getLong(3))).toSet
    assert(got == Set((T0, T0 + 15 * 60000L, 3L)))
  }

  test("sessionize: late within-watermark events merge or form earlier sessions") {
    import CrawlSessions._
    implicit val sqlCtx = spark.sqlContext
    def t(min: Long) = new java.sql.Timestamp(T0 + min * 60000L)
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val q = CrawlSessions.sessionize(
        mem.toDF().toDF("host", "ts").as[PageEvent],
        gapMs = 10 * 60 * 1000L, watermark = "30 minutes")
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    mem.addData(("a", t(60)))
    q.processAllAvailable() // watermark now t(30)
    // late but within watermark: t(55) is in-gap of the open session
    // (must EXTEND it backward); t(40) is > gap earlier (own session)
    mem.addData(("a", t(55)), ("a", t(40)))
    q.processAllAvailable()
    mem.addData(("zz", t(600))) // close tails
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_late").filter(col("host") === "a").collect()
      .map(r => (r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getLong(3))).toSet
    val want = Set(
      (T0 + 40 * 60000L, T0 + 40 * 60000L, 1L),
      (T0 + 55 * 60000L, T0 + 60 * 60000L, 2L)) // NOT [60,60]
    assert(got == want)
  }

  test("streaming sessionize == batch lag/cumsum twin on the same rows") {
    import CrawlSessions._
    implicit val sqlCtx = spark.sqlContext
    def t(min: Long) = new java.sql.Timestamp(T0 + min * 60000L)
    // pseudo-random event times: several hosts, mixed gaps
    val rnd = new scala.util.Random(7)
    val rows = (0 until 120).map { i =>
      (s"h${rnd.nextInt(5)}", t(rnd.nextInt(600)))
    }.distinct
    val gapMs = 25 * 60 * 1000L
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val q = CrawlSessions.sessionize(
        mem.toDF().toDF("host", "ts").as[PageEvent], gapMs, "1 minute")
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    mem.addData(("zz_closer", t(100000))) // advance watermark, close tails
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_parity")
      .filter(col("host") =!= "zz_closer").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime * 1000L,
        r.getTimestamp(2).getTime * 1000L, r.getLong(3))).toSet
    val batch = CrawlSessions.sessionizeBatch(
        rows.toDF("host", "ts").withColumn("event_id", lit(0L)),
        "host", "ts", "event_id", gapMs * 1000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming dedup: duplicate content within watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val pages = mem.toDF().toDF("doc_id", "text", "warc_ts")
    val q = CrawlSessions.dedupPages(pages, "doc_id", "text")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    def t(min: Long) = new java.sql.Timestamp(T0 + min * 60000L)
    mem.addData((1L, "alpha", t(0)), (2L, "beta", t(1)))
    q.processAllAvailable()
    // 3 is a dup of 1; 5 and 6 have NULL text (extraction failures) —
    // NOT duplicates of each other, both must pass through
    mem.addData((3L, "alpha", t(2)), (4L, "gamma", t(3)),
      (5L, null, t(4)), (6L, null, t(5)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_stream").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L, 5L, 6L))
  }

  test("streaming near-dup == batch simhash pairs within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),  // near 1
      (4L, "one two three four five six seven eight nine"))
    def t(min: Long) = new java.sql.Timestamp(T0 + min * 60000L)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val pages = mem.toDF().toDF("doc_id", "text", "warc_ts")
    val q = graft.streaming.NearDupStream
      .nearDupPairs(pages, "doc_id", "text", "warc_ts")
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    // two batches: pairs must surface across batch boundaries too
    mem.addData((1L, docs(0)._2, t(0)), (4L, docs(3)._2, t(1)))
    q.processAllAvailable()
    mem.addData((2L, docs(1)._2, t(2)), (3L, docs(2)._2, t(3)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_stream")
      .select("id_a", "id_b", "hamming").distinct().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2).toLong)).toMap
    // batch twin on the same rows
    val want = graft.text.Dedup.simhashPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("id_a", "id_b", "hamming").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == want && want.nonEmpty)
  }

  test("streaming near-dup: out-of-horizon state evicts (no stale pairs)") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Long) = new java.sql.Timestamp(T0 + min * 60000L)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val pages = mem.toDF().toDF("doc_id", "text", "warc_ts")
    val q = graft.streaming.NearDupStream
      .nearDupPairs(pages, "doc_id", "text", "warc_ts",
        horizon = java.time.Duration.ofMinutes(10))
      .writeStream.format("memory").queryName("neardup_evict")
      .outputMode("append").start()
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    mem.addData((1L, text, t(0)))
    q.processAllAvailable()
    // advance the watermark far past doc 1 (wm follows max event time
    // minus 10 min), then send its duplicate: state must be gone
    mem.addData((9L, "one two three four five six seven", t(60)))
    q.processAllAvailable()
    mem.addData((2L, text, t(61)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_evict").select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.contains((1L, 2L)), s"stale pair emitted: $got")
  }

  test("streaming minhash candidates == batch LSH candidates within horizon") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),  // near 1
      (4L, "one two three four five six seven eight nine"),
      (5L, "ab cd")) // too short for a 3-shingle: no signature
    def t(min: Long) = new java.sql.Timestamp(T0 + min * 60000L)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val pages = mem.toDF().toDF("doc_id", "text", "warc_ts")
    val q = graft.streaming.NearDupStream
      .minhashCandidates(pages, "doc_id", "text", "warc_ts")
      .writeStream.format("memory").queryName("mh_cand_stream")
      .outputMode("append").start()
    // two batches: candidates must surface across batch boundaries too
    mem.addData((1L, docs(0)._2, t(0)), (4L, docs(3)._2, t(1)),
      (5L, docs(4)._2, t(1)))
    q.processAllAvailable()
    mem.addData((2L, docs(1)._2, t(2)), (3L, docs(2)._2, t(3)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mh_cand_stream")
      .select("id_a", "id_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch twin on the same rows: the candidate relation of minhashLsh
    val want = graft.text.Dedup.candidates(graft.text.Dedup.bands(
        graft.text.Dedup.minhash(graft.text.Dedup.docShinglesAll(
          docs.toDF("doc_id", "text"), "doc_id", "text"))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("streaming embed candidates == batch banded blocking on same rows") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Long) = new java.sql.Timestamp(T0 + min * 60000L)
    val vecs = (0L until 20L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1), t(i))
    }
    val mem = MemoryStream[(Long, Array[Float], java.sql.Timestamp)]
    val stream = mem.toDF().toDF("vec_id", "emb", "ts")
    val q = graft.streaming.NearDupStream
      .embedNearDupCandidates(stream, "vec_id", "emb", "ts", dim = 16,
        numPlanes = 8, rowsPerBand = 4)
      .writeStream.format("memory").queryName("embed_cand_stream")
      .outputMode("append").start()
    // two batches: candidates must surface across batch boundaries
    mem.addData(vecs.take(10): _*)
    q.processAllAvailable()
    mem.addData(vecs.drop(10): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("embed_cand_stream")
      .select("id_a", "id_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val corpus = vecs.map(v => (v._1, v._2)).toDF("id", "emb")
      .select(col("id"), graft.vector.Ann.quantize(col("emb")).as("v"))
    val want = graft.vector.Ann.bandedCandidates(corpus, 16, 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("streaming minhash VERIFIED pairs == batch minhashLsh values") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),  // near 1
      (4L, "one two three four five six seven eight nine"),
      (5L, "alpha beta gamma delta nine ten eleven twelve")) // partial
    def t(min: Long) = new java.sql.Timestamp(T0 + min * 60000L)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val pages = mem.toDF().toDF("doc_id", "text", "warc_ts")
    val q = graft.streaming.NearDupStream
      .minhashVerifiedPairs(pages, "doc_id", "text", "warc_ts",
        threshold = 0.2)
      .writeStream.format("memory").queryName("mh_verified_stream")
      .outputMode("append").start()
    mem.addData((1L, docs(0)._2, t(0)), (4L, docs(3)._2, t(1)))
    q.processAllAvailable()
    mem.addData((2L, docs(1)._2, t(2)), (3L, docs(2)._2, t(3)),
      (5L, docs(4)._2, t(4)))
    q.processAllAvailable()
    q.stop()
    // multi-band duplicates collapse; VALUES (common/n/jaccard) must be
    // the batch numbers exactly — the verify payload rides the state
    val got = spark.table("mh_verified_stream")
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    val want = graft.text.Dedup.minhashLsh(
        docs.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.2)
      .select("id_a", "id_b", "common", "n_a", "n_b", "jaccard")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    spark.catalog.clearCache()
    assert(got == want && want.nonEmpty)
  }

  test("streaming embed VERIFIED pairs == batch cosineNearDupBanded") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Long) = new java.sql.Timestamp(T0 + min * 60000L)
    val vecs = (0L until 24L).map { i =>
      val rnd = new scala.util.Random(i % 6) // 6 base directions -> dups
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1 + (i / 6).toFloat * 1e-4f),
        t(i))
    }
    val mem = MemoryStream[(Long, Array[Float], java.sql.Timestamp)]
    val stream = mem.toDF().toDF("vec_id", "emb", "ts")
    val q = graft.streaming.NearDupStream
      .embedNearDupVerified(stream, "vec_id", "emb", "ts", dim = 16,
        threshold = 0.8, numPlanes = 8, rowsPerBand = 4)
      .writeStream.format("memory").queryName("embed_verified_stream")
      .outputMode("append").start()
    mem.addData(vecs.take(12): _*)
    q.processAllAvailable()
    mem.addData(vecs.drop(12): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("embed_verified_stream")
      .select("id_a", "id_b", "cos").distinct().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val corpus = vecs.map(v => (v._1, v._2)).toDF("id", "emb")
      .select(col("id"), graft.vector.Ann.quantize(col("emb")).as("v"))
    val want = graft.vector.Ann
      .cosineNearDupBanded(corpus, 16, 0.8, 8, 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    // bit-identical cosine: exact Long dot products, same closed form
    assert(got == want && want.nonEmpty)
  }

  test("streaming salvage tier == batch sub-bucket salvage on a hot bucket") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Long) = new java.sql.Timestamp(T0 + min * 60000L)
    // 8 identical docs: every minhash band bucket holds all 8 ids
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val ids = (1L to 8L)
    val cap = 2; val nsub = 4 // batch: ceil(8/2) = 4 sub-buckets
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val pages = mem.toDF().toDF("doc_id", "text", "warc_ts")
    val q = graft.streaming.NearDupStream
      .minhashCandidates(pages, "doc_id", "text", "warc_ts",
        subBuckets = nsub)
      .writeStream.format("memory").queryName("mh_salvage_stream")
      .outputMode("append").start()
    mem.addData(ids.map(i => (i, text, t(i))): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mh_salvage_stream")
      .select("id_a", "id_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch three-tier salvage with the same effective sub-bucket count
    val docs = ids.map(i => (i, text)).toDF("doc_id", "text")
    val want = graft.text.Dedup.candidates(graft.text.Dedup.bands(
        graft.text.Dedup.minhash(graft.text.Dedup.docShinglesAll(
          docs, "doc_id", "text"))),
        maxBucket = Some(cap), salvageFactor = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.nonEmpty,
      s"stream=$got batch=$want")
    // the sub-bucket split really pruned: strictly fewer than all pairs
    assert(got.size < ids.size * (ids.size - 1) / 2)
  }

  test("streaming bucket cap: overflow drops are counted, not silent") {
    implicit val sqlCtx = spark.sqlContext
    def t(min: Long) = new java.sql.Timestamp(T0 + min * 60000L)
    val acc = spark.sparkContext.longAccumulator("neardup_overflow_drops")
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val pages = mem.toDF().toDF("doc_id", "text", "warc_ts")
    val q = graft.streaming.NearDupStream
      .nearDupPairs(pages, "doc_id", "text", "warc_ts",
        maxBucket = 1, overflowDrops = Some(acc))
      .writeStream.format("memory").queryName("neardup_capped")
      .outputMode("append").start()
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    // three identical docs into buckets capped at 1: every arrival past
    // the first drops the oldest entry, and the accumulator sees it
    // (ADVICE r3 #3 — the streaming analog of batch bucketStats)
    mem.addData((1L, text, t(0)), (2L, text, t(1)), (3L, text, t(2)))
    q.processAllAvailable()
    q.stop()
    assert(acc.value > 0, "overflow drops not accounted")
  }

  test("streaming tile density == batch tile density on the same rows") {
    val rows = (0 until 300).map { i =>
      val tld = Seq("de", "jp", "io")(i % 3)
      (s"https://h$i.example.$tld/p",
        new java.sql.Timestamp(1704067200000L + (i % 5) * 3600_000L))
    }

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val streamDf = mem.toDF().toDF("url", "warc_ts")
    val q = TileStream.tileDensity(streamDf, 12, 6)
      .writeStream.format("memory").queryName("tiles_stream")
      .outputMode("update").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("tiles_stream")
      .groupBy("win_start", "tile").agg(max("n_pages").as("n_pages")) // last update wins
      .orderBy("win_start", "tile").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))

    val want = TileStream.tileDensity(rows.toDF("url", "warc_ts"), 12, 6)
      .orderBy("win_start", "tile").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))

    assert(got.toSeq == want.toSeq)
    assert(want.nonEmpty)
  }
}
