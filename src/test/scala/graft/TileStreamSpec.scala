package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.TileStream

class TileStreamSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

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
