package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.media.Multimodal
import graft.lineage.Lineage

class MediaLineageSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  test("multimodal mapPartitions plumbing: batch decode with fake codec") {
    val rows = Seq(
      Multimodal.MediaRow(1L, "hello".getBytes("UTF-8")),
      Multimodal.MediaRow(2L, Array[Byte]()),
      Multimodal.MediaRow(3L, Array.tabulate(1000)(_.toByte))).toDS()
    val feats = Multimodal.extractFeatures(rows).collect().sortBy(_.doc_id)
    assert(feats(0).byte_len == 5)
    assert(feats(0).digest == graft.geo.GeoTag.md5Hex("hello"))
    assert(feats(0).features(0) == 5.0f) // len feature
    assert(feats(1).byte_len == 0 && feats(1).features.sameElements(
      Array(0f, 0f, 0f, 0f)))
    // deterministic: second run identical
    val again = Multimodal.extractFeatures(rows).collect().sortBy(_.doc_id)
    assert(feats.zip(again).forall { case (a, b) =>
      a == b || (a.doc_id == b.doc_id && a.digest == b.digest &&
        a.features.sameElements(b.features)) })
  }

  test("real decoder is an explicit stub") {
    intercept[NotImplementedError] {
      Multimodal.decodeReal(Array[Byte](1, 2, 3))
    }
  }

  test("lineage: manifest roundtrip + resume skips completed cells") {
    val base = java.nio.file.Files.createTempDirectory("graft_lineage").toString
    val planned = spark.range(10).select($"id".as("cell"))
    // nothing completed yet: everything pending
    val m0 = Lineage.readManifest(spark, base)
    assert(Lineage.pending(planned, m0, "j", "s").count() == 10)
    // complete cells 0..3
    val done = spark.range(4).select($"id".as("cell"))
      .withColumn("rows_in", lit(100L)).withColumn("rows_out", lit(90L))
    Lineage.recordCompleted(spark, base, "j", "s", done)
    val m1 = Lineage.readManifest(spark, base)
    val pend = Lineage.pending(planned, m1, "j", "s")
      .orderBy("cell").collect().map(_.getLong(0))
    assert(pend.toSeq == (4L to 9L).toSeq)
    // different snapshot: nothing is considered complete
    assert(Lineage.pending(planned, m1, "j", "s2").count() == 10)
    // idempotent re-record: pending unchanged
    Lineage.recordCompleted(spark, base, "j", "s", done)
    assert(Lineage.pending(planned, Lineage.readManifest(spark, base), "j", "s")
      .count() == 6)
  }
}
