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

  test("decodeReal decodes a synthetic PNG (JDK ImageIO, no external deps)") {
    // deterministic 4x2 RGB image: channel values chosen so the means
    // are exact in float
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, new java.awt.Color(x * 60, y * 100, 128).getRGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val bytes = bos.toByteArray
    val f = Multimodal.decodeReal(bytes)
    assert(f != null)
    assert(f(0) == 4.0f && f(1) == 2.0f && f(2) == 3.0f) // w, h, bands
    assert(f(3) == (0 + 60 + 120 + 180) * 2 / 8.0f) // mean R
    assert(f(4) == (0 * 4 + 100 * 4) / 8.0f)        // mean G
    assert(f(5) == 128.0f)                          // mean B
    // second decode identical (determinism)
    assert(Multimodal.decodeReal(bytes).sameElements(f))
    // non-image bytes -> null -> extractFeatures falls back to the fake
    assert(Multimodal.decodeReal(Array[Byte](1, 2, 3)) == null)
    assert(Multimodal.decodeOrFake(Array[Byte](1, 2, 3))
      .sameElements(Multimodal.fakeFeatures(Array[Byte](1, 2, 3))))
    // and through the distributed batch path
    val feats = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRow(9L, bytes)).toDS()).collect()
    assert(feats.head.features.sameElements(f))
  }

  test("decodeAudioReal decodes a synthetic WAV (JDK sound stack)") {
    // deterministic mono 16-bit PCM: a 32-frame sawtooth with known
    // mean |amplitude|
    val frames = 32
    val pcm = new Array[Byte](frames * 2)
    var sum = 0L
    for (i <- 0 until frames) {
      val s = (i * 1000 - 16000).toShort // -16000 .. 15000
      sum += math.abs(s.toLong)
      pcm(i * 2) = (s & 0xff).toByte           // little-endian
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    assert(Multimodal.looksLikeAudio(wav) && !Multimodal.looksLikeImage(wav))
    val f = Multimodal.decodeAudioReal(wav)
    assert(f != null)
    assert(f(0) == 8000f && f(1) == 1f && f(2) == frames.toFloat)
    assert(f(3) == (sum.toDouble / frames).toFloat) // exact mean |amp|
    // determinism + the decodeOrFake routing (image miss -> audio hit)
    assert(Multimodal.decodeAudioReal(wav).sameElements(f))
    assert(Multimodal.decodeOrFake(wav).sameElements(f))
    // a truncated body with a valid magic falls back, not crashes
    val corrupt = wav.take(16)
    assert(Multimodal.decodeAudioReal(corrupt) == null)
    assert(Multimodal.decodeOrFake(corrupt)
      .sameElements(Multimodal.fakeFeatures(corrupt)))
    // non-audio magic stays out of the sound stack entirely
    assert(Multimodal.decodeAudioReal(Array[Byte](1, 2, 3)) == null)
  }

  test("end-to-end resumable tile job: crash + resume == one-shot") {
    import graft.functions._
    import graft.sources.Pages
    val base = java.nio.file.Files.createTempDirectory("graft_resume").toString
    val pages = Pages.geoCells(spark, "/root/testdata/sf0.001", 12)
      .withColumn("tile", cell_parent(col("cell"), 6))
    val planned = pages.select(col("tile").as("cell")).distinct()
    def work(todo: org.apache.spark.sql.DataFrame) =
      pages.join(broadcast(todo.select(col("cell").as("tile"))), Seq("tile"))
        .groupBy("tile").agg(count(lit(1)).as("n"))

    // run 1 "crashes" after completing only even-x tiles
    val todo1 = Lineage.pending(planned, Lineage.readManifest(spark, base), "j", "s")
      .filter(cell_x(col("cell")) % 2 === 0)
    val out1 = work(todo1).collect()
    Lineage.recordCompleted(spark, base, "j", "s",
      todo1.withColumn("rows_in", lit(0L)).withColumn("rows_out", lit(0L)))

    // run 2 resumes: only the unfinished tiles are pending
    val todo2 = Lineage.pending(planned, Lineage.readManifest(spark, base), "j", "s")
    assert(todo2.count() == planned.count() - todo1.count())
    assert(todo2.join(todo1, Seq("cell")).count() == 0)
    val out2 = work(todo2).collect()

    // union of the two runs == the one-shot job
    val resumed = (out1 ++ out2).map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val oneShot = work(planned).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(resumed == oneShot && oneShot.nonEmpty)
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
