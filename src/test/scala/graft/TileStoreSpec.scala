package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.cell.CellIndex
import graft.functions._
import graft.ops.Skew
import graft.sources.TileStore

class TileStoreSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  lazy val cells = {
    val rows = (0 until 5000).map { i =>
      val rnd = new scala.util.Random(i)
      val lon = rnd.nextDouble() * 359.9 - 179.95
      val lat = rnd.nextDouble() * 179.9 - 89.95
      (i.toLong, CellIndex.encode(lon, lat, 12), i % 97)
    }
    rows.toDF("id", "cell", "v")
  }

  def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/store"
  }

  test("write/read roundtrip preserves rows; prefix column added") {
    val path = tmpDir("ts-rt")
    TileStore.write(cells, path)
    val back = TileStore.read(spark, path)
    assert(back.count() == 5000)
    assert(back.columns.toSet == Set("id", "cell", "v", "cell_prefix"))
    val bad = back.filter(
      col("cell_prefix") =!= shiftrightunsigned(col("cell"), TileStore.DefaultPrefixShift))
    assert(bad.count() == 0)
  }

  test("scanCover == full-scan cover filter, and predicates reach the scan") {
    val path = tmpDir("ts-prune")
    TileStore.write(cells, path)
    val cover = CellIndex.coverRect(-10.0, 30.0, 30.0, 60.0, 6)
    val got = TileStore.scanCover(spark, path, cover, 12)
      .select("id").orderBy("id").collect().map(_.getLong(0))
    val flat = CellIndex.coverRanges(cover, 12)
    val want = cells.collect()
      .filter(r => CellIndex.inRanges(r.getLong(1), flat))
      .map(_.getLong(0)).sorted
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty && got.length < 5000)
    val plan = TileStore.scanCover(spark, path, cover, 12)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("Or(And(GreaterThanOrEqual(cell,"),
      s"cell range predicates did not reach the parquet scan:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("cell_prefix"),
      "partition pruning on cell_prefix missing")
    // degenerate geometry: an empty cover scans NOTHING (no crash)
    assert(TileStore.scanCover(spark, path, Array.empty[Long], 12).count() == 0L)
  }

  test("snapshot commit: ids advance, time travel reads, lineage lands") {
    val store = tmpDir("ts-snap")
    val v1 = cells
    val v2 = cells.withColumn("v", col("v") + 1000)
    val s1 = TileStore.commit(v1, store, "jobA")
    val s2 = TileStore.commit(v2, store, "jobA")
    assert(s1 == "s0" && s2 == "s1")
    assert(TileStore.snapshots(spark, store) == Seq("s0", "s1"))
    // time travel: each snapshot reads ITS data
    assert(TileStore.readAt(spark, store, "s0")
      .agg(sum("v")).collect()(0).getLong(0) ==
      v1.agg(sum("v")).collect()(0).getLong(0))
    assert(TileStore.readLatest(spark, store)
      .agg(sum("v")).collect()(0).getLong(0) ==
      v2.agg(sum("v")).collect()(0).getLong(0))
    // per-coarse-tile lineage rows landed with each snapshot
    val m = TileStore.lineage(spark, store)
    assert(m.filter(col("snapshot_id") === "s0").count() > 0)
    val sumOut = m.filter(col("snapshot_id") === "s1")
      .agg(sum("rows_out")).collect()(0).getLong(0)
    assert(sumOut == 5000L)
    // cover scan at a snapshot still prunes
    val cover = CellIndex.coverRect(-10.0, 30.0, 30.0, 60.0, 6)
    val n = TileStore.scanCoverAt(spark, store, "s0", cover, 12).count()
    assert(n > 0 && n < 5000)
  }

  test("expireSnapshots: keeps newest N, vacuums orphans, readers safe") {
    val store = tmpDir("ts-expire")
    TileStore.commit(cells, store, "jobA")                              // s0
    TileStore.commit(cells.withColumn("v", col("v") + 1), store, "jobA") // s1
    TileStore.commit(cells.withColumn("v", col("v") + 2), store, "jobA") // s2
    TileStore.write(cells, TileStore.dataDir(store, "s9"))              // orphan
    val expired = TileStore.expireSnapshots(spark, store, keepLast = 2)
    assert(expired == Seq("s0"))
    assert(TileStore.snapshots(spark, store) == Seq("s1", "s2"))
    intercept[IllegalArgumentException] { TileStore.readAt(spark, store, "s0") }
    assert(TileStore.readLatest(spark, store).count() == 5000)
    // both the expired snapshot's data and the orphan dir are gone
    val f = new java.io.File(s"$store/data")
    assert(f.listFiles.map(_.getName).toSet == Set("snap=s1", "snap=s2"))
    // lineage only reflects surviving snapshots
    val snaps = TileStore.lineage(spark, store)
      .select("snapshot_id").distinct().collect().map(_.getString(0)).toSet
    assert(snaps == Set("s1", "s2"))
  }

  test("commit rows_in: honest upstream counts when input given") {
    val store = tmpDir("ts-rowsin")
    // committed relation = input aggregated per cell (a real transform)
    val input = cells
    val out = cells.groupBy("cell").agg(sum("v").as("v"))
    TileStore.commit(out, store, "jobA", input = Some(input))
    val m = TileStore.lineage(spark, store)
    assert(m.agg(sum("rows_in")).collect()(0).getLong(0) == 5000L)
    assert(m.agg(sum("rows_out")).collect()(0).getLong(0) == out.count())
    // per coarse tile, rows_in matches the input's own rollup
    val wantIn = input
      .groupBy(cell_parent(col("cell"), 6).as("cell"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("want"))
    assert(m.join(wantIn, Seq("cell"))
      .filter(col("rows_in") =!= col("want")).count() == 0)
    // a stray non-marker file in _snapshots must be ignored, not parsed
    val junk = new java.io.File(s"$store/_snapshots/schema")
    java.nio.file.Files.writeString(junk.toPath, "junk")
    assert(TileStore.snapshots(spark, store) == Seq("s0"))
  }

  test("saveXyJson/loadXyJson: reference JSON shape roundtrip") {
    val dir = tmpDir("ts-xyjson")
    new java.io.File(dir).mkdirs()
    val path = s"$dir/xy.json"
    val xy = Seq(
      (3L, 10L, "CARS", 67L), (1L, 20L, "CARS", 67L),
      (5L, 30L, "FOOD", 70L)).toDF("b1", "b2", "classname", "label_id")
    graft.ops.Extract.saveXyJson(xy, Seq("b1", "b2"), path)
    val json = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    // the reference's exact object shape (extract.py:63-67): X matrix,
    // y vector, labels_map with STRING ids (NumpyEncoder parity)
    assert(json.startsWith("""{"X": [["""))
    assert(json.contains(""""labels_map": {"CARS": "67", "FOOD": "70"}"""))
    val (back, labels) = graft.ops.Extract.loadXyJson(spark, Seq("b1", "b2"), path)
    assert(labels == Map("CARS" -> "67", "FOOD" -> "70"))
    val rows = back.collect().map(r =>
      (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSet
    assert(rows == Set((3.0, 10.0, 67L), (1.0, 20.0, 67L), (5.0, 30.0, 70L)))
  }

  test("saveXyJson: float bands render as Python floats, int bands as ints") {
    // ADVICE r3 #4: NumpyEncoder maps np.floating -> float, and Python
    // json.dumps renders float 1.0 as "1.0" — so integer rendering is
    // gated on the band's SOURCE type, not on the value being integral
    val dir = tmpDir("ts-xyjson-f")
    new java.io.File(dir).mkdirs()
    val path = s"$dir/xy.json"
    val xy = Seq((1.0, 10L, "CARS", 67L), (2.5, 20L, "CARS", 67L))
      .toDF("fb", "b2", "classname", "label_id")
    graft.ops.Extract.saveXyJson(xy, Seq("fb", "b2"), path)
    val json = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    assert(json.startsWith("""{"X": [[1.0, 10], [2.5, 20]]"""), json)
  }

  test("distinctBoxes: identical intersection boxes collapse to first pair") {
    val pairs = Seq(
      ("a", "b", 0.0, 0.0, 1.0, 1.0),
      ("a", "c", 0.0, 0.0, 1.0, 1.0), // same box, later pair -> drops
      ("b", "c", 0.0, 0.0, 2.0, 1.0)  // different box -> kept
    ).toDF("src_a", "src_b", "ilon_min", "ilat_min", "ilon_max", "ilat_max")
    val got = graft.ops.Overlaps.distinctBoxes(pairs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(4))).toSet
    assert(got == Set(("a", "b", 1.0), ("b", "c", 2.0)))
  }

  test("snapshot atomicity: unmarked data is invisible; readAt rejects it") {
    val store = tmpDir("ts-crash")
    TileStore.commit(cells, store, "jobA")
    // simulate a crash AFTER the data write but BEFORE the marker:
    // write a snap directory directly, no marker
    TileStore.write(cells, TileStore.dataDir(store, "s1"))
    assert(TileStore.snapshots(spark, store) == Seq("s0"))
    assert(TileStore.readLatest(spark, store).count() == 5000) // still s0
    intercept[IllegalArgumentException] {
      TileStore.readAt(spark, store, "s1")
    }
    // the next commit takes over the orphaned id and publishes it —
    // and the retry does NOT duplicate lineage rows (the snap-dir
    // overwrite wipes the orphan's _manifest along with its data)
    val s = TileStore.commit(cells, store, "jobB")
    assert(s == "s1" && TileStore.snapshots(spark, store) == Seq("s0", "s1"))
    val m = TileStore.lineage(spark, store)
    assert(m.filter(col("snapshot_id") === "s1")
      .agg(sum("rows_out")).collect()(0).getLong(0) == 5000L)
    // lineage rows feed resume directly: everything planned is done
    val planned = m.filter(col("snapshot_id") === "s1").select("cell")
    assert(graft.lineage.Lineage.pending(planned, m, "jobB", "s1").count() == 0)
  }

  test("resumableRun records completion: second run has nothing to do") {
    val store = tmpDir("ts-resume")
    val planned = spark.range(8).select($"id".as("cell"))
    var ran = 0
    def work(todo: org.apache.spark.sql.DataFrame) = {
      ran += 1
      todo.withColumn("rows_in", lit(10L)).withColumn("rows_out", lit(9L))
    }
    val done1 = graft.lineage.Lineage
      .resumableRun(spark, store, "j", "s0", planned)(work)
    assert(done1.count() == 8)
    val done2 = graft.lineage.Lineage
      .resumableRun(spark, store, "j", "s0", planned)(work)
    assert(done2.count() == 0 && ran == 2)
    // a new snapshot re-plans everything
    assert(graft.lineage.Lineage.pending(planned,
      graft.lineage.Lineage.readManifest(spark, store), "j", "s1").count() == 8)
  }

  test("writePyramid == Resample.pyramid levels, nothing left cached") {
    val store = tmpDir("ts-pyr")
    val base = cells.groupBy("cell").agg(count(lit(1)).as("v"))
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    TileStore.writePyramid(base, 12, 9, "v", "sum", store)
    assert(spark.sparkContext.getPersistentRDDs.keySet == cachedBefore,
      "writePyramid leaked cached levels")
    // in-memory pyramid as the semantics reference: (level, cell, v)
    val mem = graft.ops.Resample.pyramid(base, 12, 9, "v", "sum")
      .collect().map(r => (r.getInt(2), r.getLong(0), r.getLong(1))).toSeq
    spark.catalog.clearCache()
    for (r <- 9 to 12) {
      val got = TileStore.read(spark, s"$store/level=$r")
        .select("cell", "v").orderBy("cell").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq
      val want = mem.filter(_._1 == r).map(t => (t._2, t._3)).sortBy(_._1)
      assert(got == want, s"level $r")
    }
  }

  test("writeBands keeps band column order; saveXy/loadXy roundtrip") {
    // S7: schema order == caller's band order (reorder_items analog)
    val path = tmpDir("ts-bands")
    val stacked = cells.withColumn("red", col("v") * 2)
      .withColumn("nir", col("v") * 3)
    TileStore.writeBands(stacked, path, Seq("nir", "v", "red"))
    val back = TileStore.read(spark, path)
    assert(back.columns.take(4).toSeq == Seq("cell", "nir", "v", "red"))
    assert(back.count() == 5000)
    // S11: xy + labels_map roundtrip
    val xyPath = tmpDir("ts-xy")
    val xy = Seq((1L, 2L, "cat", 0L), (3L, 4L, "dog", 1L), (5L, 6L, "dog", 1L))
      .toDF("b1", "b2", "classname", "label_id")
    graft.ops.Extract.saveXy(xy, xyPath)
    val (xyBack, labels) = graft.ops.Extract.loadXy(spark, xyPath)
    assert(xyBack.orderBy("b1").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L))
    assert(labels.orderBy("label_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((0L, "cat"), (1L, "dog")))
  }

  test("saltedEquiJoin == plain equi-join (hot-key safe)") {
    // skewed big side: 80% of rows share one cell
    val hot = CellIndex.encode(10.45, 51.17, 8)
    val big = (0 until 4000).map { i =>
      (i.toLong, if (i % 5 != 0) hot else CellIndex.encode(-i % 170, (i % 80).toDouble, 8))
    }.toDF("rid", "cell")
    val small = (0 until 500).map { i =>
      (CellIndex.encode(-i % 170, (i % 80).toDouble, 8), s"dim$i")
    }.toDF("cell", "tag").union(Seq((hot, "hotdim")).toDF("cell", "tag"))
    val plain = big.join(small, Seq("cell"))
      .select("rid", "tag").orderBy("rid", "tag").collect().toSeq
    val salted = Skew.saltedEquiJoin(big, small, Seq("cell"), col("rid"), 8)
      .select("rid", "tag").orderBy("rid", "tag").collect().toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
