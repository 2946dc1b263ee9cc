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
