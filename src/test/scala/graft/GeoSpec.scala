package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.geo.{GeoTag, Polygon}

class GeoSpec extends AnyFunSuite with PropHelper {

  test("geotag is deterministic and in range") {
    forAllP(Gen.chooseNum(0L, 1000000L), Gen.const(0)) { (id, _) =>
      val url = s"https://h$id.example.de/p"
      val (lon, lat) = GeoTag.lonLat(url)
      val (lon2, lat2) = GeoTag.lonLat(url)
      lon == lon2 && lat == lat2 &&
        lon >= -180.0 && lon <= 180.0 && lat >= -90.0 && lat <= 90.0
    }
  }

  test("known ccTLD lands within ±2° of its centroid") {
    for ((tld, (clon, clat)) <- GeoTag.centroids) {
      for (i <- 0 until 50) {
        val (lon, lat) = GeoTag.lonLat(s"https://h$i.example.$tld/p")
        assert(math.abs(lon - clon) <= 2.0 + 1e-9, s"$tld lon")
        assert(math.abs(lat - clat) <= 2.0 + 1e-9, s"$tld lat")
      }
    }
  }

  test("unknown TLD scatters globally (not all near one point)") {
    val pts = (0 until 200).map(i => GeoTag.lonLat(s"https://h$i.example.io/p"))
    assert(pts.map(_._1).max - pts.map(_._1).min > 180.0)
    assert(pts.map(_._2).max - pts.map(_._2).min > 70.0)
  }

  test("hostOf / tldOf parsing") {
    assert(GeoTag.hostOf("https://a.b.de/x/y") == "a.b.de")
    assert(GeoTag.hostOf("http://a.b.de") == "a.b.de")
    assert(GeoTag.hostOf("not-a-url") == "")
    assert(GeoTag.tldOf("a.b.de") == "de")
    assert(GeoTag.tldOf("localhost") == "")
  }

  test("byte-level lonLatBytes == string lonLat (incl. adversarial urls)") {
    val urls = Seq(
      "https://h1.example.de/p", "http://a.b.jp/q/r", "https://x.io",
      "https://", "http://", "not-a-url", "", "https:////x",
      "httpx://a.de/p", "https://nodots/p", "https://a.b.de",
      "https://a.verylongtldxyz/p", "https://h9.example.zz/p",
      "https://a.b.c.d.us/deep/path?q=1") ++
      (0 until 500).map(i => s"https://h$i.example.${
        Seq("de", "ru", "jp", "io", "zz")(i % 5)}/p")
    urls.foreach { u =>
      val b = u.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(GeoTag.lonLatBytes(b, 0, b.length) == GeoTag.lonLat(u), s"url=$u")
    }
  }

  test("md5Hex matches JDK reference") {
    assert(GeoTag.md5Hex("abc") == "900150983cd24fb0d6963f7d28e17f72")
    assert(GeoTag.md5Hex("") == "d41d8cd98f00b204e9800998ecf8427e")
  }

  val coordGen: Gen[(Double, Double)] = for {
    lon <- Gen.chooseNum(-20.0, 40.0)
    lat <- Gen.chooseNum(30.0, 70.0)
  } yield (lon, lat)

  test("strip-indexed PIP agrees with brute-force ray casting") {
    for (poly <- Polygon.registry.values) {
      forAllP(Gen.chooseNum(-180.0, 180.0), Gen.chooseNum(-90.0, 90.0)) { (lon, lat) =>
        poly.contains(lon, lat) == poly.containsBrute(lon, lat)
      }
    }
  }

  test("PIP agrees with brute force on random concave polygons") {
    val vertGen = Gen.chooseNum(5, 12)
    forAllP(vertGen, Gen.chooseNum(0L, 10000L)) { (nv, seed) =>
      val rnd = new scala.util.Random(seed)
      // random star-shaped (possibly concave) polygon around a center
      val cx = rnd.nextDouble() * 300 - 150
      val cy = rnd.nextDouble() * 140 - 70
      val pts = (0 until nv).map { i =>
        val ang = 2 * math.Pi * i / nv
        val rad = 1.0 + rnd.nextDouble() * 9.0
        (cx + rad * math.cos(ang), cy + rad * math.sin(ang))
      }
      val poly = Polygon(pts)
      (0 until 50).forall { _ =>
        val px = cx + (rnd.nextDouble() - 0.5) * 25
        val py = cy + (rnd.nextDouble() - 0.5) * 25
        poly.contains(px, py) == poly.containsBrute(px, py)
      }
    }
  }

  test("box polygon contains interior, excludes exterior") {
    val b = Polygon.box(0.0, 0.0, 10.0, 5.0)
    assert(b.contains(5.0, 2.5))
    assert(!b.contains(-1.0, 2.5))
    assert(!b.contains(5.0, 6.0))
    assert(b.lonMin == 0.0 && b.latMax == 5.0)
  }

  test("convex pentagon PIP matches half-plane test (oracle parity)") {
    // the DuckDB oracle uses half-plane tests for this polygon; ensure
    // the ray-casting kernel agrees (boundary measure-zero aside)
    val p = Polygon.registry("europe_pentagon")
    def halfPlane(px: Double, py: Double): Boolean = {
      val n = p.n
      (0 until n).forall { i =>
        val j = (i + 1) % n
        val cross = (p.xs(j) - p.xs(i)) * (py - p.ys(i)) -
          (p.ys(j) - p.ys(i)) * (px - p.xs(i))
        cross > 0 // CCW ring, strict interior
      }
    }
    forAllP(Gen.chooseNum(-5.0, 25.0), Gen.chooseNum(40.0, 60.0)) { (lon, lat) =>
      p.contains(lon, lat) == halfPlane(lon, lat)
    }
  }
}
