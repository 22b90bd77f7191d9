package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Geo
import graft.geo.Geo.{GPoint, GPolygon}

/** CRS reprojection ground truth (the §2.7 row previously asserted as
  * a validating no-op, now computed): forward Web Mercator pinned
  * against published EPSG:3857 coordinates, inverse pinned by
  * round-trip, NAD83→WGS84 identity + projected-input rejection, and
  * the unsupported-pair refusal. The catalog's q_geo_reproject
  * hash-gates the x-axis arithmetic and the full round trip; this
  * spec pins the y-axis absolutes the oracle deliberately avoids
  * (last-ulp ln/tan variance across libm implementations).
  */
class GeoReprojectSpec extends AnyFunSuite {

  private def fwd(lon: Double, lat: Double): (Double, Double) =
    Geo.reprojectPt(4326, 3857)((lon, lat))
  private def inv(x: Double, y: Double): (Double, Double) =
    Geo.reprojectPt(3857, 4326)((x, y))

  test("forward matches published EPSG:3857 coordinates (NYC City Hall, origin, antimeridian)") {
    // epsg.io / proj4 published values, ±1 cm
    val (x, y) = fwd(-74.006, 40.7128)
    assert(math.abs(x - -8238310.24) < 0.01, s"x=$x")
    assert(math.abs(y - 4970071.58) < 0.01, s"y=$y")
    val (ox, oy) = fwd(0, 0)
    assert(ox == 0.0 && math.abs(oy) < 1e-8, s"origin -> ($ox, $oy)")
    val (ax, _) = fwd(180, 0)
    assert(math.abs(ax - 20037508.342789244) < 1e-6)
    // equator y is exactly 0 at lat 0 up to tan/log noise (< 1e-8 m)
    assert(math.abs(fwd(123.4, 0)._2) < 1e-8)
  }

  test("round trip is identity to sub-nanodegree precision") {
    val pts = Seq((-74.006, 40.7128), (0.0, 0.0), (151.2093, -33.8688),
      (-0.1278, 51.5074), (139.6917, 35.6895), (-180.0, 84.9), (179.99, -84.9))
    pts.foreach { case (lon, lat) =>
      val (x, y) = fwd(lon, lat)
      val (lon2, lat2) = inv(x, y)
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon -> $lon2")
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lat -> $lat2")
    }
  }

  test("geometry-wide reprojection preserves structure and rounds cleanly") {
    val sq = GPolygon(IndexedSeq(IndexedSeq(
      (2.0, 3.0), (3.0, 3.0), (3.0, 4.0), (2.0, 4.0), (2.0, 3.0))))
    val rt = Geo.roundCoords(
      Geo.reprojectGeom(Geo.reprojectGeom(sq, 4326, 3857), 3857, 4326), 9)
    assert(rt == sq, s"integral square must round-trip exactly, got $rt")
    assert(Geo.toWkt(rt) == "POLYGON ((2 3, 3 3, 3 4, 2 4, 2 3))")
  }

  test("NAD83 (4269) to WGS84 is a validating identity; projected input rejected") {
    val p = GPoint(-73.9857, 40.7484)
    assert(Geo.reprojectGeom(p, 4269, 4326) == p)
    // state-plane-looking coordinates declared geographic must fail loudly
    val statePlane = GPoint(988213.0, 211950.0)
    val e = intercept[IllegalArgumentException] {
      Geo.reprojectGeom(statePlane, 4269, 4326)
    }
    assert(e.getMessage.contains("projected CRS"))
  }

  test("latitude outside the Mercator domain and unsupported pairs fail loudly") {
    intercept[IllegalArgumentException] { fwd(0, 89.9) }
    intercept[IllegalArgumentException] {
      Geo.reprojectPt(2263, 4326)((988213.0, 211950.0))
    }
  }
}
