package graft

import org.apache.spark.sql.functions._

import graft.geo.Geo
import graft.geo.Geo._

/** Golden tests for the geometry codecs on realistic shapes: NYC-style
  * MultiPolygons with multiple parts, interior rings (holes), and
  * fractional lon/lat coordinates — the cases the synthetic
  * integer-square oracle queries can't cover.
  */
class GeoSpec extends SparkSpecBase {
  import spark.implicits._

  // An NTA-shaped fixture: two islands, the first with a hole (think
  // Rikers cut out), coordinates in real NYC lon/lat ranges.
  private val nycMultiPolygonGeoJson =
    """{"type":"MultiPolygon","coordinates":[[[[-73.95,40.75],[-73.92,40.75],[-73.92,40.78],[-73.95,40.78],[-73.95,40.75]],[[-73.94,40.76],[-73.93,40.76],[-73.93,40.77],[-73.94,40.77],[-73.94,40.76]]],[[[-74.02,40.6],[-74,40.6],[-74,40.62],[-74.02,40.62],[-74.02,40.6]]]]}"""

  private val nycMultiPolygonWkt =
    "MULTIPOLYGON (((-73.95 40.75, -73.92 40.75, -73.92 40.78, -73.95 40.78, -73.95 40.75), " +
      "(-73.94 40.76, -73.93 40.76, -73.93 40.77, -73.94 40.77, -73.94 40.76)), " +
      "((-74.02 40.6, -74 40.6, -74 40.62, -74.02 40.62, -74.02 40.6)))"

  test("GeoJSON -> WKT matches shapely-style WKT for a multi-part shape with holes") {
    assert(Geo.parseGeoJson(nycMultiPolygonGeoJson).map(Geo.toWkt)
      .contains(nycMultiPolygonWkt))
  }

  test("WKT -> GeoJSON -> WKT and GeoJSON -> WKT -> GeoJSON are identities") {
    val viaJson = Geo.parseWkt(nycMultiPolygonWkt).map(Geo.toGeoJson).get
    assert(Geo.parseGeoJson(viaJson).map(Geo.toWkt).contains(nycMultiPolygonWkt))
    assert(viaJson == nycMultiPolygonGeoJson)
  }

  test("Point and Polygon codecs round-trip") {
    val pt = "POINT (-73.98 40.7485)"
    assert(Geo.parseWkt(pt).map(Geo.toWkt).contains(pt))
    assert(Geo.parseWkt(pt).map(Geo.toGeoJson)
      .contains("""{"type":"Point","coordinates":[-73.98,40.7485]}"""))
    val poly = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    assert(Geo.parseWkt(poly).map(Geo.toWkt).contains(poly))
  }

  test("Polygon -> MultiPolygon promotion wraps; MultiPolygon passes through") {
    val poly = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.2))"
    val promoted = Geo.parseWkt(poly).map(g => Geo.toWkt(Geo.promote(g))).get
    assert(promoted ==
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.2)))")
    assert(Geo.parseWkt(promoted).map(g => Geo.toWkt(Geo.promote(g))).contains(promoted))
  }

  test("envelope spans every part of a MultiPolygon") {
    val g = Geo.parseWkt(nycMultiPolygonWkt).get
    assert(Geo.envelope(g) == (-74.02, 40.6, -73.92, 40.78))
  }

  test("malformed inputs surface SQL NULL, not exceptions") {
    val df = Seq("POLYGON ((0 0, 1 1", "GARBAGE", """{"type":"Nope"}""", "")
      .toDF("s")
      .select(
        Geo.stAsGeoJson(col("s")).as("gj"),
        Geo.geojsonToWkt(col("s")).as("wkt"),
        Geo.envelopeOf(col("s")).as("env"))
    val rows = df.collect()
    assert(rows.forall(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2)))
  }

  test("WKT parser handles scientific notation and negative exponents") {
    val wkt = "POINT (1e2 -2.5E-3)"
    val g = Geo.parseWkt(wkt)
    assert(g.contains(Geo.GPoint(100.0, -0.0025)))
    // re-emission uses plain formatting
    assert(g.map(Geo.toWkt).contains("POINT (100 -0.0025)"))
  }

  test("whitespace-tolerant parsing, canonical re-emission") {
    val sloppy = "MULTIPOLYGON ( ( (0 0 ,1 0, 1 1 , 0 0) ) )"
    assert(Geo.parseWkt(sloppy).map(Geo.toWkt)
      .contains("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))"))
  }

  test("trailing garbage after a valid geometry is rejected") {
    assert(Geo.parseWkt("POINT (1 2) EXTRA").isEmpty)
    assert(Geo.parseWkt("POLYGON ((0 0, 1 0, 1 1, 0 0)))").isEmpty)
  }

  test("fmt: integral coordinates print without decimal point (oracle contract)") {
    assert(Geo.fmt(7.0) == "7")
    assert(Geo.fmt(-73.95) == "-73.95")
    assert(Geo.fmt(0.0) == "0")
  }

  test("CRS guard: geographic input passes through; NULL/garbage untouched") {
    val df = Seq(nycMultiPolygonWkt, null, "GARBAGE").toDF("g")
      .select(Geo.requireGeographicCrs(col("g")).as("g"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some(nycMultiPolygonWkt), None, Some("GARBAGE")))
  }

  test("CRS guard: projected coordinates (EPSG:2263-range feet) fail loudly") {
    // NYC City Hall in state-plane feet — valid geometry, wrong CRS
    val projected = "POLYGON ((981000 199000, 982000 199000, 982000 200000, 981000 199000))"
    val e = intercept[Exception] {
      Seq(projected).toDF("g")
        .select(Geo.requireGeographicCrs(col("g")).as("g")).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("projected CRS"), s"unexpected failure: $msgs")
  }
}
