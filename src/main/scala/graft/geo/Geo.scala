package graft.geo

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Geometry support without a geo library (offline constraint, SURVEY
  * §7.4): geometry travels as WKT in a plain StringType column; these
  * pure-Scala codecs cover exactly the shapes the reference handles —
  * Point, Polygon, MultiPolygon in EPSG:4326.
  *
  * Reference semantics reproduced:
  *   - GeoJSON→WKT ingestion codec (datasets/ntas_2020/transformer.py:94-121,
  *     shapely `shape(geojson).wkt`);
  *   - WKT→GeoJSON output codec, the ST_AsGeoJSON(geom) parity surface
  *     (src/api/routes.py:29,70,116);
  *   - Polygon→MultiPolygon promotion
  *     (datasets/census_zctas_2020/transformer.py:10-16);
  *   - envelope/fitBounds (viz/src/App.jsx:489-507).
  *
  * Scale design: every op here is a per-row scalar UDF over one
  * geometry string — no shuffle, embarrassingly parallel. (A custom
  * codegen Expression would shave the UDF call overhead; geometry
  * parsing dominates either way.)
  *
  * Number formatting: integral coordinates print without a decimal
  * point ("7", not "7.0"), other values via Double.toString. Both
  * codecs share `fmt`, so round-trips are byte-stable and oracle SQL
  * can reproduce outputs with plain string building.
  */
object Geo {

  type Pt = (Double, Double)
  type Ring = IndexedSeq[Pt]

  sealed trait Geom
  final case class GPoint(x: Double, y: Double) extends Geom
  final case class GPolygon(rings: IndexedSeq[Ring]) extends Geom
  final case class GMultiPolygon(polys: IndexedSeq[IndexedSeq[Ring]]) extends Geom

  def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  // -------------------------------------------------------------------
  // WKT
  // -------------------------------------------------------------------

  def toWkt(g: Geom): String = g match {
    case GPoint(x, y) => s"POINT (${fmt(x)} ${fmt(y)})"
    case GPolygon(rings) => s"POLYGON ${ringsWkt(rings)}"
    case GMultiPolygon(polys) =>
      polys.map(ringsWkt).mkString("MULTIPOLYGON (", ", ", ")")
  }

  private def ringsWkt(rings: IndexedSeq[Ring]): String =
    rings.map(r => r.map { case (x, y) => s"${fmt(x)} ${fmt(y)}" }
      .mkString("(", ", ", ")")).mkString("(", ", ", ")")

  /** Minimal recursive-descent WKT reader for the supported shapes.
    * Returns None on malformed input (callers surface SQL NULL).
    */
  def parseWkt(s: String): Option[Geom] = {
    if (s == null) return None
    val p = new WktParser(s)
    try {
      val g = p.keyword() match {
        case "POINT" =>
          p.expect('('); val x = p.number(); val y = p.number(); p.expect(')')
          GPoint(x, y)
        case "POLYGON" => GPolygon(p.rings())
        case "MULTIPOLYGON" =>
          p.expect('(')
          val polys = IndexedSeq.newBuilder[IndexedSeq[Ring]]
          polys += p.rings()
          while (p.tryComma()) polys += p.rings()
          p.expect(')')
          GMultiPolygon(polys.result())
        case _ => return None
      }
      p.ws()
      if (p.done) Some(g) else None
    } catch { case _: Exception => None }
  }

  private final class WktParser(s: String) {
    private var i = 0
    def done: Boolean = i >= s.length
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c) throw new IllegalArgumentException(s"expected $c at $i")
      i += 1
    }
    def tryComma(): Boolean = {
      ws()
      if (i < s.length && s.charAt(i) == ',') { i += 1; true } else false
    }
    def keyword(): String = {
      ws(); val st = i
      while (i < s.length && s.charAt(i).isLetter) i += 1
      s.substring(st, i).toUpperCase
    }
    def number(): Double = {
      ws(); val st = i
      while (i < s.length && "+-.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
      s.substring(st, i).toDouble
    }
    def ring(): Ring = {
      expect('(')
      val pts = IndexedSeq.newBuilder[Pt]
      pts += ((number(), number()))
      while (tryComma()) pts += ((number(), number()))
      expect(')')
      pts.result()
    }
    def rings(): IndexedSeq[Ring] = {
      expect('(')
      val rs = IndexedSeq.newBuilder[Ring]
      rs += ring()
      while (tryComma()) rs += ring()
      expect(')')
      rs.result()
    }
  }

  // -------------------------------------------------------------------
  // GeoJSON (compact: no spaces, fixed key order — byte-stable output)
  // -------------------------------------------------------------------

  def toGeoJson(g: Geom): String = g match {
    case GPoint(x, y) =>
      s"""{"type":"Point","coordinates":[${fmt(x)},${fmt(y)}]}"""
    case GPolygon(rings) =>
      s"""{"type":"Polygon","coordinates":${ringsJson(rings)}}"""
    case GMultiPolygon(polys) =>
      s"""{"type":"MultiPolygon","coordinates":${polys.map(ringsJson).mkString("[", ",", "]")}}"""
  }

  private def ringsJson(rings: IndexedSeq[Ring]): String =
    rings.map(r => r.map { case (x, y) => s"[${fmt(x)},${fmt(y)}]" }
      .mkString("[", ",", "]")).mkString("[", ",", "]")

  private val mapper = new ObjectMapper()

  def parseGeoJson(s: String): Option[Geom] = {
    if (s == null) return None
    try {
      val node = mapper.readTree(s)
      val coords = node.get("coordinates")
      node.get("type").asText() match {
        case "Point" => Some(GPoint(coords.get(0).asDouble(), coords.get(1).asDouble()))
        case "Polygon" => Some(GPolygon(jsonRings(coords)))
        case "MultiPolygon" =>
          val polys = (0 until coords.size()).map(i => jsonRings(coords.get(i)))
          Some(GMultiPolygon(polys.toIndexedSeq))
        case _ => None
      }
    } catch { case _: Exception => None }
  }

  private def jsonRings(n: JsonNode): IndexedSeq[Ring] =
    (0 until n.size()).map { r =>
      val ring = n.get(r)
      (0 until ring.size()).map { p =>
        (ring.get(p).get(0).asDouble(), ring.get(p).get(1).asDouble())
      }: Ring
    }.toIndexedSeq

  // -------------------------------------------------------------------
  // Ops
  // -------------------------------------------------------------------

  /** Polygon→MultiPolygon promotion (zctas transformer.py:10-16); other
    * geometries pass through unchanged.
    */
  def promote(g: Geom): Geom = g match {
    case GPolygon(rings) => GMultiPolygon(IndexedSeq(rings))
    case other => other
  }

  /** Bounding box over every coordinate (App.jsx:489-507 fitBounds). */
  def envelope(g: Geom): (Double, Double, Double, Double) = {
    val pts: Iterator[Pt] = g match {
      case GPoint(x, y) => Iterator((x, y))
      case GPolygon(rings) => rings.iterator.flatten
      case GMultiPolygon(polys) => polys.iterator.flatten.flatten
    }
    var minx, miny = Double.PositiveInfinity
    var maxx, maxy = Double.NegativeInfinity
    pts.foreach { case (x, y) =>
      if (x < minx) minx = x
      if (x > maxx) maxx = x
      if (y < miny) miny = y
      if (y > maxy) maxy = y
    }
    (minx, miny, maxx, maxy)
  }

  // -------------------------------------------------------------------
  // Column functions (SQL surface)
  // -------------------------------------------------------------------

  /** GeoJSON geometry string → WKT (ingestion direction). */
  val geojsonToWkt: UserDefinedFunction = udf { s: String =>
    parseGeoJson(s).map(toWkt).orNull
  }.withName("geojsonToWkt")

  /** WKT → GeoJSON geometry string (ST_AsGeoJSON parity). */
  val stAsGeoJson: UserDefinedFunction = udf { s: String =>
    parseWkt(s).map(toGeoJson).orNull
  }.withName("stAsGeoJson")

  /** WKT POLYGON → WKT MULTIPOLYGON (single-element); pass-through otherwise. */
  val promoteToMultiPolygon: UserDefinedFunction = udf { s: String =>
    parseWkt(s).map(g => toWkt(promote(g))).orNull
  }.withName("promoteToMultiPolygon")

  /** WKT → (minx, miny, maxx, maxy). */
  val envelopeOf: UserDefinedFunction = udf { s: String =>
    parseWkt(s).map { g =>
      val (a, b, c, d) = envelope(g)
      EnvelopeBox(a, b, c, d)
    }.orNull
  }.withName("envelopeOf")

  /** Every coordinate inside the geographic (lon/lat degree) domain? */
  def isGeographic(g: Geom): Boolean = {
    val (minx, miny, maxx, maxy) = envelope(g)
    minx >= -180 && maxx <= 180 && miny >= -90 && maxy <= 90
  }

  // -------------------------------------------------------------------
  // CRS reprojection (to_crs parity, zctas transformer.py:39-40)
  // -------------------------------------------------------------------

  /** R·π for the WGS84 spherical radius R = 6378137 m — the Web
    * Mercator world half-width. Written as the literal (not computed
    * as 6378137.0 * Pi) so oracle SQL can reproduce x-axis arithmetic
    * bit-identically with the same constant.
    */
  val mercHalfWidth: Double = 20037508.342789244

  /** Web Mercator's latitude domain: |φ| ≤ atan(sinh(π)) ≈ 85.0511°. */
  val mercMaxLat: Double = 85.06

  /** Structural coordinate transform preserving geometry shape. */
  def mapCoords(g: Geom)(f: Pt => Pt): Geom = g match {
    case GPoint(x, y) => val (nx, ny) = f((x, y)); GPoint(nx, ny)
    case GPolygon(rings) => GPolygon(rings.map(_.map(f)))
    case GMultiPolygon(polys) => GMultiPolygon(polys.map(_.map(_.map(f))))
  }

  /** Round every coordinate to `digits` decimals (HALF_UP, the
    * GeoJSON-precision convention) — the float-noise absorber after a
    * projection round trip.
    */
  def roundCoords(g: Geom, digits: Int): Geom = {
    val scale = math.pow(10, digits)
    mapCoords(g) { case (x, y) =>
      (math.round(x * scale) / scale, math.round(y * scale) / scale)
    }
  }

  /** One-point CRS transform for the supported EPSG pairs:
    *
    *   - 4269 → 4326: NAD83 geographic lat/lon ≈ WGS84 (< 1 m over
    *     CONUS; the reference's only to_crs call) — a validating
    *     identity, the domain check happens in [[reprojectGeom]];
    *   - 4326 → 3857: spherical Web Mercator forward,
    *     x = λ°·(R·π)/180, y = ln(tan((90+φ°)·π/360))·(R·π)/π;
    *   - 3857 → 4326: the exact inverse.
    *
    * Anything else throws — silently wrong coordinates are worse than
    * no conversion.
    */
  def reprojectPt(from: Int, to: Int)(p: Pt): Pt = (from, to) match {
    case (a, b) if a == b => p
    case (4269, 4326) | (4326, 4269) => p
    case (4326, 3857) =>
      val (lon, lat) = p
      if (math.abs(lat) > mercMaxLat)
        throw new IllegalArgumentException(
          s"latitude $lat outside Web Mercator domain ±$mercMaxLat")
      (lon * mercHalfWidth / 180.0,
        math.log(math.tan((90.0 + lat) * math.Pi / 360.0)) * mercHalfWidth / math.Pi)
    case (3857, 4326) =>
      val (x, y) = p
      (x / mercHalfWidth * 180.0,
        (2.0 * math.atan(math.exp(y * math.Pi / mercHalfWidth)) - math.Pi / 2.0)
          * 180.0 / math.Pi)
    case _ =>
      throw new IllegalArgumentException(
        s"unsupported CRS pair EPSG:$from -> EPSG:$to " +
          "(supported: 4269->4326, 4326<->3857)")
  }

  /** Geometry-wide reprojection with the domain guard a geographic
    * source demands: converting FROM a geographic CRS first validates
    * coordinates are in lon/lat range, so a projected input (e.g.
    * EPSG:2263 state-plane feet, coordinates in the 10^5–10^6 range)
    * fails loudly rather than flowing through as silently wrong
    * "degrees".
    */
  def reprojectGeom(g: Geom, from: Int, to: Int): Geom = {
    if ((from == 4326 || from == 4269) && !isGeographic(g)) {
      val (minx, miny, maxx, maxy) = envelope(g)
      throw new IllegalArgumentException(
        s"geometry coordinates [$minx,$miny,$maxx,$maxy] fall outside the " +
          s"geographic lon/lat domain [-180,180]x[-90,90] but were declared " +
          s"EPSG:$from — input looks like a projected CRS (e.g. EPSG:2263 " +
          "state-plane); declare the true source CRS")
    }
    mapCoords(g)(reprojectPt(from, to))
  }

  /** WKT-level reprojection UDF (NULL/unparseable pass through for
    * downstream null handling, like the other codecs).
    */
  def reprojectUdf(from: Int, to: Int): UserDefinedFunction = udf { s: String =>
    parseWkt(s) match {
      case Some(g) => toWkt(reprojectGeom(g, from, to))
      case None => s
    }
  }.withName(s"reproject_${from}_$to")

  /** `to_crs("EPSG:4326")` parity guard (zctas transformer.py:39-40):
    * the NAD83→WGS84 validating identity, now expressed through the
    * real reprojection dispatch so the guard and the CRS math cannot
    * drift.
    */
  val requireGeographicCrs: UserDefinedFunction = reprojectUdf(4269, 4326)

  // -------------------------------------------------------------------
  // Containment (spatial join support)
  // -------------------------------------------------------------------

  /** Ray crossings of the horizontal ray from (x, y) with one ring —
    * the shared primitive behind containsXY and the shapefile decoder's
    * hole-attachment test, so boundary/fp behavior cannot drift between
    * the two.
    */
  def ringCrossings(r: Ring, x: Double, y: Double): Int = {
    var c = 0
    var j = r.length - 1
    var i = 0
    while (i < r.length) {
      val (xi, yi) = r(i)
      val (xj, yj) = r(j)
      if ((yi > y) != (yj > y)) {
        val xint = xi + (y - yi) * (xj - xi) / (yj - yi)
        if (x < xint) c += 1
      }
      j = i
      i += 1
    }
    c
  }

  /** Even-odd ray-cast point-in-polygon over all rings (holes handled
    * by crossing parity). Boundary behavior is fp-dependent — callers
    * joining against an exact oracle must keep test points off ring
    * edges.
    */
  def containsXY(g: Geom, x: Double, y: Double): Boolean = {
    def crossings(r: Ring): Int = ringCrossings(r, x, y)
    g match {
      case GPolygon(rings) => rings.map(crossings).sum % 2 == 1
      case GMultiPolygon(polys) => polys.exists(_.map(crossings).sum % 2 == 1)
      case GPoint(_, _) => false
    }
  }

  /** WKT polygon contains (x, y)? NULL-safe: malformed WKT → false. */
  val stContains: UserDefinedFunction = udf { (s: String, x: Double, y: Double) =>
    parseWkt(s).exists(containsXY(_, x, y))
  }.withName("stContains")

  /** Grid cells covered by the geometry's ENVELOPE at `cellSize` — the
    * index-side key generator for the grid spatial join. Cell count is
    * bounded by (envelope/cellSize)², so pick cellSize near the median
    * polygon extent; a continent-sized outlier polygon should be split
    * upstream rather than exploded into millions of cells.
    */
  def coveringCellsUdf(cellSize: Double): UserDefinedFunction = udf { s: String =>
    parseWkt(s).map { g =>
      val (minx, miny, maxx, maxy) = envelope(g)
      val cells = for {
        cx <- math.floor(minx / cellSize).toLong to math.floor(maxx / cellSize).toLong
        cy <- math.floor(miny / cellSize).toLong to math.floor(maxy / cellSize).toLong
      } yield GridCell(cx, cy)
      cells
    }.getOrElse(Seq.empty[GridCell])
  }
}

/** One covering grid cell (named case class for stable struct fields). */
final case class GridCell(cx: Long, cy: Long)

/** Envelope result shape (named case class so the UDF's struct columns
  * are stable: minx/miny/maxx/maxy).
  */
final case class EnvelopeBox(minx: Double, miny: Double, maxx: Double, maxy: Double)
