package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.geo.Geo
import graft.sources.Tables

/** Geometry-bearing queries (SURVEY §2.7 geo row + §2.6 #1).
  *
  * The testdata has no geometry column, so geometries are *synthesized
  * deterministically from keys* (unit squares at integer offsets):
  * the Spark side builds WKT/GeoJSON strings, runs the real codec UDFs
  * ([[graft.geo.Geo]]), and the DuckDB oracle reproduces the expected
  * output bytes with plain string concatenation — which makes the
  * codecs themselves oracle-checkable, not just the arithmetic.
  * GeoSpec adds golden round-trips on real NYC-shaped MultiPolygons
  * (holes, multiple parts, fractional coordinates).
  */
object GeoQ {

  /** Square POLYGON WKT at x∈[k,k+1], y∈[m,m+1], integral coords. */
  private def squareWkt(k: org.apache.spark.sql.Column, m: org.apache.spark.sql.Column) =
    format_string("POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
      k, m, k + 1, m, k + 1, m + 1, k, m + 1, k, m)

  private val oracleSquareWkt =
    """'POLYGON ((' || k || ' ' || m || ', ' || (k+1) || ' ' || m || ', ' ||
      | (k+1) || ' ' || (m+1) || ', ' || k || ' ' || (m+1) || ', ' ||
      | k || ' ' || m || '))'""".stripMargin.replaceAll("\n", "")

  /** C4 — envelope of a parsed WKT geometry; oracle computes the box
    * directly from the generating numbers. Ref: App.jsx:489-507.
    */
  val qGeoEnvelope: Q = Q.sql(
    "q_geo_envelope",
    s"""WITH g AS (
       |  SELECT n_nationkey, n_nationkey AS k, n_nationkey % 5 AS m FROM nation)
       |SELECT n_nationkey,
       |  CAST(k AS DOUBLE) AS minx, CAST(m AS DOUBLE) AS miny,
       |  CAST(k + 1 AS DOUBLE) AS maxx, CAST(m + 1 AS DOUBLE) AS maxy
       |FROM g
       |ORDER BY n_nationkey ASC""".stripMargin) { (s, d) =>
    val k = col("n_nationkey")
    val m = col("n_nationkey") % 5
    Tables.nation(s, d)
      .select(col("n_nationkey"), Geo.envelopeOf(squareWkt(k, m)).as("env"))
      .select(col("n_nationkey"), col("env.minx"), col("env.miny"),
        col("env.maxx"), col("env.maxy"))
      .orderBy(col("n_nationkey").asc)
  }

  /** §2.7 — GeoJSON→WKT ingestion codec + ST_AsGeoJSON output codec,
    * round-tripped. The oracle re-builds both expected strings from the
    * generating key. Ref: ntas transformer.py:94-121; routes.py:29.
    */
  val qGeoRoundtrip: Q = Q.sql(
    "q_geo_roundtrip",
    s"""WITH g AS (SELECT n_nationkey, n_nationkey AS k, n_nationkey % 5 AS m FROM nation),
       |built AS (
       |  SELECT n_nationkey,
       |    '{"type":"MultiPolygon","coordinates":[[[[' || k || ',' || m || '],[' ||
       |      (k+1) || ',' || m || '],[' || (k+1) || ',' || (m+1) || '],[' ||
       |      k || ',' || (m+1) || '],[' || k || ',' || m || ']]]]}' AS geojson_in,
       |    'MULTIPOLYGON (((' || k || ' ' || m || ', ' || (k+1) || ' ' || m || ', ' ||
       |      (k+1) || ' ' || (m+1) || ', ' || k || ' ' || (m+1) || ', ' ||
       |      k || ' ' || m || ')))' AS wkt
       |  FROM g)
       |SELECT n_nationkey, wkt, geojson_in AS geojson_rt
       |FROM built
       |ORDER BY n_nationkey ASC""".stripMargin) { (s, d) =>
    val k = col("n_nationkey")
    val m = col("n_nationkey") % 5
    val geojsonIn = format_string(
      """{"type":"MultiPolygon","coordinates":[[[[%d,%d],[%d,%d],[%d,%d],[%d,%d],[%d,%d]]]]}""",
      k, m, k + 1, m, k + 1, m + 1, k, m + 1, k, m)
    Tables.nation(s, d)
      .select(col("n_nationkey"), Geo.geojsonToWkt(geojsonIn).as("wkt"))
      .withColumn("geojson_rt", Geo.stAsGeoJson(col("wkt")))
      .orderBy(col("n_nationkey").asc)
  }

  /** §2.7 — Polygon→MultiPolygon promotion at the WKT level.
    * Ref: zctas transformer.py:10-16.
    */
  val qGeoPromote: Q = Q.sql(
    "q_geo_promote",
    s"""WITH g AS (SELECT n_nationkey, n_nationkey AS k, n_nationkey % 5 AS m FROM nation)
       |SELECT n_nationkey,
       |  'MULTIPOLYGON (((' || k || ' ' || m || ', ' || (k+1) || ' ' || m || ', ' ||
       |    (k+1) || ' ' || (m+1) || ', ' || k || ' ' || (m+1) || ', ' ||
       |    k || ' ' || m || ')))' AS multi_wkt
       |FROM g
       |ORDER BY n_nationkey ASC""".stripMargin) { (s, d) =>
    val k = col("n_nationkey")
    val m = col("n_nationkey") % 5
    Tables.nation(s, d)
      .select(col("n_nationkey"),
        Geo.promoteToMultiPolygon(squareWkt(k, m)).as("multi_wkt"))
      .orderBy(col("n_nationkey").asc)
  }

  /** §2.7 — real CRS reprojection (to_crs parity): forward Web
    * Mercator (EPSG:4326 → 3857) then back, on the synthesized
    * integral squares.
    *
    * What the oracle hash-verifies without transcendental-bitwise
    * risk: (a) `merc_minx`, the projected x of the west edge — the
    * x-axis is pure multiply/divide with a shared literal constant, so
    * IEEE doubles match DuckDB exactly; (b) `wkt_rt`, the full
    * round-trip geometry rounded to 9 decimals — the true coordinates
    * are INTEGERS, forward+inverse error is ~1e-12, so the rounded
    * round-trip reproduces the input WKT byte-for-byte and the oracle
    * rebuilds it from the generating keys. The y-axis forward values
    * (ln/tan — last-ulp-dependent across libm implementations, so
    * deliberately not hash-gated) are pinned against published
    * EPSG:3857 coordinates in GeoReprojectSpec.
    */
  val qGeoReproject: Q = Q.sql(
    "q_geo_reproject",
    s"""WITH g AS (SELECT n_nationkey, n_nationkey AS k, n_nationkey % 5 AS m FROM nation)
       |SELECT n_nationkey,
       |  CAST(k AS DOUBLE) * 20037508.342789244 / 180.0 AS merc_minx,
       |  $oracleSquareWkt AS wkt_rt
       |FROM g
       |ORDER BY n_nationkey ASC""".stripMargin) { (s, d) =>
    val k = col("n_nationkey")
    val m = col("n_nationkey") % 5
    val wkt = squareWkt(k, m)
    Tables.nation(s, d)
      .select(col("n_nationkey"),
        Geo.envelopeOf(Geo.reprojectUdf(4326, 3857)(wkt)).getField("minx")
          .as("merc_minx"),
        mercRoundTrip(wkt).as("wkt_rt"))
      .orderBy(col("n_nationkey").asc)
  }

  /** 4326 → 3857 → 4326 with 9-decimal rounding (float-noise absorber;
    * GeoJSON precision). One UDF so the WKT parses once per leg.
    */
  private val mercRoundTrip: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { s: String =>
      Geo.parseWkt(s) match {
        case Some(g) =>
          Geo.toWkt(Geo.roundCoords(
            Geo.reprojectGeom(Geo.reprojectGeom(g, 4326, 3857), 3857, 4326), 9))
        case None => s
      }
    }.withName("mercRoundTrip")

  /** §2.6 #1 — the food-gaps query end-to-end with geometry: geometry
    * dim LEFT JOIN fact rollup, max-year snapshot filter (quirk: the
    * year predicate turns the left join inner — preserved), per-row
    * Feature JSON with real GeoJSON geometry, aggregated into ONE
    * FeatureCollection. Ref: routes.py:23-46; export_static_data.py:23-46.
    *
    * Scale note: collecting a whole FeatureCollection to one row is the
    * reference's serving shape (≤ a few hundred features). The 100 TB
    * path writes per-feature JSON lines instead — graft.sink.JsonFeatureSink.
    */
  val qFoodGapsGeo: Q = Q.sql(
    "q_food_gaps_geo",
    s"""WITH zones AS (
       |  SELECT n_nationkey, n_name,
       |    '{"type":"MultiPolygon","coordinates":[[[[' || n_nationkey || ',0],[' ||
       |      (n_nationkey+1) || ',0],[' || (n_nationkey+1) || ',1],[' ||
       |      n_nationkey || ',1],[' || n_nationkey || ',0]]]]}' AS geom
       |  FROM nation),
       |fact AS (
       |  SELECT c.c_nationkey AS zone_key, CAST(year(o.o_orderdate) AS INT) AS year,
       |    COUNT(*) AS n_orders
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |  GROUP BY 1, 2),
       |snap AS (
       |  SELECT z.n_name, z.geom, f.year, f.n_orders
       |  FROM zones z LEFT JOIN fact f ON z.n_nationkey = f.zone_key
       |  WHERE f.year = (SELECT MAX(year) FROM fact)),
       |feats AS (
       |  SELECT '{"type":"Feature","geometry":' || geom || ',"properties":{"zone":"' ||
       |    n_name || '","year":' || year || ',"n_orders":' || n_orders || '}}' AS feature
       |  FROM snap)
       |SELECT '{"type":"FeatureCollection","features":[' ||
       |    string_agg(feature, ',' ORDER BY feature) || ']}' AS fc,
       |  COUNT(*) AS n_features
       |FROM feats""".stripMargin) { (s, d) =>
    val nation = Tables.nation(s, d)
    val zones = nation.select(col("n_nationkey"), col("n_name"),
      Geo.stAsGeoJson(Geo.promoteToMultiPolygon(
        squareWkt(col("n_nationkey"), lit(0L)))).as("geom"))
    val fact = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("zone_key"),
        year(col("o_orderdate")).as("year"))
      .agg(count(lit(1)).as("n_orders"))
    val maxYear = fact.agg(max(col("year")).as("max_year"))
    val snap = zones
      .join(fact, zones("n_nationkey") === fact("zone_key"), "left")
      .join(broadcast(maxYear), col("year") === col("max_year"))
    val feature = concat(
      lit("""{"type":"Feature","geometry":"""), col("geom"),
      lit(""","properties":"""),
      to_json(struct(col("zone"), col("year"), col("n_orders"))),
      lit("}"))
    snap
      .select(col("n_name").as("zone"), col("geom"), col("year"), col("n_orders"))
      .select(feature.as("feature"))
      .agg(
        concat(lit("""{"type":"FeatureCollection","features":["""),
          array_join(sort_array(collect_list(col("feature"))), ","),
          lit("]}")).as("fc"),
        count(lit(1)).as("n_features"))
  }

  /** Grid-indexed point-in-polygon spatial join: polygons explode into
    * the grid cells covering their envelope (index side, small), points
    * compute their single cell NATIVELY in the scan (floor(x/cell) —
    * no UDF on the big side), the candidate join is a plain equi-join
    * on (cx, cy), and the exact ray-cast containment runs only on
    * candidates. Never a cross product: candidate volume is bounded by
    * points-per-cell × polygons-per-cell. This is the standard
    * scale-out spatial join (grid/quadtree partitioning); hot cells
    * (Manhattan) are handled by the same salting/AQE machinery as any
    * skewed equi-join.
    */
  def pointInPolygonJoin(points: DataFrame, polys: DataFrame,
                         cellSize: Double): DataFrame = {
    val cells = polys
      .withColumn("__cell",
        explode(Geo.coveringCellsUdf(cellSize)(col("wkt"))))
      .select(polys.columns.map(col) :+ col("__cell.cx").as("__cx") :+
        col("__cell.cy").as("__cy"): _*)
    val keyed = points
      .withColumn("__cx", floor(col("x") / cellSize).cast("long"))
      .withColumn("__cy", floor(col("y") / cellSize).cast("long"))
    keyed.join(cells, Seq("__cx", "__cy"))
      .filter(Geo.stContains(col("wkt"), col("x"), col("y")))
      .drop("__cx", "__cy")
  }

  /** Oracle-gated spatial join: disjoint unit squares synthesized from
    * nation keys at even offsets, points synthesized from customer keys
    * at .n5 coordinates (never on a ring edge, so ray-cast and the
    * oracle's interval test agree exactly). The oracle exploits that
    * the squares are axis-aligned; the Spark side runs the GENERAL
    * grid-join + ray-cast path.
    */
  val qPointInPoly: Q = Q.sql(
    "q_geo_point_in_poly",
    """WITH p AS (
      |  SELECT c_custkey,
      |    ((c_custkey % 100) + 0.5) / 10.0 AS x,
      |    (((c_custkey * 7) % 100) + 0.5) / 10.0 AS y
      |  FROM customer),
      |n AS (
      |  SELECT n_nationkey,
      |    2 * (n_nationkey % 5) AS k, 2 * (n_nationkey // 5) AS m
      |  FROM nation)
      |SELECT p.c_custkey, n.n_nationkey, p.x, p.y
      |FROM p JOIN n
      |  ON p.x >= k AND p.x <= k + 1 AND p.y >= m AND p.y <= m + 1
      |ORDER BY c_custkey ASC, n_nationkey ASC""".stripMargin) { (s, d) =>
    val points = Tables.customer(s, d)
      .select(col("c_custkey"),
        ((col("c_custkey") % 100 + lit(0.5)) / 10.0).as("x"),
        ((col("c_custkey") * 7 % 100 + lit(0.5)) / 10.0).as("y"))
    val polys = Tables.nation(s, d)
      .select(col("n_nationkey"),
        squareWkt((col("n_nationkey") % 5 * 2).cast("int"),
          (floor(col("n_nationkey") / 5) * 2).cast("int")).as("wkt"))
    pointInPolygonJoin(points, polys, cellSize = 1.0)
      .select(col("c_custkey"), col("n_nationkey"), col("x"), col("y"))
      .orderBy(col("c_custkey").asc, col("n_nationkey").asc)
  }

  val all: Seq[Q] = Seq(qGeoEnvelope, qGeoRoundtrip, qGeoPromote, qGeoReproject,
    qFoodGapsGeo, qPointInPoly)
}
