package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.transform.Transformers

/** The five per-dataset transformer chains (SURVEY §2.6/§7.3 step 3)
  * run END-TO-END as oracle-checked queries: testdata tables are shaped
  * into each source's raw form (SODA metadata columns, Census variable
  * codes, wide Zillow months, GeoJSON geometry), the real
  * [[graft.transform.Transformers]] chain runs, and the DuckDB oracle
  * re-implements the full chain semantics in SQL. This is what proves
  * the composed chains — not just their individual Ops — match the
  * reference transformers.
  *
  * dataset_id/ingestion_timestamp are dropped from outputs (wall-clock
  * timestamps can't hash-compare); OpsSpec covers P5 directly.
  */
object TransformQ {

  /** food_supply_gap chain (transformer.py:28-84): P1 drop-`:`-prefix →
    * P3 name normalization → P2 renames → P6 coercion → P8 range
    * invalidation → W2 dedup keep-last → O1 sort.
    */
  val qChainFood: Q = Q.sql(
    "q_chain_food",
    """WITH raw AS (
      |  SELECT year(o_orderdate) AS yr, 'NT' || (o_custkey % 50) AS nta,
      |    o_totalprice % 150 AS pct, o_orderkey % 7 AS rnk,
      |    o_orderkey AS row_order
      |  FROM orders),
      |dedup AS (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY yr, nta
      |      ORDER BY row_order DESC) AS rn
      |    FROM raw) WHERE rn = 1)
      |SELECT CAST(yr AS INT) AS year, nta AS nta_code,
      |  CASE WHEN pct >= 0 AND pct <= 100 THEN pct END AS food_insecure_pct,
      |  CAST(rnk AS DOUBLE) AS rank
      |FROM dedup
      |ORDER BY year ASC, nta_code ASC""".stripMargin) { (s, d) =>
    val raw = Tables.orders(s, d).select(
      col("o_orderkey").cast(StringType).as(":id"),
      lit("v1").as(":version"),
      year(col("o_orderdate")).cast(StringType).as("Year"),
      concat(lit("NT"), (col("o_custkey") % 50).cast(StringType)).as("NTA"),
      (col("o_totalprice") % 150).cast(StringType).as("Food Insecure Percentage"),
      (col("o_orderkey") % 7).cast(StringType).as("Rank"),
      col("o_orderkey").as("Row Order"))
    raw
      .transform(Transformers.foodSupplyGap(dedupOrder = Seq(col("row_order"))))
      .select("year", "nta_code", "food_insecure_pct", "rank")
      .orderBy(col("year").asc, col("nta_code").asc)
  }

  /** census_acs chain (transformer.py:9-56): P2 variable renames → P6
    * coercion → P9 sentinel invalidation → P11 derived rate with
    * div-by-zero → NULL → year literal.
    */
  val qChainCensus: Q = Q.sql(
    "q_chain_census",
    """SELECT '1' || CAST(s_suppkey AS VARCHAR) AS zip_code,
      |  CASE WHEN s_acctbal >= 0 THEN s_acctbal END AS median_household_income,
      |  CAST(s_suppkey % 120 AS DOUBLE) AS poverty_count,
      |  CAST(s_suppkey % 7 AS DOUBLE) AS poverty_universe,
      |  round(CAST(s_suppkey % 120 AS DOUBLE)
      |    / NULLIF(CAST(s_suppkey % 7 AS DOUBLE), 0) * 100, 2) AS poverty_rate,
      |  2023 AS year
      |FROM supplier
      |ORDER BY zip_code ASC""".stripMargin) { (s, d) =>
    val raw = Tables.supplier(s, d).select(
      // '1' || key is injective at ANY scale factor (lpad-to-4 would
      // silently truncate 5-digit keys into colliding zips at sf >= 1)
      concat(lit("1"), col("s_suppkey").cast(StringType))
        .as("zip code tabulation area"),
      when(col("s_acctbal") < 0, lit("-666666666"))
        .otherwise(col("s_acctbal").cast(StringType)).as("B19013_001E"),
      (col("s_suppkey") % 120).cast(StringType).as("B17020_002E"),
      (col("s_suppkey") % 7).cast(StringType).as("B17020_001E"))
    raw
      .transform(Transformers.censusAcs())
      .select("zip_code", "median_household_income", "poverty_count",
        "poverty_universe", "poverty_rate", "year")
      .orderBy(col("zip_code").asc)
  }

  /** ntas_2020 chain (transformer.py:28-72): P3 normalization → P2
    * renames → P6 coercion → GeoJSON→WKT geometry codec.
    */
  val qChainNtas: Q = Q.sql(
    "q_chain_ntas",
    """WITH g AS (SELECT n_nationkey AS k, n_name FROM nation)
      |SELECT n_name AS nta_name, CAST(k % 5 AS INT) AS boro_code,
      |  'MULTIPOLYGON (((' || k || ' 0, ' || (k+1) || ' 0, ' || (k+1) || ' 1, ' ||
      |    k || ' 1, ' || k || ' 0)))' AS geom
      |FROM g
      |ORDER BY nta_name ASC""".stripMargin) { (s, d) =>
    val k = col("n_nationkey")
    val geojson = format_string(
      """{"type":"MultiPolygon","coordinates":[[[[%d,0],[%d,0],[%d,1],[%d,1],[%d,0]]]]}""",
      k, k + 1, k + 1, k, k)
    val raw = Tables.nation(s, d).select(
      col("n_name").as("NTAName"),
      (col("n_nationkey") % 5).cast(StringType).as("BoroCode"),
      geojson.as("the_geom"))
    raw
      .transform(Transformers.ntas2020)
      .select("nta_name", "boro_code", "geom")
      .orderBy(col("nta_name").asc)
  }

  /** census_zctas_2020 chain (transformer.py:28-50): P12 membership
    * filter → P2/P4 rename+select → Polygon→MultiPolygon promotion.
    */
  val qChainZctas: Q = Q.sql(
    "q_chain_zctas",
    """WITH g AS (SELECT n_nationkey AS k FROM nation WHERE n_nationkey % 2 = 0)
      |SELECT '1' || lpad(CAST(k AS VARCHAR), 4, '0') AS zip_code,
      |  'MULTIPOLYGON (((' || k || ' 0, ' || (k+1) || ' 0, ' || (k+1) || ' 1, ' ||
      |    k || ' 1, ' || k || ' 0)))' AS geometry
      |FROM g
      |ORDER BY zip_code ASC""".stripMargin) { (s, d) =>
    val k = col("n_nationkey")
    val polyWkt = format_string("POLYGON ((%d 0, %d 0, %d 1, %d 1, %d 0))",
      k, k + 1, k + 1, k, k)
    val raw = Tables.nation(s, d).select(
      concat(lit("1"), lpad(k.cast(StringType), 4, "0")).as("ZCTA5CE20"),
      polyWkt.as("geometry"))
    val nycZips = (0 until 25 by 2).map(i => f"1$i%04d")
    raw
      .transform(Transformers.censusZctas2020(nycZips))
      .select("zip_code", "geometry")
      .orderBy(col("zip_code").asc)
  }

  /** zillow_zori chain (transformer.py:5-38): P12 filter → wide→long
    * unpivot → to_date → P13 drop-null → W1 latest-per-group argmax.
    */
  val qChainZillow: Q = Q.sql(
    "q_chain_zillow",
    """WITH raw AS (
      |  SELECT CAST(10000 + p_partkey % 300 AS VARCHAR) AS zip,
      |    p_retailprice AS m1,
      |    CASE WHEN p_size <= 25 THEN p_size * 100.0 END AS m2
      |  FROM part
      |  WHERE (p_partkey % 300) % 3 = 0),
      |long AS (
      |  SELECT zip, DATE '2024-01-31' AS date, m1 AS rent FROM raw
      |  UNION ALL
      |  SELECT zip, DATE '2024-02-29' AS date, m2 AS rent FROM raw),
      |filt AS (SELECT * FROM long WHERE rent IS NOT NULL),
      |latest AS (
      |  SELECT * FROM (
      |    SELECT zip, rent, date, ROW_NUMBER() OVER (PARTITION BY zip
      |      ORDER BY date DESC, rent DESC) AS rn
      |    FROM filt) WHERE rn = 1)
      |SELECT zip AS zip_code, rent AS rent_index, date
      |FROM latest
      |ORDER BY zip_code ASC""".stripMargin) { (s, d) =>
    val zip = (lit(10000) + col("p_partkey") % 300).cast(StringType)
    val raw = Tables.part(s, d).select(
      zip.as("RegionName"),
      lit("zip").as("RegionType"),
      col("p_retailprice").as("2024-01-31"),
      when(col("p_size") <= 25, col("p_size") * 100.0).as("2024-02-29"))
    val nycZips = (0 until 300 by 3).map(i => (10000 + i).toString)
    raw
      .transform(Transformers.zillowZori(nycZips, tieBreak = Seq(col("rent_index").desc)))
      .select("zip_code", "rent_index", "date")
      .orderBy(col("zip_code").asc)
  }

  val all: Seq[Q] = Seq(qChainFood, qChainCensus, qChainNtas, qChainZctas,
    qChainZillow)
}
