package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.geo.Geo
import graft.sink.JsonFeatureSink

/** The reference's three production queries (§2.6), implemented over
  * the engine's five NYC tables with their REAL shapes — geometry dim ⋈
  * fact, max-year snapshot filters, NULL guards, ST_AsGeoJSON geometry,
  * Feature structs. These are the DataFrame programs the API/exporter
  * surface runs (routes.py:23-46, 63-87, 109-129 =
  * export_static_data.py:21-115); NycPipelineSpec drives them over
  * NYC-shaped fixtures to the reference's output cardinalities
  * (197/177/155 — BASELINE.md).
  *
  * Scale shape: the geometry dims (≤ a few hundred rows) broadcast;
  * facts aggregate/filter before joining; the year snapshot is a 1-row
  * broadcast, not a driver collect. Feature assembly is per-row; only
  * the final FeatureCollection collect is bounded-output driver work
  * (JsonFeatureSink.writeFeatureLines is the unbounded path).
  */
object NycQueries {

  private def featuresOf(df: DataFrame, geomWkt: Column, props: Seq[Column]): DataFrame =
    df.select(JsonFeatureSink.featureJson(Geo.stAsGeoJson(geomWkt), props: _*)
      .as("feature"))

  /** food-gaps (routes.py:23-46): `ntas_2020 n LEFT JOIN food_supply_gaps f
    * ON n.nta2020 = f.nta_code WHERE f.year = (SELECT MAX(year) …)` —
    * the year predicate silently turns the left join inner (reference
    * quirk, preserved) — then per-NTA Feature rows.
    */
  def foodGaps(ntas: DataFrame, gaps: DataFrame): DataFrame = {
    val maxYear = gaps.agg(max(col("year")).as("__max_year"))
    val joined = ntas.as("n")
      .join(gaps.as("f"), col("n.nta2020") === col("f.nta_code"), "left")
      .join(broadcast(maxYear), col("f.year") === col("__max_year"))
    featuresOf(joined, col("n.geom"), Seq(
      col("n.nta2020").as("nta_code"), col("n.nta_name"), col("n.boro_name"),
      col("f.year"), col("f.supply_gap_lbs"), col("f.food_insecure_pct"),
      col("f.vulnerable_pop_score"), col("f.unemployment_rate")))
  }

  /** poverty-by-zip (routes.py:63-87): `zctas JOIN acs ON zip_code
    * WHERE year = max(year) AND poverty_rate IS NOT NULL AND
    * median_household_income IS NOT NULL`.
    */
  def povertyByZip(zctas: DataFrame, acs: DataFrame): DataFrame = {
    val maxYear = acs.agg(max(col("year")).as("__max_year"))
    val joined = zctas.as("z")
      .join(acs.as("c"), Seq("zip_code"))
      .join(broadcast(maxYear), col("c.year") === col("__max_year"))
      .filter(col("c.poverty_rate").isNotNull &&
        col("c.median_household_income").isNotNull)
    featuresOf(joined, col("z.geometry"), Seq(
      col("zip_code"), col("c.year"), col("c.poverty_rate"),
      col("c.median_household_income"), col("c.poverty_count"),
      col("c.poverty_universe")))
  }

  /** rent-by-zip (routes.py:109-129): `zctas JOIN zillow_zori ON
    * zip_code WHERE rent_index IS NOT NULL`, with
    * `EXTRACT(YEAR FROM date)`.
    */
  def rentByZip(zctas: DataFrame, zori: DataFrame): DataFrame = {
    val joined = zctas.as("z")
      .join(zori.as("r"), Seq("zip_code"))
      .filter(col("r.rent_index").isNotNull)
    featuresOf(joined, col("z.geometry"), Seq(
      col("zip_code"), col("r.rent_index"), col("r.date"),
      year(col("r.date")).as("year")))
  }
}
