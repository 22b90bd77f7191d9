package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.Registry
import graft.geo.Geo

/** The five per-dataset transform chains (registry.yaml:1-45), each the
  * reference transformer's semantics composed from the [[Ops]] library
  * as one lazy `df.transform` pipeline — a single Catalyst plan per
  * dataset, so pruning/pushdown work across the whole chain.
  *
  * Determinism note: pandas `keep='last'` / `groupby.first()` depend on
  * frame row order; every chain that dedups therefore takes explicit
  * order columns (callers pass the ingest-order column their source
  * provides). SURVEY §7.5.1.
  */
object Transformers {

  /** food_supply_gap (transformer.py:28-84): drop `:` SODA metadata →
    * standardize names → rename map → typed coercion → percentage
    * range-invalidation → keyed dedup keep-last → metadata → sort.
    */
  def foodSupplyGap(dedupOrder: Seq[Column])(raw: DataFrame): DataFrame = {
    val numericCols = Seq("supply_gap_lbs", "food_insecure_pct",
      "unemployment_rate", "vulnerable_pop_score", "weighted_score", "rank")
    val pctCols = Seq("food_insecure_pct", "unemployment_rate")
    var df = raw
      .transform(Ops.dropByPrefix(":"))
      .transform(Ops.normalizeColumnNames)
      .transform(Ops.renameAll(Map(
        "nta" -> "nta_code",
        "food_insecure_percentage" -> "food_insecure_pct",
        "vulnerable_population" -> "vulnerable_pop_score")))
      .withColumn("year", Ops.coerceNumeric(col("year"), IntegerType))
      .withColumn("nta_code", trim(col("nta_code").cast(StringType)))
    for (c <- numericCols if df.columns.contains(c))
      df = df.withColumn(c, Ops.coerceNumeric(col(c)))
    for (c <- pctCols if df.columns.contains(c))
      df = df.withColumn(c, Ops.rangeInvalidate(col(c), 0, 100))
    df
      .transform(Ops.dedupKeepLast(Seq("year", "nta_code"), dedupOrder))
      .transform(Ops.withIngestionMetadata(Registry.foodSupplyGap.datasetId))
      .orderBy(col("year").asc_nulls_last, col("rank").asc_nulls_last)
  }

  /** census_acs (transformer.py:9-56): variable-code renames → numeric
    * coercion → negative-sentinel invalidation → derived poverty_rate
    * (div-by-zero pinned to NULL; pandas would produce inf) → year lit.
    */
  def censusAcs(variables: Map[String, String] = Registry.censusAcsVariables,
                year: Int = Registry.censusAcsYear)(raw: DataFrame): DataFrame = {
    val numericCols = Seq("median_household_income", "poverty_universe", "poverty_count")
    var df = raw
      .transform(Ops.renameAll(variables))
      .transform(Ops.renameAll(Map("zip code tabulation area" -> "zip_code")))
    for (c <- numericCols if df.columns.contains(c))
      df = df.withColumn(c, Ops.sentinelInvalidate(Ops.coerceNumeric(col(c))))
    df.withColumn("poverty_rate",
        Ops.derivedRate(col("poverty_count"), col("poverty_universe")))
      .withColumn("year", lit(year))
      .transform(Ops.withIngestionMetadata(Registry.censusAcs.datasetId))
  }

  /** ntas_2020 (transformer.py:28-72): snake_case renames → numeric
    * shape measures → GeoJSON→WKT geometry codec → metadata.
    */
  def ntas2020(raw: DataFrame): DataFrame = {
    var df = raw
      .transform(Ops.normalizeColumnNames)
      .transform(Ops.renameAll(Registry.ntasRenames))
    for (c <- Seq("boro_code", "shape_leng", "shape_area") if df.columns.contains(c))
      df = df.withColumn(c,
        Ops.coerceNumeric(col(c), if (c == "boro_code") IntegerType else DoubleType))
    df.withColumn("geom", Geo.geojsonToWkt(col("geom")))
      .transform(Ops.withIngestionMetadata(Registry.ntas2020.datasetId))
  }

  /** census_zctas_2020 (transformer.py:28-50): NYC-ZIP membership
    * filter → rename → column select → CRS guard (the reference's
    * to_crs("EPSG:4326"), transformer.py:39-40 — validating identity
    * for geographic input, loud failure for projected coordinates) →
    * Polygon→MultiPolygon promotion (input geometry already WKT from
    * the shapefile source, §7.4) → metadata.
    */
  def censusZctas2020(nycZips: Seq[String])(raw: DataFrame): DataFrame =
    raw
      .filter(col("ZCTA5CE20").isin(nycZips: _*))
      .transform(Ops.renameAll(Map("ZCTA5CE20" -> "zip_code")))
      .select(col("zip_code"), col("geometry"))
      .withColumn("geometry", Geo.requireGeographicCrs(col("geometry")))
      .withColumn("geometry", Geo.promoteToMultiPolygon(col("geometry")))
      .transform(Ops.withIngestionMetadata(Registry.censusZctas2020.datasetId))

  /** zillow_zori (transformer.py:5-38): NYC-ZIP filter → wide→long
    * unpivot of the month columns → to_date → drop null rent →
    * latest-per-ZIP argmax → final projection.
    *
    * `tieBreak` extends the per-ZIP order beyond date so "latest" is
    * deterministic when a source ships duplicate month columns.
    */
  def zillowZori(nycZips: Seq[String], tieBreak: Seq[Column] = Nil)(raw: DataFrame): DataFrame = {
    val dateCols = raw.columns.filterNot(Registry.zillowMetadataCols.contains).toSeq
    raw
      .withColumn("RegionName", col("RegionName").cast(StringType))
      .filter(col("RegionName").isin(nycZips: _*))
      .transform(Ops.unpivotToLong(Seq("RegionName"), dateCols, "date", "rent_index"))
      .withColumn("date", to_date(col("date")))
      .na.drop(Seq("rent_index"))
      .transform(Ops.latestPerGroup(Seq("RegionName"),
        col("date").desc +: tieBreak))
      .transform(Ops.renameAll(Map("RegionName" -> "zip_code")))
      .select("zip_code", "rent_index", "date")
      .transform(Ops.withIngestionMetadata(Registry.zillowZori.datasetId))
  }

  /** CONFIG-DRIVEN GENERIC CHAIN — the transform a YAML-registered
    * dataset gets when its `transformer_class` has no compiled
    * counterpart (the engine's answer to parser.py:29-46's reflection
    * for brand-new datasets): every step is derived from the
    * [[graft.catalog.DatasetSpec]] the config declared, composing the
    * same [[Ops]] primitives the hand-written chains use —
    *
    *   drop `:` SODA metadata → standardize names → per-declared-column
    *   typed coercion (numerics null-on-fail, strings trimmed) →
    *   declared min/max range-invalidation → keyed dedup keep-last on
    *   the validation unique_keys (when duplicates are disallowed) →
    *   ingestion metadata.
    *
    * Like the compiled chains it is ONE lazy Catalyst plan; dedup
    * order is the caller-stamped ingest order (pandas keep='last'
    * parity, SURVEY §7.5.1).
    */
  def generic(spec: graft.catalog.DatasetSpec,
              dedupOrder: Seq[Column] = Nil)(raw: DataFrame): DataFrame = {
    var df = raw
      .transform(Ops.dropByPrefix(":"))
      .transform(Ops.normalizeColumnNames)
    for (c <- spec.columns if df.columns.contains(c.name)) {
      val target = graft.catalog.SchemaCompiler.toSparkType(c.sqlType)
      df = target match {
        case t: NumericType =>
          df.withColumn(c.name, Ops.coerceNumeric(col(c.name), t))
        case StringType =>
          df.withColumn(c.name, trim(col(c.name).cast(StringType)))
        case t =>
          df.withColumn(c.name, col(c.name).cast(t))
      }
      (c.min, c.max) match {
        case (Some(lo), Some(hi)) =>
          df = df.withColumn(c.name, Ops.rangeInvalidate(col(c.name), lo, hi))
        case (Some(lo), None) =>
          df = df.withColumn(c.name, when(col(c.name) >= lo, col(c.name)))
        case (None, Some(hi)) =>
          df = df.withColumn(c.name, when(col(c.name) <= hi, col(c.name)))
        case _ => ()
      }
    }
    // dedup ONLY when every unique key is present (dataset_id is the
    // constant stamped below, so it never discriminates) — deduping on
    // a partial key set would silently over-collapse
    val keys = spec.validation.uniqueKeys.filterNot(_ == "dataset_id")
    val deduped =
      if (!spec.validation.allowDuplicates && keys.nonEmpty &&
          keys.forall(df.columns.contains) && dedupOrder.nonEmpty)
        df.transform(Ops.dedupKeepLast(keys, dedupOrder))
      else df
    deduped.transform(Ops.withIngestionMetadata(spec.datasetId))
  }
}
