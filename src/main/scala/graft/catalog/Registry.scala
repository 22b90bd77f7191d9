package graft.catalog

/** The five registered datasets (datasets/registry.yaml:1-45), schemas
  * transcribed from each dataset's config.yaml / get_schema(). The
  * registry is a plain in-engine map — the reference's reflection-based
  * transformer loading (parser.py:29-46) becomes a direct function
  * lookup in [[graft.transform.Transformers]].
  */
object Registry {

  /** food_supply_gap/config.yaml:10-66 + transformer get_schema(). */
  val foodSupplyGap: DatasetSpec = DatasetSpec(
    key = "food_supply_gap",
    datasetId = "4kc9-zrs2",
    tableName = "food_supply_gaps",
    sourceType = "socrata",
    columns = Seq(
      ColumnSpec("year", "INTEGER", required = true),
      ColumnSpec("nta_code", "VARCHAR(10)", required = true, maxLength = Some(10)),
      ColumnSpec("nta_name", "VARCHAR(255)", maxLength = Some(255)),
      ColumnSpec("supply_gap_lbs", "NUMERIC(12, 2)"),
      ColumnSpec("food_insecure_pct", "NUMERIC(5, 2)", min = Some(0), max = Some(100)),
      ColumnSpec("unemployment_rate", "NUMERIC(5, 2)", min = Some(0), max = Some(100)),
      ColumnSpec("vulnerable_pop_score", "NUMERIC(10, 2)"),
      ColumnSpec("weighted_score", "NUMERIC(10, 2)"),
      ColumnSpec("rank", "INTEGER"),
      ColumnSpec("dataset_id", "VARCHAR(20)", required = true),
      ColumnSpec("ingestion_timestamp", "TIMESTAMP", required = true,
        default = Some("CURRENT_TIMESTAMP"))),
    validation = ValidationRules(allowDuplicates = false,
      uniqueKeys = Seq("dataset_id", "year", "nta_code")),
    indexes = Seq(
      ("idx_dataset_year", Seq("dataset_id", "year")),
      ("idx_nta_code", Seq("nta_code")),
      ("idx_rank", Seq("rank"))),
    uniqueConstraints = Seq(Seq("dataset_id", "year", "nta_code")),
    // fact-style table: partition by vintage year so snapshot queries
    // prune to one partition at scale (Catalyst PartitionFilters)
    partitionColumns = Seq("year"))

  /** census_acs/config.yaml:17-47. */
  val censusAcs: DatasetSpec = DatasetSpec(
    key = "census_acs",
    datasetId = "census_acs_5yr",
    tableName = "census_acs_income_poverty",
    sourceType = "census_api",
    columns = Seq(
      ColumnSpec("zip_code", "VARCHAR(10)", required = true, primaryKey = true),
      ColumnSpec("median_household_income", "NUMERIC(12, 2)"),
      ColumnSpec("poverty_count", "INTEGER"),
      ColumnSpec("poverty_universe", "INTEGER"),
      ColumnSpec("poverty_rate", "NUMERIC(5, 2)"),
      ColumnSpec("year", "INTEGER", required = true, primaryKey = true),
      ColumnSpec("dataset_id", "VARCHAR(20)", required = true),
      ColumnSpec("ingestion_timestamp", "TIMESTAMP",
        default = Some("CURRENT_TIMESTAMP"))),
    validation = ValidationRules(allowDuplicates = false,
      uniqueKeys = Seq("zip_code", "year")),
    indexes = Seq(("idx_census_acs_zip_year", Seq("zip_code", "year"))),
    partitionColumns = Seq("year"))

  /** census_acs variables map (config.yaml:23-26) + vintage year. */
  val censusAcsVariables: Map[String, String] = Map(
    "B19013_001E" -> "median_household_income",
    "B17020_001E" -> "poverty_universe",
    "B17020_002E" -> "poverty_count")
  val censusAcsYear: Int = 2023

  /** ntas_2020/config.yaml:16-60. */
  val ntas2020: DatasetSpec = DatasetSpec(
    key = "ntas_2020",
    datasetId = "9nt8-h7nd",
    tableName = "ntas_2020",
    sourceType = "socrata",
    columns = Seq(
      ColumnSpec("boro_code", "INTEGER"),
      ColumnSpec("boro_name", "VARCHAR(50)"),
      ColumnSpec("county_fips", "VARCHAR(3)"),
      ColumnSpec("nta2020", "VARCHAR(6)", primaryKey = true),
      ColumnSpec("nta_name", "VARCHAR(255)"),
      ColumnSpec("nta_abbrev", "VARCHAR(50)"),
      ColumnSpec("nta_type", "VARCHAR(1)"),
      ColumnSpec("cdta2020", "VARCHAR(4)"),
      ColumnSpec("cdta_name", "VARCHAR(255)"),
      ColumnSpec("shape_leng", "NUMERIC(20, 10)"),
      ColumnSpec("shape_area", "NUMERIC(20, 10)"),
      ColumnSpec("geom", "GEOMETRY('MULTIPOLYGON', srid=4326)"),
      ColumnSpec("dataset_id", "VARCHAR(20)", required = true),
      ColumnSpec("ingestion_timestamp", "TIMESTAMP", required = true,
        default = Some("CURRENT_TIMESTAMP"))),
    validation = ValidationRules(allowDuplicates = false,
      uniqueKeys = Seq("nta2020")),
    indexes = Seq(
      ("idx_ntas_2020_boro_code", Seq("boro_code")),
      ("idx_ntas_2020_nta_name", Seq("nta_name"))))

  /** ntas_2020 SODA column renames (transformer.py:31-46). */
  val ntasRenames: Map[String, String] = Map(
    "borocode" -> "boro_code", "boroname" -> "boro_name",
    "countyfips" -> "county_fips", "ntaname" -> "nta_name",
    "ntaabbrev" -> "nta_abbrev", "ntatype" -> "nta_type",
    "cdtaname" -> "cdta_name", "the_geom" -> "geom")

  /** census_zctas_2020 (config mirror; zip + MultiPolygon geometry). */
  val censusZctas2020: DatasetSpec = DatasetSpec(
    key = "census_zctas_2020",
    datasetId = "census_zctas_2020",
    tableName = "census_zctas_2020",
    sourceType = "shapefile_download",
    columns = Seq(
      ColumnSpec("zip_code", "VARCHAR(5)", required = true, primaryKey = true),
      ColumnSpec("geometry", "GEOMETRY('MULTIPOLYGON', srid=4326)"),
      ColumnSpec("dataset_id", "VARCHAR(20)", required = true),
      ColumnSpec("ingestion_timestamp", "TIMESTAMP",
        default = Some("CURRENT_TIMESTAMP"))),
    validation = ValidationRules(allowDuplicates = false,
      uniqueKeys = Seq("zip_code")))

  /** zillow_zori/config.yaml:17-40. */
  val zillowZori: DatasetSpec = DatasetSpec(
    key = "zillow_zori",
    datasetId = "zillow_zori",
    tableName = "zillow_zori",
    sourceType = "url_download",
    columns = Seq(
      ColumnSpec("zip_code", "VARCHAR(5)", required = true, primaryKey = true),
      ColumnSpec("rent_index", "FLOAT", min = Some(0)),
      ColumnSpec("date", "DATE"),
      ColumnSpec("dataset_id", "VARCHAR(50)"),
      ColumnSpec("ingestion_timestamp", "TIMESTAMP")),
    validation = ValidationRules(allowDuplicates = false,
      uniqueKeys = Seq("zip_code")))

  /** Zillow wide-CSV metadata columns that are NOT month columns
    * (zillow transformer.py:13).
    */
  val zillowMetadataCols: Seq[String] = Seq(
    "RegionID", "RegionName", "RegionType", "StateName", "State", "City",
    "Metro", "CountyName", "SizeRank")

  val all: Map[String, DatasetSpec] = Seq(
    foodSupplyGap, censusAcs, ntas2020, censusZctas2020, zillowZori)
    .map(s => s.key -> s).toMap
}
