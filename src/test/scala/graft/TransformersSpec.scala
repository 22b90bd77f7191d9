package graft

import org.apache.spark.sql.functions._

import graft.transform.Transformers

/** Golden tests for the five dataset chains on NYC-shaped fixtures —
  * small hand-pinned inputs/outputs exercising the semantic quirks the
  * oracle-checked TransformQ analogs can't (string geometry from the
  * real NTA shape, messy SODA payloads, Zillow wide CSV with metadata
  * columns).
  */
class TransformersSpec extends SparkSpecBase {
  import spark.implicits._

  test("food chain: SODA metadata dropped, names mapped, pcts invalidated, keep-last dedup") {
    val raw = Seq(
      // (:id, Year, NTA, Food Insecure Percentage, Rank, Row Order)
      ("r1", "2023", " BK0101 ", "12.5", "1", 1L),
      ("r2", "2023", "BK0101", "200", "2", 2L), // same key, later → wins; pct out of range
      ("r3", "2023", "QN0201", "abc", "3", 3L), // unparseable pct → null
      ("r4", "bad", "MN0301", "55", "4", 4L) // unparseable year → null
    ).toDF(":id", "Year", "NTA", "Food Insecure Percentage", "Rank", "Row Order")
    val out = raw.transform(Transformers.foodSupplyGap(Seq(col("row_order"))))
    assert(!out.columns.contains(":id"))
    assert(out.columns.contains("dataset_id") && out.columns.contains("ingestion_timestamp"))
    val rows = out.select("year", "nta_code", "food_insecure_pct", "rank")
      .collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getInt(0)),
        r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.length == 3) // BK0101 deduped (keep row_order=2)
    val bk = rows.find(_._2 == "BK0101").get
    assert(bk._1.contains(2023))
    assert(bk._3.isEmpty, "out-of-range 200 must be invalidated to NULL")
    assert(bk._4.contains(2.0), "keep-last must retain the later row")
    assert(rows.find(_._2 == "QN0201").get._3.isEmpty)
    assert(rows.find(_._2 == "MN0301").get._1.isEmpty)
  }

  test("census chain: sentinel -666666666 nulled, poverty rate derived, div0 -> NULL") {
    val raw = Seq(
      ("10001", "65000.5", "120", "1000"),
      ("10002", "-666666666", "50", "0"), // sentinel income; universe 0 → rate NULL
      ("10003", "oops", "10", "40") // unparseable income → NULL
    ).toDF("zip code tabulation area", "B19013_001E", "B17020_002E", "B17020_001E")
    val out = raw.transform(Transformers.censusAcs()).collect()
      .map(r => r.getAs[String]("zip_code") -> r).toMap
    assert(out("10001").getAs[Double]("median_household_income") == 65000.5)
    assert(out("10001").getAs[Double]("poverty_rate") == 12.0)
    assert(out("10001").getAs[Int]("year") == 2023)
    assert(out("10002").isNullAt(out("10002").fieldIndex("median_household_income")))
    assert(out("10002").isNullAt(out("10002").fieldIndex("poverty_rate")),
      "divide-by-zero must pin to NULL (pandas inf quirk, SURVEY §7.5.1)")
    assert(out("10003").isNullAt(out("10003").fieldIndex("median_household_income")))
  }

  test("ntas chain: real NTA-shaped GeoJSON becomes WKT MultiPolygon") {
    val gj = """{"type":"MultiPolygon","coordinates":[[[[-73.95,40.75],[-73.92,40.75],[-73.92,40.78],[-73.95,40.75]]]]}"""
    val raw = Seq(("BK0101", "Greenpoint", "3", gj))
      .toDF("NTA2020", "NTAName", "BoroCode", "the_geom")
    val out = raw.transform(Transformers.ntas2020).head()
    assert(out.getAs[String]("nta2020") == "BK0101")
    assert(out.getAs[String]("nta_name") == "Greenpoint")
    assert(out.getAs[Int]("boro_code") == 3)
    assert(out.getAs[String]("geom") ==
      "MULTIPOLYGON (((-73.95 40.75, -73.92 40.75, -73.92 40.78, -73.95 40.75)))")
  }

  test("zctas chain: filters to NYC zips, promotes Polygon geometry") {
    val raw = Seq(
      ("10001", "POLYGON ((0 0, 1 0, 1 1, 0 0))"),
      ("90210", "POLYGON ((5 5, 6 5, 6 6, 5 5))") // not NYC → dropped
    ).toDF("ZCTA5CE20", "geometry")
    val out = raw.transform(Transformers.censusZctas2020(Seq("10001"))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("zip_code") == "10001")
    assert(out.head.getAs[String]("geometry") ==
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")
  }

  test("zillow chain: wide CSV melts, metadata cols excluded, latest non-null month wins") {
    val raw = Seq(
      // RegionID, RegionName, SizeRank, 2024-01-31, 2024-02-29
      (1L, "10001", 7L, Some(3000.0), Some(3100.0)),
      (2L, "10002", 8L, Some(2500.0), None), // Feb missing → Jan survives
      (3L, "90210", 9L, Some(9000.0), Some(9100.0)) // not NYC
    ).toDF("RegionID", "RegionName", "SizeRank", "2024-01-31", "2024-02-29")
    val out = raw.transform(Transformers.zillowZori(Seq("10001", "10002")))
      .collect().map(r => r.getAs[String]("zip_code") ->
        (r.getAs[Double]("rent_index"), r.getAs[java.sql.Date]("date").toString)).toMap
    assert(out.keySet == Set("10001", "10002"))
    assert(out("10001") == (3100.0, "2024-02-29"))
    assert(out("10002") == (2500.0, "2024-01-31"))
  }
}
