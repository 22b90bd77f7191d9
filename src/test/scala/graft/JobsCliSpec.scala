package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.jobs.{Main => JobsMain}

/** The CLI job layer (ingest_data.py / export_static_data.py parity):
  * key dispatch, raw-file ingestion, dry-run, zip-list requirement,
  * unknown-dataset errors.
  */
class JobsCliSpec extends SparkSpecBase {
  import spark.implicits._

  test("ingest dispatches by key and lands the transformed table") {
    val rawDir = Files.createTempDirectory("graft-cli-raw")
    val warehouse = Files.createTempDirectory("graft-cli-wh").toString
    val rawPath = s"$rawDir/census_acs.parquet"
    Seq(("10001", "65000", "120", "1000"), ("10002", "-666666666", "5", "0"))
      .toDF("zip code tabulation area", "B19013_001E", "B17020_002E", "B17020_001E")
      .write.parquet(rawPath)

    val r = JobsMain.ingest(spark, "census_acs", rawPath, warehouse,
      dryRun = false, zips = Nil)
    assert(r.recordCount == 2 && r.report.ok)
    val out = spark.read.parquet(s"$warehouse/census_acs_income_poverty")
    assert(out.count() == 2)
    val z2 = out.filter(col("zip_code") === "10002").head
    assert(z2.isNullAt(z2.fieldIndex("median_household_income")),
      "sentinel must be nulled by the real chain")
  }

  test("dry-run ingests nothing; zctas without --zips fails loudly; unknown key rejected") {
    val rawDir = Files.createTempDirectory("graft-cli-raw2")
    val warehouse = Files.createTempDirectory("graft-cli-wh2").toString
    val rawPath = s"$rawDir/census_acs.parquet"
    Seq(("10001", "1", "1", "1"))
      .toDF("zip code tabulation area", "B19013_001E", "B17020_002E", "B17020_001E")
      .write.parquet(rawPath)
    JobsMain.ingest(spark, "census_acs", rawPath, warehouse, dryRun = true, zips = Nil)
    assert(!Files.exists(java.nio.file.Paths.get(s"$warehouse/census_acs_income_poverty")))

    intercept[IllegalArgumentException] {
      JobsMain.transformerFor("census_zctas_2020", Nil)
    }
    intercept[IllegalArgumentException] {
      JobsMain.transformerFor("not_a_dataset", Nil)
    }
  }

  test("food chain via CLI stamps ingest order so keep-last is arrival order") {
    val rawDir = Files.createTempDirectory("graft-cli-raw3")
    val warehouse = Files.createTempDirectory("graft-cli-wh3").toString
    val rawPath = s"$rawDir/food.parquet"
    // same (year, nta) twice: the LATER row must win
    Seq(
      ("2023", "BK01", "10", "1"),
      ("2023", "BK01", "99", "2"))
      .toDF("Year", "NTA", "Food Insecure Percentage", "Rank")
      .repartition(1) // single file → file order IS arrival order
      .write.parquet(rawPath)
    JobsMain.ingest(spark, "food_supply_gap", rawPath, warehouse,
      dryRun = false, zips = Nil)
    val out = spark.read.parquet(s"$warehouse/food_supply_gaps")
    assert(out.count() == 1)
    assert(out.head.getAs[Double]("food_insecure_pct") == 99.0,
      "keep-last must retain the later arrival")
  }

  test("curate command lands sharded parquet carrying the normalized text payload") {
    val outDir = Files.createTempDirectory("graft-cli-shards").toString
    val (docs, shards) = JobsMain.curate(spark, sfDir, outDir)

    val expected = SparkEntry.queries("q_doc_curate")(spark, sfDir).count()
    assert(docs == expected, "every curated document must land in a shard")
    assert(shards >= 1)

    val back = spark.read.parquet(outDir)
    assert(back.columns.toSet == Set("doc_id", "n_tokens", "text", "shard_id"))
    // payload is the normalized form: no control chars, no doubled spaces
    val dirty = back.filter(col("text").rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]") ||
      col("text").contains("  ")).count()
    assert(dirty == 0, "shard text must be the normalized payload, not raw bytes")
  }
}
