package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.jobs.{Main => JobsMain}
import graft.sources.connectors.{HttpClient, HttpResponse}

/** The CLI job layer (ingest_data.py / export_static_data.py parity):
  * key dispatch, raw-file ingestion, dry-run, zip-list requirement,
  * unknown-dataset errors, --filter SoQL passthrough.
  */
class JobsCliSpec extends SparkSpecBase {
  import spark.implicits._

  private class RecordingHttp(script: Seq[HttpResponse]) extends HttpClient {
    private val queue = mutable.Queue(script: _*)
    val posts: mutable.Buffer[(String, String)] = mutable.Buffer()
    override def get(url: String, params: Map[String, String]): HttpResponse =
      queue.dequeue()
    override def post(url: String, jsonBody: String): HttpResponse = {
      posts += ((url, jsonBody))
      queue.dequeue()
    }
  }

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

  test("--filter JSON parses to the fetcher's filter map (ingest_data.py:271-277)") {
    val f = JobsMain.parseFilterJson(
      """{"year": 2023, "nta_code": "BK01", "pct": 1.5, "flag": true}""")
    assert(f == Map("year" -> 2023L, "nta_code" -> "BK01", "pct" -> 1.5,
      "flag" -> true))
    // the reference exits on json.loads failure; we reject the same inputs
    intercept[IllegalArgumentException](JobsMain.parseFilterJson("not json"))
    intercept[IllegalArgumentException](JobsMain.parseFilterJson("[1, 2]"))
    intercept[IllegalArgumentException](JobsMain.parseFilterJson("""{"a": {"b": 1}}"""))
  }

  test("ingest-soda pushes --filter down as the recorded SoQL WHERE (S2 passthrough)") {
    val warehouse = Files.createTempDirectory("graft-cli-soda").toString
    val page =
      """[{"Year":"2023","NTA":"BK01","Food Insecure Percentage":"12","Rank":"1",
        |"supply_gap_lbs":"100","unemployment_rate":"5","Vulnerable Population":"3"}]"""
        .stripMargin.replace("\n", "")
    val stub = new RecordingHttp(Seq(HttpResponse(200, page)))
    val r = JobsMain.ingestSoda(spark, "food_supply_gap", warehouse,
      dryRun = true, zips = Nil,
      filters = Map("year" -> 2023L, "nta_code" -> "BK01"), client = stub)
    assert(r.recordCount == 1)
    assert(stub.posts.size == 1, "one short page terminates the page loop")
    val (url, body) = stub.posts.head
    assert(url.endsWith("/4kc9-zrs2/query.json"),
      "dataset id must come from the registry spec")
    // the WHERE travels server-side: numerics bare, strings quoted
    assert(body.contains("SELECT * WHERE"))
    assert(body.contains("year = 2023"))
    assert(body.contains("nta_code = 'BK01'"))
    // filter on a non-socrata dataset is a contract error, not a silent no-op
    intercept[IllegalArgumentException] {
      JobsMain.ingestSoda(spark, "census_acs", warehouse, dryRun = true,
        zips = Nil, filters = Map.empty, client = stub)
    }
  }

  test("curate command lands sharded parquet carrying the normalized text payload") {
    val outDir = Files.createTempDirectory("graft-cli-shards").toString
    val (docs, shards) = JobsMain.curate(spark, sfDir, outDir)

    val expected = SparkEntry.queries("q_doc_curate")(spark, sfDir).count()
    assert(docs == expected, "every curated document must land in a shard")
    assert(shards >= 1)

    val back = spark.read.parquet(outDir)
    assert(back.columns.toSet == Set("doc_id", "split", "n_tokens", "text", "shard_id"))
    // payload is the normalized form: no control chars, no doubled spaces
    val dirty = back.filter(col("text").rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]") ||
      col("text").contains("  ")).count()
    assert(dirty == 0, "shard text must be the normalized payload, not raw bytes")
  }

  test("sql command serves the flat sf-table layout, events ts normalized") {
    // interactive SQL over the benchmark dirs (flat <table>.parquet
    // files, not warehouse subdirectories) — the full catalog must
    // register, and events.ts must arrive timestamp-typed whichever
    // physical shape the testdata generation used
    val names = JobsMain.registerWarehouse(spark, sfDir)
    assert(graft.sources.Tables.names.forall(names.contains),
      s"missing tables: ${graft.sources.Tables.names.diff(names)}")
    val out = JobsMain.sqlOverWarehouse(spark, sfDir,
      "SELECT COUNT(*) AS n, MIN(ts) AS lo FROM events WHERE ts IS NOT NULL")
    assert(out.schema("lo").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(out.head().getLong(0) > 0)
  }
}
