package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.sources.connectors.{HttpClient, HttpResponse}
import graft.sources.soda.SodaHttp

/** The DSv2 SODA source: format registration, schema enforcement,
  * Catalyst-driven SoQL filter pushdown (equality pushed, residual
  * kept), column pruning, and pagination through the scan.
  */
class SodaSourceSpec extends SparkSpecBase {

  /** Records every SoQL query POSTed; pages from a fixed row set,
    * honoring the pushed-down equality filters like the real API would.
    */
  private class FakeSodaApi(rows: Seq[Map[String, String]], pageSize: Int)
      extends HttpClient {
    val queries: mutable.Buffer[String] = mutable.Buffer()
    override def get(url: String, params: Map[String, String]) =
      throw new UnsupportedOperationException
    override def post(url: String, jsonBody: String): HttpResponse = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val req = mapper.readTree(jsonBody)
      val soql = req.get("query").asText()
      queries.synchronized { queries += soql }
      val page = req.get("page").get("pageNumber").asInt()
      val matching = applyWhere(soql, rows).map(project(soql, _))
      val slice = matching.slice((page - 1) * pageSize, page * pageSize)
      val body = slice.map(r =>
        r.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}"))
        .mkString("[", ",", "]")
      HttpResponse(200, body)
    }
    private val Soql = """SELECT ([^ ].*?)(?: WHERE (.*))?""".r
    private def applyWhere(soql: String, all: Seq[Map[String, String]]) =
      soql match {
        case Soql(_, clause) if clause != null =>
          val preds = clause.split(" AND ").map { p =>
            val Array(k, v) = p.split(" = ", 2)
            k.trim -> v.trim.stripPrefix("'").stripSuffix("'")
          }
          all.filter(r => preds.forall { case (k, v) => r.get(k).contains(v) })
        case _ => all
      }
    // a real SODA server only serializes the SELECTed fields
    private def project(soql: String, row: Map[String, String]) =
      soql match {
        case Soql(cols, _) if cols.trim != "*" =>
          val keep = cols.split(",").map(_.trim).toSet
          row.view.filterKeys(keep).toMap
        case _ => row
      }
  }

  private val fixtureRows = (0 until 25).map(i => Map(
    "nta" -> s"NT$i", "year" -> (if (i % 2 == 0) "2023" else "2022"),
    "val" -> i.toString))

  private def withApi[T](pageSize: Int = 5)(body: FakeSodaApi => T): T = {
    val api = new FakeSodaApi(fixtureRows, pageSize)
    val prev = SodaHttp.client
    SodaHttp.client = api
    try body(api) finally SodaHttp.client = prev
  }

  private def readSoda(pageSize: Int = 5) =
    spark.read.format("soda")
      .schema("nta string, year string, val string")
      .option("datasetId", "4kc9-zrs2")
      .option("pageSize", pageSize.toString)
      .load()

  test("format(\"soda\") resolves via DataSourceRegister and pages through all rows") {
    withApi() { api =>
      val df = readSoda()
      assert(df.collect().length == 25)
      // 25 rows at pageSize 5 → pages 1..5 full, page 6 returns empty
      assert(api.queries.size == 6)
      assert(api.queries.forall(_ == "SELECT *"))
    }
  }

  test("a pure COUNT prunes to one narrow remote column (row multiplicity preserved)") {
    withApi() { api =>
      assert(readSoda().count() == 25)
      assert(api.queries.forall(_ == "SELECT nta"),
        s"SoQL seen: ${api.queries.distinct}")
    }
  }

  test("equality filters push down into the SoQL WHERE; others stay residual") {
    withApi() { api =>
      val df = readSoda().filter(col("year") === "2023").filter(col("val") > "3")
      val out = df.collect()
      assert(api.queries.nonEmpty)
      assert(api.queries.forall(_.startsWith("SELECT * WHERE year = '2023'")),
        s"SoQL seen: ${api.queries.distinct}")
      assert(!api.queries.exists(_.contains("val")),
        "non-equality predicate must NOT push down")
      // residual filter still applied by Spark (string comparison)
      assert(out.forall(r => r.getAs[String]("year") == "2023" &&
        r.getAs[String]("val") > "3"))
      // plan shows the pushed filter
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("year"), plan)
    }
  }

  test("column pruning reaches the SERVER as SoQL SELECT (SupportsPushDownRequiredColumns)") {
    withApi() { api =>
      val df = readSoda().select("nta")
      assert(df.columns.toSeq == Seq("nta"))
      assert(df.distinct().count() == 25)
      assert(api.queries.nonEmpty)
      assert(api.queries.forall(_ == "SELECT nta"),
        s"pruned projection must narrow the remote query: ${api.queries.distinct}")
    }
  }

  test("pruning composes with filter pushdown: SELECT col WHERE k = 'v'") {
    withApi() { api =>
      val out = readSoda().filter(col("year") === "2023").select("nta").collect()
      assert(out.length == 13) // even i in 0 until 25
      assert(api.queries.forall(q =>
        q.startsWith("SELECT nta, year WHERE year = '2023'") ||
          q.startsWith("SELECT year, nta WHERE year = '2023'")),
        s"SoQL seen: ${api.queries.distinct}")
    }
  }

  test("missing fields in a page surface as NULLs under the user schema") {
    val sparse = Seq(Map("nta" -> "A"), Map("nta" -> "B", "year" -> "2023"))
    val api = new FakeSodaApi(sparse, 10)
    val prev = SodaHttp.client
    SodaHttp.client = api
    try {
      val rows = readSoda(10).collect()
      assert(rows.length == 2)
      val a = rows.find(_.getString(0) == "A").get
      assert(a.isNullAt(1) && a.isNullAt(2))
    } finally SodaHttp.client = prev
  }

  test("schema is mandatory and must be all-string") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("soda").option("datasetId", "x").load()
    }
    assert(e.getMessage.contains("schemaless"))
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("soda").schema("a int")
        .option("datasetId", "x").load().collect()
    }
    assert(e2.getMessage.contains("all-string"))
  }
}
