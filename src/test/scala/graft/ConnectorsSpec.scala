package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.collection.mutable

import graft.sources.connectors._

/** S1–S9 connector semantics against scripted HTTP stubs: SoQL
  * quoting, page-loop stop conditions, retry/backoff/429 handling,
  * Census header-row parsing + 50-ZIP chunking, URL caching +
  * extension dispatch, shapefile extract + glob fallback.
  */
class ConnectorsSpec extends SparkSpecBase {

  /** Scripted stub: returns queued responses in order, records calls. */
  private class StubHttp(script: Seq[HttpResponse]) extends HttpClient {
    private val queue = mutable.Queue(script: _*)
    val calls: mutable.Buffer[(String, String)] = mutable.Buffer() // (url|params, body)
    override def get(url: String, params: Map[String, String]): HttpResponse = {
      calls += ((s"$url?${params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")}", ""))
      queue.dequeue()
    }
    override def post(url: String, jsonBody: String): HttpResponse = {
      calls += ((url, jsonBody))
      queue.dequeue()
    }
  }

  private def sodaPage(ids: Range): String =
    ids.map(i => s"""{"nta":"NT$i","year":"2023","val":${i * 10}}""")
      .mkString("[", ",", "]")

  // -------------------------------------------------------------- SODA

  test("S2: SoQL builder quotes strings, leaves numerics bare, escapes quotes") {
    val c = new SodaConnector(new StubHttp(Nil))
    assert(c.buildSoql(Map.empty) == "SELECT *")
    assert(c.buildSoql(Map("year" -> 2023)) == "SELECT * WHERE year = 2023")
    val soql = c.buildSoql(scala.collection.immutable.ListMap(
      "boro" -> "O'Neill", "year" -> 2023))
    assert(soql == "SELECT * WHERE boro = 'O''Neill' AND year = 2023")
  }

  test("S2: identifiers are validated — injection metacharacters can't rewrite the remote query") {
    val c = new SodaConnector(new StubHttp(Nil))
    // clean projection narrows; a metacharacter name falls back to
    // SELECT * (over-fetch is safe, the Spark side prunes locally)
    assert(c.buildSoql(Map.empty, Seq("nta", "val_2")) == "SELECT nta, val_2")
    assert(c.buildSoql(Map.empty, Seq("nta", "a, b WHERE x")) == "SELECT *")
    assert(c.buildSoql(Map.empty, Seq("a'b")) == "SELECT *")
    assert(c.buildSoql(Map.empty, Seq("9lead")) == "SELECT *")
    // a malformed filter KEY is refused (dropping it would change rows)
    intercept[IllegalArgumentException] {
      c.buildSoql(Map("year = 2023 OR 1=1 --" -> 1))
    }
  }

  test("S2: filter VALUES render by whitelist — an arbitrary toString can't reach the remote query") {
    val c = new SodaConnector(new StubHttp(Nil))
    // whitelisted scalar types render bare
    assert(c.buildSoql(Map("a" -> 7L)) == "SELECT * WHERE a = 7")
    assert(c.buildSoql(Map("a" -> true)) == "SELECT * WHERE a = true")
    assert(c.buildSoql(Map("a" -> 1.5)) == "SELECT * WHERE a = 1.5")
    assert(c.buildSoql(Map("a" -> new java.math.BigDecimal("10.25")))
      == "SELECT * WHERE a = 10.25")
    // an Any whose toString carries SoQL metacharacters is refused,
    // not interpolated (the r13 injection surface)
    case class Evil() { override def toString = "1 OR 1=1 --" }
    intercept[IllegalArgumentException] { c.buildSoql(Map("a" -> Evil())) }
    intercept[IllegalArgumentException] { c.buildSoql(Map("a" -> null)) }
    // non-finite doubles have no SoQL literal form — refused too
    intercept[IllegalArgumentException] { c.buildSoql(Map("a" -> Double.NaN)) }
    intercept[IllegalArgumentException] {
      c.buildSoql(Map("a" -> Double.PositiveInfinity))
    }
  }

  test("S1: page loop accumulates full pages and stops on the short page") {
    val stub = new StubHttp(Seq(
      HttpResponse(200, sodaPage(0 until 3)),
      HttpResponse(200, sodaPage(3 until 6)),
      HttpResponse(200, sodaPage(6 until 8)))) // short → stop
    val c = new SodaConnector(stub, baseUrl = "https://x/api/v3/views", pageSize = 3)
    val rows = c.fetchRows("4kc9-zrs2")
    assert(rows.size == 8)
    assert(stub.calls.size == 3)
    assert(stub.calls.head._1 == "https://x/api/v3/views/4kc9-zrs2/query.json")
    assert(stub.calls.head._2.contains(""""pageNumber":1"""))
    assert(stub.calls.head._2.contains(""""pageSize":3"""))
    assert(stub.calls(2)._2.contains(""""pageNumber":3"""))
    assert(rows.head("nta") == "NT0" && rows.last("val") == "70")
  }

  test("S1: empty first page yields empty result after one call; {data:[…]} shape handled") {
    val stub = new StubHttp(Seq(HttpResponse(200, """{"data":[]}""")))
    val c = new SodaConnector(stub, pageSize = 3)
    assert(c.fetchRows("x").isEmpty)
    assert(stub.calls.size == 1)

    val stub2 = new StubHttp(Seq(HttpResponse(200, s"""{"data":${sodaPage(0 until 2)}}""")))
    assert(new SodaConnector(stub2, pageSize = 3).fetchRows("x").size == 2)
  }

  test("S1: exact-page-size boundary fetches one more page") {
    val stub = new StubHttp(Seq(
      HttpResponse(200, sodaPage(0 until 3)),
      HttpResponse(200, "[]")))
    val c = new SodaConnector(stub, pageSize = 3)
    assert(c.fetchRows("x").size == 3)
    assert(stub.calls.size == 2, "a full page cannot prove the end of data")
  }

  test("SODA rows become an all-string DataFrame with the union of keys") {
    val c = new SodaConnector(new StubHttp(Nil))
    val df = c.toDataFrame(spark, Seq(
      Map("a" -> "1", "b" -> "x"), Map("a" -> "2", "c" -> "y")))
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() == 2)
    val r2 = df.collect().find(_.getString(0) == "2").get
    assert(r2.isNullAt(1) && r2.getString(2) == "y")
  }

  // ------------------------------------------------------------- retry

  test("S3: 429 sleeps Retry-After then succeeds; timeouts back off 2^n") {
    val sleeps = mutable.Buffer[Long]()
    val stub = new StubHttp(Seq(
      HttpResponse(429, "", Map("Retry-After" -> "7")),
      HttpResponse(200, "ok")))
    val rc = new RetryingClient(stub, maxRetries = 3, sleeper = sleeps += _)
    assert(rc.get("u").body == "ok")
    assert(sleeps.toSeq == Seq(7L))

    val sleeps2 = mutable.Buffer[Long]()
    val stub2 = new StubHttp(Seq(
      HttpResponse(500, "boom"),
      HttpResponse(503, "boom"),
      HttpResponse(200, "ok")))
    val rc2 = new RetryingClient(stub2, maxRetries = 3, sleeper = sleeps2 += _)
    assert(rc2.get("u").body == "ok")
    assert(sleeps2.toSeq == Seq(1L, 2L), "exponential backoff 2^0, 2^1")
  }

  test("S3: the POST path retries identically (SODA uses POST)") {
    val sleeps = mutable.Buffer[Long]()
    val stub = new StubHttp(Seq(
      HttpResponse(429, "", Map("Retry-After" -> "3")),
      HttpResponse(500, "x"),
      HttpResponse(200, "[]")))
    val rc = new RetryingClient(stub, maxRetries = 3, sleeper = sleeps += _)
    assert(rc.post("u", "{}").body == "[]")
    // the 429 consumed attempt 0 (reference loop semantics), so the
    // transport-error backoff that follows is 2^1
    assert(sleeps.toSeq == Seq(3L, 2L))
  }

  test("S3: persistent failure raises after exactly maxRetries attempts") {
    val sleeps = mutable.Buffer[Long]()
    val stub = new StubHttp(Seq.fill(3)(HttpResponse(500, "down")))
    val rc = new RetryingClient(stub, maxRetries = 3, sleeper = sleeps += _)
    intercept[java.io.IOException] { rc.get("u") }
    assert(stub.calls.size == 3)
    assert(sleeps.toSeq == Seq(1L, 2L), "no sleep after the final attempt")
  }

  // ------------------------------------------------------------ census

  test("S6: header row becomes the schema; values keep positional alignment") {
    val body =
      """[["B19013_001E","B17020_001E","zip code tabulation area"],
        | ["65000","1200","10001"],
        | ["72000","900","10002"]]""".stripMargin
    val stub = new StubHttp(Seq(HttpResponse(200, body)))
    val c = new CensusConnector(stub)
    val df = c.fetch(spark, 2023, "acs/acs5", Seq("B19013_001E", "B17020_001E"),
      "zip code tabulation area", Seq("10001", "10002"))
    assert(df.columns.toSeq ==
      Seq("B19013_001E", "B17020_001E", "zip code tabulation area"))
    assert(df.count() == 2)
    assert(stub.calls.head._1.contains("get=B19013_001E,B17020_001E"))
    assert(stub.calls.head._1.contains("for=zip code tabulation area:10001,10002"))
  }

  test("S7: 120 ZIPs fetch as chunks of 50/50/20 and union in order") {
    val zips = (1 to 120).map(i => f"1$i%04d")
    def chunkBody(c: Seq[String]): String =
      ("[" + Seq(""""h1","zcta"""").map("[" + _ + "]").mkString(",") + "," +
        c.map(z => s"""["v$z","$z"]""").mkString(",") + "]")
    val stub = new StubHttp(Seq(
      HttpResponse(200, chunkBody(zips.slice(0, 50))),
      HttpResponse(200, chunkBody(zips.slice(50, 100))),
      HttpResponse(200, chunkBody(zips.slice(100, 120)))))
    val c = new CensusConnector(stub)
    val (headers, rows) = c.fetchRows(2023, "acs/acs5", Seq("h1"), "zcta", zips)
    assert(stub.calls.size == 3)
    assert(stub.calls(0)._1.contains(s"zcta:${zips.slice(0, 50).mkString(",")}"))
    assert(stub.calls(2)._1.contains(s"zcta:${zips.slice(100, 120).mkString(",")}"))
    assert(headers == Seq("h1", "zcta"))
    assert(rows.size == 120)
    assert(rows.head == Seq("v10001", "10001") && rows.last == Seq("v10120", "10120"))
  }

  test("S6: header-only or empty responses yield no rows (fetcher:128-130)") {
    val stub = new StubHttp(Seq(HttpResponse(200, """[["h1","zcta"]]""")))
    val (h, rows) = new CensusConnector(stub).fetchRows(2023, "d", Seq("h1"), "zcta", Seq("1"))
    assert(h.isEmpty && rows.isEmpty)
  }

  // --------------------------------------------------------------- url

  test("S9/S5: downloads once, serves from cache, force re-downloads") {
    val dir = Files.createTempDirectory("graft-url").toString
    val stub = new StubHttp(Seq(
      HttpResponse(200, "a,b\n1,2\n"),
      HttpResponse(200, "a,b\n9,9\n")))
    val c = new UrlConnector(stub, dir)
    val p1 = c.fetchToLocal("https://files.example/zori.csv")
    val p2 = c.fetchToLocal("https://files.example/zori.csv")
    assert(p1 == p2 && stub.calls.size == 1, "second fetch must hit the cache")
    c.fetchToLocal("https://files.example/zori.csv", force = true)
    assert(stub.calls.size == 2)
  }

  test("S4/S11: extension dispatch — csv with header vs json") {
    val dir = Files.createTempDirectory("graft-url2").toString
    val stub = new StubHttp(Seq(
      HttpResponse(200, "zip,rent\n10001,3000\n"),
      HttpResponse(200, """{"zip":"10001","rent":3000}""" + "\n")))
    val c = new UrlConnector(stub, dir)
    val csv = c.fetch(spark, "https://x/data.csv")
    assert(csv.columns.toSeq == Seq("zip", "rent") && csv.count() == 1)
    val json = c.fetch(spark, "https://x/data.json")
    assert(json.columns.sorted.toSeq == Seq("rent", "zip") && json.count() == 1)
  }

  // --------------------------------------------------------- shapefile

  test("S8: zip extract + named resolve + glob fallback") {
    val dir = Files.createTempDirectory("graft-shp")
    val zipPath = dir.resolve("tl_2020_us_zcta520.zip")
    val zout = new ZipOutputStream(new FileOutputStream(zipPath.toFile))
    zout.putNextEntry(new ZipEntry("weird_name.shp"))
    zout.write("fake-shp-bytes".getBytes)
    zout.closeEntry()
    zout.putNextEntry(new ZipEntry("readme.txt"))
    zout.write("hi".getBytes)
    zout.closeEntry()
    zout.close()

    val c = new ShapefileConnector(new StubHttp(Nil), dir.toString)
    val extracted = c.extract(zipPath)
    assert(Files.exists(extracted.resolve("weird_name.shp")))
    // expected name missing → glob fallback finds the actual .shp
    val shp = c.resolveShp(extracted, "tl_2020_us_zcta520.shp")
    assert(shp.getFileName.toString == "weird_name.shp")
  }

  test("S11: malformed JSON lines quarantine into _corrupt_record, job completes") {
    val dir = Files.createTempDirectory("graft-url3").toString
    val body = Seq(
      """{"zip":"10001","rent":3000}""",
      """{not json at all""",
      """{"zip":"10002","rent":3500}""").mkString("\n") + "\n"
    val stub = new StubHttp(Seq(HttpResponse(200, body)))
    val c = new UrlConnector(stub, dir)
    val df = c.fetch(spark, "https://x/mixed.json")
    // all three lines survive the scan; the bad one is quarantined,
    // never a thrown exception (the 100 TB ingest contract)
    assert(df.count() == 3)
    assert(df.columns.contains("_corrupt_record"), df.columns.mkString(","))
    val bad = df.filter(df("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record").contains("not json"))
    val good = df.filter(df("_corrupt_record").isNull)
    assert(good.select("zip").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("10001", "10002"))
  }
}
