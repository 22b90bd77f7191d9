package graft.sources.connectors

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S1/S2 — the SODA3 (Socrata) API connector
  * (src/ingestion/nyc_open_data_fetcher.py:36-122).
  *
  * Semantics reproduced exactly:
  *   - endpoint `{base}/{datasetId}/query.json`, POSTed
  *     `{"query": soql, "page": {"pageNumber": n, "pageSize": k}}`;
  *   - SoQL pushdown (S2, fetcher:64-77): `SELECT *` plus
  *     `WHERE k = 'v' AND n = 5` — string literals single-quoted,
  *     numeric literals bare;
  *   - page loop from 1, accumulate, stop on empty page or a page
  *     shorter than pageSize (fetcher:107-113);
  *   - both response shapes handled: bare JSON array or `{"data": […]}`.
  *
  * Driver-side by design: the paged API is a serial protocol. The
  * result lands in a DataFrame immediately (all-string schema, like the
  * schemaless SODA JSON) so every downstream transform is distributed;
  * for a parallel-scan source you'd wrap this in a DataSource V2
  * TableProvider with one partition per page range (SURVEY §4).
  */
final class SodaConnector(
    client: HttpClient,
    baseUrl: String = "https://data.cityofnewyork.us/api/v3/views",
    pageSize: Int = 1000) {

  private val mapper = new ObjectMapper()

  /** S2 — SoQL builder (fetcher:64-77). Values quote by runtime
    * type; embedded single quotes are doubled (SoQL escaping). The
    * reference always sends `SELECT *`; `select` narrows the remote
    * projection (SoQL `SELECT a, b`) when the DSv2 scan has pruned
    * columns — the server then never serializes unread fields.
    *
    * Identifiers — both pushed filter keys and projected column names
    * — interpolate into the remote query text, so they are validated
    * against the SoQL field-name grammar ([A-Za-z_][A-Za-z0-9_]*): a
    * schema field carrying SoQL metacharacters (comma, quote, WHERE)
    * must not silently rewrite the remote query. A non-conforming
    * projection falls back to `SELECT *` (over-fetch is safe; the
    * Spark side prunes locally); a non-conforming filter key is
    * refused outright (dropping a filter would change results).
    */
  private def soqlIdent(name: String): Boolean =
    name != null && name.matches("[A-Za-z_][A-Za-z0-9_]*")

  def buildSoql(filters: Map[String, Any],
                select: Seq[String] = Nil): String = {
    val base =
      if (select.nonEmpty && select.forall(soqlIdent))
        "SELECT " + select.mkString(", ")
      else "SELECT *"
    if (filters.isEmpty) base
    else {
      filters.keys.find(!soqlIdent(_)).foreach { k =>
        throw new IllegalArgumentException(
          s"filter key is not a SoQL identifier: '$k'")
      }
      base + " WHERE " + filters.map {
        case (k, v: String) => s"$k = '${v.replace("'", "''")}'"
        // non-string values render bare, so only types whose toString
        // can never carry SoQL metacharacters are allowed — any other
        // Any would interpolate raw text into the remote query
        case (k, v @ (_: Int | _: Long | _: Short | _: Byte |
                      _: Boolean)) => s"$k = $v"
        case (k, v: Double) if !v.isNaN && !v.isInfinite => s"$k = $v"
        case (k, v: Float) if !v.isNaN && !v.isInfinite => s"$k = $v"
        case (k, v: java.math.BigDecimal) => s"$k = ${v.toPlainString}"
        case (k, v) => throw new IllegalArgumentException(
          s"filter value for '$k' has unsupported type " +
            s"${if (v == null) "null" else v.getClass.getName} — only " +
            "String, integral, finite floating, Boolean and BigDecimal " +
            "values render into SoQL")
      }.mkString(" AND ")
    }
  }

  /** S1 — fetch every page of a dataset as schemaless string records. */
  def fetchRows(datasetId: String,
                filters: Map[String, Any] = Map.empty,
                select: Seq[String] = Nil): Seq[Map[String, String]] = {
    val endpoint = s"${baseUrl.stripSuffix("/")}/$datasetId/query.json"
    val soql = buildSoql(filters, select)
    val out = Seq.newBuilder[Map[String, String]]
    var pageNumber = 1
    var done = false
    while (!done) {
      val body =
        s"""{"query":${quote(soql)},"page":{"pageNumber":$pageNumber,"pageSize":$pageSize}}"""
      val resp = client.post(endpoint, body)
      require(resp.isSuccess, s"SODA request failed: HTTP ${resp.status}")
      val records = parseRecords(resp.body)
      out ++= records
      // stop on empty page or short page (fetcher:107-113)
      if (records.isEmpty || records.size < pageSize) done = true
      else pageNumber += 1
    }
    out.result()
  }

  /** Rows → DataFrame with the union of observed keys as an all-string
    * schema (SODA JSON is schemaless; typing happens in transformers,
    * §1.3).
    */
  def toDataFrame(spark: SparkSession, rows: Seq[Map[String, String]]): DataFrame = {
    val cols = rows.foldLeft(Vector.empty[String]) { (acc, r) =>
      acc ++ r.keys.filterNot(acc.contains)
    }
    val schema = StructType(cols.map(c => StructField(c, StringType)))
    val data = rows.map(r => Row.fromSeq(cols.map(c => r.get(c).orNull)))
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
  }

  def fetch(spark: SparkSession, datasetId: String,
            filters: Map[String, Any] = Map.empty): DataFrame =
    toDataFrame(spark, fetchRows(datasetId, filters))

  private def parseRecords(body: String): Seq[Map[String, String]] = {
    val root = mapper.readTree(body)
    val arr: JsonNode =
      if (root.isObject && root.has("data")) root.get("data")
      else if (root.isArray) root
      else mapper.createArrayNode()
    (0 until arr.size()).map { i =>
      val obj = arr.get(i)
      obj.fieldNames().asScala.map { k =>
        val v = obj.get(k)
        k -> (if (v.isNull) null else if (v.isTextual) v.asText() else v.toString)
      }.toMap
    }
  }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
