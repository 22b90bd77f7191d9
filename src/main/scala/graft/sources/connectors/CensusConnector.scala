package graft.sources.connectors

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S6/S7 — the US Census API connector
  * (src/ingestion/census_fetcher.py:32-139).
  *
  * Semantics reproduced exactly:
  *   - GET `https://api.census.gov/data/{year}/{dataset}` with
  *     `get=<comma-joined variables>` and
  *     `for=zip code tabulation area:<comma-joined ZIPs>`;
  *   - the response is a JSON array-of-arrays whose ROW 0 IS THE
  *     HEADER (fetcher:135-139) — parsed into column names;
  *   - ZIP lists fetch in chunks of 50 (URL length limit,
  *     fetcher:90) and concatenate (S7 union).
  */
final class CensusConnector(
    client: HttpClient,
    baseUrl: String = "https://api.census.gov/data") {

  val chunkSize = 50

  private val mapper = new ObjectMapper()

  /** One chunk: (headers, rows). Empty responses (fewer than 2 rows —
    * header only or nothing) yield no rows (fetcher:128-130).
    */
  def fetchChunk(year: Int, dataset: String, variables: Seq[String],
                 geography: String, zips: Seq[String]): (Seq[String], Seq[Seq[String]]) = {
    val url = s"$baseUrl/$year/$dataset"
    val params = Map(
      "get" -> variables.mkString(","),
      "for" -> s"$geography:${zips.mkString(",")}")
    val resp = client.get(url, params)
    require(resp.isSuccess, s"Census request failed: HTTP ${resp.status}")
    val root = mapper.readTree(resp.body)
    if (!root.isArray || root.size() < 2) (Nil, Nil)
    else {
      val headers = (0 until root.get(0).size()).map(j => root.get(0).get(j).asText())
      val rows = (1 until root.size()).map { i =>
        val r = root.get(i)
        (0 until r.size()).map(j =>
          if (r.get(j).isNull) null else r.get(j).asText()): Seq[String]
      }
      (headers, rows)
    }
  }

  /** S7 — chunked fetch + union: ZIPs split into 50s, each chunk
    * fetched, results concatenated under the first chunk's header.
    */
  def fetchRows(year: Int, dataset: String, variables: Seq[String],
                geography: String, zips: Seq[String]): (Seq[String], Seq[Seq[String]]) = {
    val chunks = zips.grouped(chunkSize).toSeq
      .map(c => fetchChunk(year, dataset, variables, geography, c))
      .filter(_._1.nonEmpty)
    if (chunks.isEmpty) (Nil, Nil)
    else (chunks.head._1, chunks.flatMap(_._2))
  }

  def fetch(spark: SparkSession, year: Int, dataset: String,
            variables: Seq[String], geography: String,
            zips: Seq[String]): DataFrame = {
    val (headers, rows) = fetchRows(year, dataset, variables, geography, zips)
    val schema = StructType(headers.map(h => StructField(h, StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq)), schema)
  }
}
