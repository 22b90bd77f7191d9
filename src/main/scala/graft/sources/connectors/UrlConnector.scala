package graft.sources.connectors

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9 (+S5) — arbitrary-URL file source
  * (src/ingestion/url_fetcher.py:19-69):
  *   - download to a local cache path, SKIPPED when the file already
  *     exists unless `force` (fetcher:39);
  *   - partial downloads cleaned up on failure (fetcher:52-55);
  *   - reader dispatch on extension: .csv → CSV with header, .json →
  *     JSON, anything else tries CSV (fetcher:60-69).
  */
final class UrlConnector(client: HttpClient, cacheDir: String) {

  /** Fetch-to-local with cache (S5's bulk CSV download is this with a
    * rows.csv URL). Returns the local path.
    */
  def fetchToLocal(url: String, filename: Option[String] = None,
                   force: Boolean = false): Path = {
    val name = filename.getOrElse(url.split('/').last)
    val dir = Paths.get(cacheDir)
    Files.createDirectories(dir)
    val target = dir.resolve(name)
    if (!Files.exists(target) || force) {
      try {
        val resp = client.get(url)
        require(resp.isSuccess, s"download failed: HTTP ${resp.status}")
        Files.write(target, resp.bytes) // raw bytes: ZIPs et al. must not round-trip through String
      } catch {
        case e: Throwable =>
          Files.deleteIfExists(target) // no partial files (fetcher:52-55)
          throw e
      }
    }
    target
  }

  /** S4/S11 — extension-dispatched reader. Malformed rows must never
    * kill a 100 TB ingest: PERMISSIVE mode (made explicit, not left to
    * the default) quarantines unparseable JSON lines into
    * `_corrupt_record` so the job completes and the bad rows stay
    * inspectable/countable downstream (the validator's concern, not
    * the scan's).
    */
  def read(spark: SparkSession, path: Path): DataFrame = {
    val p = path.toString
    if (p.endsWith(".csv")) spark.read.option("header", "true").csv(p)
    else if (p.endsWith(".json"))
      spark.read
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(p)
    else spark.read.option("header", "true").csv(p) // try-CSV fallback
  }

  def fetch(spark: SparkSession, url: String, filename: Option[String] = None,
            force: Boolean = false): DataFrame =
    read(spark, fetchToLocal(url, filename, force))
}
