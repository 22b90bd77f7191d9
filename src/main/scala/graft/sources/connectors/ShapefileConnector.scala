package graft.sources.connectors

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S8 — shapefile source (src/ingestion/shapefile_fetcher.py:30-89).
  *
  * The fetch/extract/resolve plumbing is real and tested:
  *   - download the TIGER zip to a cache path (skip when cached,
  *     fetcher:50-61);
  *   - extract the archive (fetcher:64-66);
  *   - resolve the named .shp, with a glob fallback to any .shp when
  *     the expected name is missing (fetcher:76-83).
  *
  * The binary .shp/.dbf DECODE step — delegated by the reference to
  * geopandas/GDAL (fetcher:86-88) — is native here: [[read]] parses
  * the public ESRI format via [[ShapefileReader]] into the same
  * (attrs…, geometry WKT) frame, so the whole chain runs end-to-end
  * from raw zip bytes. [[readConverted]] remains for tables already
  * materialized as parquet.
  */
final class ShapefileConnector(client: HttpClient, cacheDir: String) {

  private val url = new UrlConnector(client, cacheDir)

  /** Download + cache the zip (fetcher:50-61). */
  def download(zipUrl: String, filename: Option[String] = None,
               force: Boolean = false): Path =
    url.fetchToLocal(zipUrl, filename, force)

  /** Extract every entry of the archive into a sibling directory
    * (fetcher:64-66). Zip-slip-guarded.
    */
  def extract(zipPath: Path): Path = {
    val destDir = zipPath.resolveSibling(
      zipPath.getFileName.toString.stripSuffix(".zip"))
    Files.createDirectories(destDir)
    val zin = new ZipInputStream(Files.newInputStream(zipPath))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        val target = destDir.resolve(entry.getName).normalize()
        require(target.startsWith(destDir), s"zip entry escapes dir: ${entry.getName}")
        if (entry.isDirectory) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          val out = new BufferedOutputStream(new FileOutputStream(target.toFile))
          try zin.transferTo(out) finally out.close()
        }
        zin.closeEntry()
        entry = zin.getNextEntry
      }
    } finally zin.close()
    destDir
  }

  /** Resolve the .shp to read: the expected name if present, else glob
    * any *.shp in the extracted tree (fetcher:76-83).
    */
  def resolveShp(extractedDir: Path, expectedName: String): Path = {
    val expected = extractedDir.resolve(expectedName)
    if (Files.exists(expected)) expected
    else {
      val s = Files.walk(extractedDir)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".shp"))
        .nextOption()
        .getOrElse(throw new java.io.FileNotFoundException(
          s"no .shp under $extractedDir"))
      finally s.close()
    }
  }

  /** Decode the .shp (+ sibling .dbf) natively → (attrs…, geometry WKT)
    * DataFrame (reference: geopandas.read_file, fetcher:86-88).
    */
  def read(spark: SparkSession, shpPath: Path): DataFrame =
    ShapefileReader.read(spark, shpPath)

  /** Full raw-bytes pipeline: download zip → extract → resolve .shp →
    * binary decode (fetcher:30-89 end-to-end).
    */
  def fetch(spark: SparkSession, zipUrl: String, expectedShpName: String,
            filename: Option[String] = None, force: Boolean = false): DataFrame = {
    val zip = download(zipUrl, filename, force)
    val dir = extract(zip)
    read(spark, resolveShp(dir, expectedShpName))
  }

  /** Read a shapefile table already materialized as parquet
    * (attrs…, geometry WKT) by an earlier conversion.
    */
  def readConverted(spark: SparkSession, convertedPath: String): DataFrame =
    spark.read.parquet(convertedPath)
}
