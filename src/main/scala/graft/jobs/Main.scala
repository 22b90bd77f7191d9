package graft.jobs

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Sessions, SparkEntry}
import graft.catalog.Registry
import graft.queries.PipelineQ
import graft.sink.ShardSink
import graft.sources.Tables
import graft.transform.Transformers

/** CLI entry points mirroring the reference's two scripts
  * (scripts/ingest_data.py --dataset <key> [--dry-run];
  * scripts/export_static_data.py):
  *
  * {{{
  * runMain graft.jobs.Main ingest <key> <rawParquet> <warehouseDir> [--dry-run] [--zips <file>]
  * runMain graft.jobs.Main ingest-all <rawDir> <warehouseDir> [--zips <file>]
  * runMain graft.jobs.Main export <warehouseDir> <outDir>
  * runMain graft.jobs.Main curate <sfDir> <shardOutDir>
  * }}}
  *
  * The reference's reflection-loaded transformer classes
  * (parser.py:29-46) become this explicit key→chain map. ZIP membership
  * lists (src/constants.py NYC_ZIP_CODES) arrive via `--zips <file>`
  * (one ZIP per line) rather than a baked-in constant.
  *
  * `ingest-all` loops every enabled dataset with per-dataset failure
  * isolation (ingest_data.py:180-210): one dataset's error doesn't
  * stop the others.
  */
object Main {

  /** key → transformer chain (needs the session-independent params). */
  def transformerFor(key: String, zips: Seq[String]): DataFrame => DataFrame =
    key match {
      case "food_supply_gap" =>
        // SODA arrival order drives keep-last: stamp ingest order at read
        df => Transformers.foodSupplyGap(Seq(col("__ingest_order")))(
          df.withColumn("__ingest_order", monotonically_increasing_id()))
            .drop("__ingest_order")
      case "census_acs" => Transformers.censusAcs()
      case "ntas_2020" => Transformers.ntas2020
      case "census_zctas_2020" =>
        require(zips.nonEmpty, s"$key needs --zips <file> (NYC ZIP membership list)")
        Transformers.censusZctas2020(zips)
      case "zillow_zori" =>
        require(zips.nonEmpty, s"$key needs --zips <file>")
        Transformers.zillowZori(zips)
      case other =>
        throw new IllegalArgumentException(
          s"unknown dataset '$other' (known: ${Registry.all.keys.mkString(", ")})")
    }

  def ingest(spark: SparkSession, key: String, rawPath: String,
             warehouse: String, dryRun: Boolean, zips: Seq[String]): IngestJob.Result = {
    val spec = Registry.all.getOrElse(key,
      throw new IllegalArgumentException(s"unknown dataset '$key'"))
    val raw = spark.read.option("header", "true")
      .format(if (rawPath.endsWith(".csv")) "csv" else "parquet")
      .load(rawPath)
    IngestJob.run(spark, spec, raw, transformerFor(key, zips), warehouse, dryRun)
  }

  /** End-to-end curation deliverable: run the oracle-gated
    * normalize→quality→dedup→pack pipeline (q_doc_curate) over
    * `sfDir/documents.parquet`, re-attach the NORMALIZED text payload
    * (what a training loader should see, not the raw bytes), and
    * materialize one parquet file per token-budget shard. Returns
    * (documents written, shard count), both read back from the output
    * so the numbers certify the files on disk, not the plan.
    */
  def curate(spark: SparkSession, sfDir: String, outDir: String): (Long, Long) = {
    val packed = SparkEntry.queries("q_doc_curate")(spark, sfDir)
    val text = Tables.documents(spark, sfDir)
      .select(col("doc_id"), PipelineQ.normText(col("text")).as("text"))
    val curated = packed.join(text, "doc_id")
    ShardSink.writeShards(curated, outDir)
    // the loader-side bookkeeping, computed from the READ-BACK of the
    // written tree: the fingerprint certifies the files on disk, not a
    // recomputation of the (uncached) pipeline (ShardSinkSpec)
    val back = spark.read.parquet(outDir)
    ShardSink.writeManifest(back, outDir)
    val r = back.agg(count(lit(1)), countDistinct(col("shard_id"))).head
    (r.getLong(0), r.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    var dryRun = false
    var zips: Seq[String] = Nil
    val positional = List.newBuilder[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--dry-run" => dryRun = true; i += 1
        case "--zips" =>
          zips = Files.readAllLines(Paths.get(args(i + 1))).asScala.toSeq
            .map(_.trim).filter(_.nonEmpty)
          i += 2
        case a => positional += a; i += 1
      }
    }

    val spark = Sessions.local()
    try positional.result() match {
      case "ingest" :: key :: rawPath :: warehouse :: Nil =>
        val r = ingest(spark, key, rawPath, warehouse, dryRun, zips)
        println(s"[ingest] ${r.datasetKey}: ${r.recordCount} rows -> ${r.tableDir} " +
          s"(validation ok=${r.report.ok})")
      case "ingest-all" :: rawDir :: warehouse :: Nil =>
        Registry.all.keys.toSeq.sorted.foreach { key =>
          try {
            val r = ingest(spark, key, s"$rawDir/$key.parquet", warehouse, dryRun, zips)
            println(s"[ingest] $key: ${r.recordCount} rows")
          } catch {
            case e: Exception =>
              // per-dataset isolation (ingest_data.py:180-210)
              System.err.println(s"[ingest] $key FAILED: ${e.getMessage}")
          }
        }
      case "export" :: warehouse :: outDir :: Nil =>
        val counts = ExportJob.run(spark, warehouse, outDir)
        counts.toSeq.sortBy(_._1).foreach { case (f, n) =>
          println(s"[export] $f: $n features")
        }
      case "curate" :: sfDir :: outDir :: Nil =>
        val (docs, shards) = curate(spark, sfDir, outDir)
        println(s"[curate] $docs documents -> $shards shards in $outDir")
      case other =>
        System.err.println(
          s"""usage: ingest <key> <rawPath> <warehouseDir> [--dry-run] [--zips <file>]
             |       ingest-all <rawDir> <warehouseDir> [--zips <file>]
             |       export <warehouseDir> <outDir>
             |       curate <sfDir> <shardOutDir>
             |got: ${other.mkString(" ")}""".stripMargin)
        sys.exit(2)
    } finally spark.stop()
  }
}
