package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8

/** Pin-cycle serving smoke, stage 1 (round-10 verdict #6; driven by
  * `tools/serve_smoke.sh`): build the REAL ingest-chain warehouse
  * (NycWarehouseFixture — IngestJob over raw-shaped fixtures for all
  * five datasets) plus the ExportJob batch export. The shell script
  * then boots the actual `graft.jobs.Main serve` CLI — not an
  * in-process ApiServer like the unit spec — and byte-compares every
  * HTTP endpoint body (identity and gzip) against the export files,
  * so drift in the CLI wiring or the memoized body cache shows up in
  * the end-of-session cycle, not just under ScalaTest.
  */
object ServeSmokeGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_serve_smoke")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = NycWarehouseFixture.build(spark)
    val counts = graft.jobs.ExportJob.run(spark, wh, s"$out/export")
    Files.createDirectories(Paths.get(out))
    // handshake file: the script reads the warehouse path from here
    // (the fixture owns its temp dir; reusing it keeps ingest
    // single-sourced instead of duplicating the chain in the script)
    Files.write(Paths.get(s"$out/warehouse_dir"), wh.getBytes(UTF_8))
    println(s"[serve-smoke] warehouse=$wh features=$counts")
    spark.stop()
  }
}
