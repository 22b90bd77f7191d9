package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sink.Compactor

/** Compaction contract: file count drops to the measured-bytes /
  * target ratio, row content is untouched, and the swap leaves no
  * temp/old residue next to the table.
  */
class CompactorSpec extends SparkSpecBase {

  private def dropClean(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    graft.sink.BandIndex.clearOrphanedLocation(spark, t)
  }

  /** Executed plan of a cid=3 point read with auto-bucketed-scan
    * pinned on (a bare filter otherwise lets the planner disable the
    * bucketed scan and hide SelectedBucketsCount).
    */
  private def prunedPlan(t: String): String = {
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try spark.table(t).filter(col("cid") === 3)
      .queryExecution.executedPlan.toString
    finally spark.conf.set(key, prev)
  }

  test("fragmented table compacts to measured-size file count, rows intact") {
    val dir = Files.createTempDirectory("compact").resolve("t").toString
    // 64 tiny files
    spark.range(10000).select(col("id"), (col("id") * 2).as("v"))
      .repartition(64).write.parquet(dir)
    val beforeSum = spark.read.parquet(dir).agg(sum("v")).head.getLong(0)

    val (before, after) = Compactor.compact(spark, dir)
    assert(before == 64, s"fixture should fragment into 64 files, had $before")
    assert(after == 1, s"tiny table must compact to 1 file, got $after")

    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.agg(sum("v")).head.getLong(0) == beforeSum)

    // no .tmp-/.old- residue
    val siblings = Files.list(java.nio.file.Paths.get(dir).getParent)
      .toArray.map(_.toString)
    assert(siblings.forall(s => !s.contains(".tmp-") && !s.contains(".old-")),
      siblings.mkString(", "))
  }

  test("target size drives the output file count") {
    val dir = Files.createTempDirectory("compact2").resolve("t").toString
    spark.range(100000).select(col("id"), md5(col("id").cast("string")).as("pad"))
      .repartition(40).write.parquet(dir)
    val bytes = Files.walk(java.nio.file.Paths.get(dir)).iterator()
    var total = 0L
    bytes.forEachRemaining { p =>
      if (p.toString.endsWith(".parquet")) total += Files.size(p)
    }
    // pick a target that should produce ~4 files from the measured bytes
    val target = total / 4
    val (_, after) = Compactor.compact(spark, dir, targetBytes = target)
    assert(after >= 4 && after <= 5, s"expected ~4 files for bytes/target=4, got $after")
    assert(spark.read.parquet(dir).count() == 100000)
  }

  test("a bucketed catalog table's location is REFUSED — raw rewrite would scramble bucket pruning") {
    dropClean("compact_bucketed_guard")
    spark.range(1000)
      .select((col("id") % 8).cast("int").as("cid"), col("id").as("vec_id"))
      .write.bucketBy(8, "cid").sortBy("cid")
      .saveAsTable("compact_bucketed_guard")
    val loc = java.nio.file.Paths.get(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("compact_bucketed_guard"))
        .location)
    val ex = intercept[IllegalArgumentException] {
      Compactor.compact(spark, loc.toString)
    }
    assert(ex.getMessage.contains("BUCKETED"), ex.getMessage)
    // the table is untouched: still bucket-prunes and reads all rows
    // (a bare filter lets the planner disable the bucketed scan, so
    // pin auto-bucketed-scan on for the probe)
    assert(prunedPlan("compact_bucketed_guard")
      .contains("SelectedBucketsCount: 1 out of 8"))
    assert(spark.table("compact_bucketed_guard").count() == 1000)

    // a SYMLINKED spelling of the same location must also be refused
    // (the catalog records one spelling, the caller may hold another)
    val linkParent = Files.createTempDirectory("compact_guard_link")
    val link = linkParent.resolve("via_link")
    try {
      Files.createSymbolicLink(link, loc)
      val exLink = intercept[IllegalArgumentException] {
        Compactor.compact(spark, link.toString)
      }
      assert(exLink.getMessage.contains("BUCKETED"), exLink.getMessage)
    } finally {
      Files.deleteIfExists(link)
      Files.deleteIfExists(linkParent)
    }

    // ...and so must a SUBDIRECTORY inside the bucketed location
    // (compacting a slice scrambles that bucket subset just the same)
    val sub = loc.resolve("nested_leaf")
    Files.createDirectories(sub)
    try {
      val exSub = intercept[IllegalArgumentException] {
        Compactor.compact(spark, sub.toString)
      }
      assert(exSub.getMessage.contains("BUCKETED"), exSub.getMessage)
    } finally Files.deleteIfExists(sub)
  }

  test("compactBucketed rebuilds through the table's own bucket spec — pruning intact, rows intact") {
    dropClean("compact_bucketed_ok")
    val df = spark.range(2000)
      .select((col("id") % 8).cast("int").as("cid"), col("id").as("vec_id"))
    // three appends = three file sets per bucket
    df.filter(col("vec_id") < 700).write.mode("overwrite")
      .bucketBy(8, "cid").sortBy("cid").saveAsTable("compact_bucketed_ok")
    df.filter(col("vec_id") >= 700 && col("vec_id") < 1400).write.mode("append")
      .bucketBy(8, "cid").sortBy("cid").saveAsTable("compact_bucketed_ok")
    df.filter(col("vec_id") >= 1400).write.mode("append")
      .bucketBy(8, "cid").sortBy("cid").saveAsTable("compact_bucketed_ok")
    val beforeRows = spark.table("compact_bucketed_ok").orderBy("vec_id")
      .collect().toSeq
    val (before, after) = Compactor.compactBucketed(spark, "compact_bucketed_ok")
    assert(before > 8, s"three appends must fragment past one file set, had $before")
    assert(after <= 8 && after < before,
      s"rebuild must land at most one file per bucket, got $after")
    assert(spark.table("compact_bucketed_ok").orderBy("vec_id")
      .collect().toSeq == beforeRows, "row content must be untouched")
    assert(prunedPlan("compact_bucketed_ok")
      .contains("SelectedBucketsCount: 1 out of 8"),
      "the rebuilt table must still bucket-prune")
    // no staging residue
    assert(!spark.catalog.tableExists("compact_bucketed_ok_compacting"))
  }

  test("recoverBucketed: staging with base ABSENT renames back; with base PRESENT drops staging") {
    dropClean("compact_recover_b")
    dropClean("compact_recover_b_compacting")
    val df = spark.range(100)
      .select((col("id") % 4).cast("int").as("cid"), col("id").as("vec_id"))
    // crash between DROP and RENAME: only the staging table exists
    df.write.bucketBy(4, "cid").saveAsTable("compact_recover_b_compacting")
    Compactor.recoverBucketed(spark, "compact_recover_b")
    assert(spark.catalog.tableExists("compact_recover_b"))
    assert(!spark.catalog.tableExists("compact_recover_b_compacting"))
    assert(spark.table("compact_recover_b").count() == 100)
    // crash before DROP: staging is superseded residue next to the live table
    df.limit(10).write.bucketBy(4, "cid")
      .saveAsTable("compact_recover_b_compacting")
    Compactor.recoverBucketed(spark, "compact_recover_b")
    assert(!spark.catalog.tableExists("compact_recover_b_compacting"))
    assert(spark.table("compact_recover_b").count() == 100,
      "the live table must stay canonical")
  }

  test("recover restores a table stranded mid-swap and clears residue") {
    val base = Files.createTempDirectory("compact3")
    val dir = base.resolve("t")
    spark.range(100).write.parquet(dir.toString)
    // simulate a crash between the two moves: live path gone, table
    // intact under .old-*; plus a stale .tmp-* from an earlier attempt
    Files.move(dir, base.resolve("t.old-deadbeef"))
    val tmp = base.resolve("t.tmp-cafe")
    Files.createDirectory(tmp)
    Files.write(tmp.resolve("junk"), Array[Byte](1, 2, 3))

    Compactor.recover(dir)
    assert(Files.exists(dir), "recover must restore the live path")
    assert(!Files.exists(base.resolve("t.old-deadbeef")))
    assert(!Files.exists(tmp))
    assert(spark.read.parquet(dir.toString).count() == 100)

    // compact() itself recovers first, so a stranded table is usable
    // with no separate manual step
    Files.move(dir, base.resolve("t.old-feed"))
    val (_, after) = Compactor.compact(spark, dir.toString)
    assert(after == 1)
    assert(spark.read.parquet(dir.toString).count() == 100)
  }

  test("partitioned layout compacts per leaf: directories, column, and type survive") {
    val base = Files.createTempDirectory("compact4")
    val dir = base.resolve("t").toString
    // ShardSink-style layout: shard_id=N/ leaves, fragmented files inside
    spark.range(2000)
      .select(col("id"), (col("id") % 4).as("shard_id"))
      .repartition(16)
      .write.partitionBy("shard_id").parquet(dir)
    val beforeSchema = spark.read.parquet(dir).schema
    val (before, after) = Compactor.compact(spark, dir)
    assert(before > after, s"$before -> $after")
    // the shard_id=N directories still exist (one compacted file each)
    val leaves = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).filter(_.contains("shard_id="))
    assert(leaves.length == 4, leaves.mkString(", "))
    // rows, partition column, and its inferred type are unchanged
    val back = spark.read.parquet(dir)
    assert(back.count() == 2000)
    assert(back.schema == beforeSchema,
      s"schema drifted: $beforeSchema -> ${back.schema}")
    assert(back.groupBy("shard_id").count().count() == 4)
  }
}
