package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sink.ShardSink

/** Shard layout contract: Hive-partitioned by split then shard_id
  * (the shard key is (split, shard_id) — shard sequences restart per
  * split), exactly one parquet file per shard (no identical shard
  * split across range boundaries), lossless read-back, deterministic
  * intra-shard order.
  */
class ShardSinkSpec extends SparkSpecBase {

  /** All leaf `shard_id=N` directories, at any nesting depth. */
  private def shardDirs(dir: String): Array[String] = {
    val s = Files.walk(Paths.get(dir))
    try s.toArray.map(_.toString)
      .filter(p => Files.isDirectory(Paths.get(p)) &&
        p.split('/').last.startsWith("shard_id="))
    finally s.close()
  }

  test("writeShards: one file per shard dir, lossless, doc_id-ordered within shards") {
    val curated = SparkEntry.queries("q_doc_curate")(spark, sfDir)
    val dir = Files.createTempDirectory("shards").toString
    ShardSink.writeShards(curated, dir)

    val dirs = shardDirs(dir)
    assert(dirs.nonEmpty)
    // curate output carries a split column → nested layout
    assert(dirs.forall(_.contains("split=")), s"expected split=*/shard_id=* layout: ${dirs.take(3).toSeq}")
    dirs.foreach { d =>
      val parts = Files.list(Paths.get(d)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      assert(parts.length == 1,
        s"$d has ${parts.length} files — a shard must be one loader unit")
    }

    val back = spark.read.parquet(dir)
    assert(back.count() == curated.count())
    // per-shard files hold rows in doc_id order (resumable-epoch contract)
    dirs.foreach { d =>
      val ids = spark.read.parquet(d).select("doc_id")
        .collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"$d rows not in doc_id order")
    }
    // shard assignment round-trips exactly
    val mismatch = back.select(col("doc_id"), col("split").cast("string"),
        col("shard_id").cast("long"))
      .except(curated.select(col("doc_id"), col("split"), col("shard_id")))
      .count()
    assert(mismatch == 0)
  }

  test("manifest certifies the files on disk: counts, bounds, and content hash") {
    val dir = Files.createTempDirectory("shards_m").toString
    // the real CLI path: writes shards WITH the normalized text payload
    // and computes the manifest from the read-back of the written tree
    graft.jobs.Main.curate(spark, sfDir, dir)
    val back = spark.read.parquet(dir)

    // manifest rows key on (split, shard_id)
    val manifest = spark.read.parquet(s"$dir/_manifest")
      .collect().map(r => (r.getString(0), r.get(1).toString.toLong) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(manifest.nonEmpty)
    assert(manifest.keySet.map(_._1).size > 1,
      "expected more than one split in the manifest")
    // every manifest row — INCLUDING the content hash — matches an
    // independent recount of its written shard directory
    manifest.foreach { case ((sp, sid), (nDocs, nToks, mn, mx, h)) =>
      val rows = spark.read.parquet(s"$dir/split=$sp/shard_id=$sid")
        .withColumn("split", lit(sp).cast(back.schema("split").dataType))
        .withColumn("shard_id", lit(sid).cast(back.schema("shard_id").dataType))
        .select(back.columns.map(col).toIndexedSeq: _*)
      assert(rows.count() == nDocs, s"shard $sp/$sid doc count")
      val agg = rows.agg(sum("n_tokens"), min("doc_id"), max("doc_id")).head()
      assert(agg.getLong(0) == nToks && agg.getLong(1) == mn && agg.getLong(2) == mx)
      val rehash = ShardSink.manifestOf(rows).collect()
      assert(rehash.length == 1 && rehash.head.getLong(6) == h,
        s"shard $sp/$sid content hash mismatch")
    }
    // partitioning independence of the fingerprint
    val recomputed = ShardSink.manifestOf(back.repartition(7))
      .collect().map(r => (r.getString(0), r.get(1).toString.toLong) -> r.getLong(6)).toMap
    assert(recomputed == manifest.map { case (k, v) => k -> v._5 })
    // and the hash is content-sensitive: altering one text flips it
    val tampered = ShardSink.manifestOf(
      back.withColumn("text",
        when(col("doc_id") === back.agg(min("doc_id")).head.getLong(0),
          concat(col("text"), lit(" tampered"))).otherwise(col("text"))))
      .collect().map(r => (r.getString(0), r.get(1).toString.toLong) -> r.getLong(6)).toMap
    assert(tampered != manifest.map { case (k, v) => k -> v._5 },
      "rewriting document text must change the fingerprint")
  }
}
