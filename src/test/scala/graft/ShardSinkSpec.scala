package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sink.ShardSink

/** Shard layout contract: Hive-partitioned by shard_id, exactly one
  * parquet file per shard (no identical shard split across range
  * boundaries), lossless read-back, deterministic intra-shard order.
  */
class ShardSinkSpec extends SparkSpecBase {

  test("writeShards: one file per shard dir, lossless, doc_id-ordered within shards") {
    val curated = SparkEntry.queries("q_doc_curate")(spark, sfDir)
    val dir = Files.createTempDirectory("shards").toString
    ShardSink.writeShards(curated, dir)

    val shardDirs = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.contains("shard_id="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val parts = Files.list(Paths.get(d)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      assert(parts.length == 1,
        s"$d has ${parts.length} files — a shard must be one loader unit")
    }

    val back = spark.read.parquet(dir)
    assert(back.count() == curated.count())
    // per-shard files hold rows in doc_id order (resumable-epoch contract)
    shardDirs.foreach { d =>
      val ids = spark.read.parquet(d).select("doc_id")
        .collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted), s"$d rows not in doc_id order")
    }
    // shard assignment round-trips exactly
    val mismatch = back.select(col("doc_id"), col("shard_id").cast("long"))
      .except(curated.select(col("doc_id"), col("shard_id")))
      .count()
    assert(mismatch == 0)
  }

  test("manifest certifies the files on disk: counts, bounds, and content hash") {
    val dir = Files.createTempDirectory("shards_m").toString
    // the real CLI path: writes shards WITH the normalized text payload
    // and computes the manifest from the read-back of the written tree
    graft.jobs.Main.curate(spark, sfDir, dir)
    val back = spark.read.parquet(dir)

    val manifest = spark.read.parquet(s"$dir/_manifest")
      .collect().map(r => r.get(0).toString.toLong ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(manifest.nonEmpty)
    // every manifest row — INCLUDING the content hash — matches an
    // independent recount of its written shard directory
    manifest.foreach { case (sid, (nDocs, nToks, mn, mx, h)) =>
      val rows = spark.read.parquet(s"$dir/shard_id=$sid")
        .withColumn("shard_id", lit(sid).cast(back.schema("shard_id").dataType))
        .select(back.columns.map(col).toIndexedSeq: _*)
      assert(rows.count() == nDocs, s"shard $sid doc count")
      val agg = rows.agg(sum("n_tokens"), min("doc_id"), max("doc_id")).head()
      assert(agg.getLong(0) == nToks && agg.getLong(1) == mn && agg.getLong(2) == mx)
      val rehash = ShardSink.manifestOf(rows).collect()
      assert(rehash.length == 1 && rehash.head.getLong(5) == h,
        s"shard $sid content hash mismatch")
    }
    // partitioning independence of the fingerprint
    val recomputed = ShardSink.manifestOf(back.repartition(7))
      .collect().map(r => r.get(0).toString.toLong -> r.getLong(5)).toMap
    assert(recomputed == manifest.map { case (k, v) => k -> v._5 })
    // and the hash is content-sensitive: altering one text flips it
    val tampered = ShardSink.manifestOf(
      back.withColumn("text",
        when(col("doc_id") === back.agg(min("doc_id")).head.getLong(0),
          concat(col("text"), lit(" tampered"))).otherwise(col("text"))))
      .collect().map(r => r.get(0).toString.toLong -> r.getLong(5)).toMap
    assert(tampered != manifest.map { case (k, v) => k -> v._5 },
      "rewriting document text must change the fingerprint")
  }
}
