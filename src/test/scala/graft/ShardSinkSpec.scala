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
}
