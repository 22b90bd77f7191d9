package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Ground truth for the round-8 mechanism queries: incremental
  * aggregate maintenance (merge-vs-recompute equality as a property,
  * not a fixture), the binomial DP mechanism (noise recomputed
  * independently from first principles), and the bloom sidecar (a
  * planted corpus where footprint admission and bloom admission
  * provably disagree).
  */
class IncrementalMechanismsSpec extends SparkSpecBase {
  import spark.implicits._

  test("incremental agg: the merged two-state result equals one-pass recompute") {
    val merged = SparkEntry.queries("q_events_incremental_agg")(spark, sfDir)
      .collect()
    // independent one-pass recompute, same moment algebra
    val direct = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).as("sv"),
        sum(col("value").cast("decimal(12,2)")
          * col("value").cast("decimal(12,2)")).as("svv"),
        min("value").as("min_value"), max("value").as("max_value"))
      .orderBy(col("event_type").asc)
      .collect()
    assert(merged.length == direct.length && merged.nonEmpty)
    merged.zip(direct).foreach { case (m, dr) =>
      assert(m.getString(0) == dr.getString(0))
      assert(m.getLong(1) == dr.getLong(1), s"count diverges for ${m.getString(0)}")
      assert(m.getDouble(2) == dr.getDecimal(2).doubleValue(),
        s"decimal sum diverges for ${m.getString(0)}")
      assert(m.getDouble(3) == dr.getDouble(4), "min diverges")
      assert(m.getDouble(4) == dr.getDouble(5), "max diverges")
    }
    // the merge must be non-vacuous: events on both sides of the cut
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val ev = graft.sources.Tables.events(spark, sfDir)
    assert(ev.filter(col("ts") < lit(cut)).limit(1).count() == 1,
      "fixture must have pre-cut events or the merge proves nothing")
    assert(ev.filter(col("ts") >= lit(cut)).limit(1).count() == 1,
      "fixture must have post-cut events or the merge proves nothing")
  }

  test("dp counts: noise is exactly popcount(md5(seed||type))-30, bounded by ±30") {
    val noisy = SparkEntry.queries("q_events_dp_counts")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(noisy.keySet == exact.keySet && noisy.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    noisy.foreach { case (t, nv) =>
      val hex = md.digest(s"dp-seed-r8:$t".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val noise = java.lang.Long.bitCount(java.lang.Long.parseLong(hex, 16)) - 30
      assert(nv == exact(t) + noise,
        s"mechanism drift for $t: $nv != ${exact(t)} + $noise")
      assert(math.abs(noise) <= 30)
    }
  }

  private lazy val bloomDir: String = {
    val d = Files.createTempDirectory("bloom_fix").toString
    // two parts at the key-range ends: the single file's footprint is
    // [0, 400] (admits every interior probe), but only the keys 0 and
    // 400 are present — interior bloom admission would need all 3 of a
    // probe's hash bits inside the file's 6 set bits, p ~ (6/32768)^3
    val ts0 = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("1996-06-01 00:00:00")
    (0 until 10).map { i =>
      (i.toLong, if (i % 2 == 0) 0L else 400L, 1L, i.toLong,
        1.0, 10.0, 0.0, 0.0, "N", "O", if (i < 5) ts0 else ts1)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("bloom sidecar: footprint admits every interior probe, bloom only the present key") {
    val rows = SparkEntry.queries("q_layout_bloom_stats")(spark, bloomDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == 8)
    rows.foreach { case (pid, lo, nFiles, mm, bloom) =>
      assert(nFiles == 1L)
      assert(mm == 1L, s"probe $pid at $lo: the [0,400] footprint must admit")
      val expectBloom = if (lo == 0L) 1L else 0L
      assert(bloom == expectBloom,
        s"probe $pid at key $lo: bloom admitted $bloom, expected $expectBloom")
    }
  }
}
