package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_events_exact_quantiles (distributed selection)
  * and q7_nation_volume (deep join tree): planted exact values, a
  * brute-force quantile re-derivation on the corpus, and plan shape.
  */
class ExactQuantilesSpec extends SparkSpecBase {
  import spark.implicits._

  /** Type A: values 1..10 (even n: median (5+6)/2 = 5.5, p90 = 9th
    * value = 9). Type B: 0.5, 1.5, 2.5 (odd n: median 1.5, p90 = 3rd
    * = 2.5) — B's values straddle floor-buckets 0, 1 and 2, so the
    * selection must cross bucket boundaries correctly. A NaN row is
    * excluded.
    */
  private lazy val plantedDir: String = {
    val rows = (1 to 10).map(i => (i.toLong, "A", i.toDouble)) ++
      Seq((20L, "B", 0.5), (21L, "B", 1.5), (22L, "B", 2.5),
        (30L, "C", Double.NaN))
    val dir = java.nio.file.Files.createTempDirectory("quant_fix").toString
    rows.toDF("event_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("event_id")))
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted types: exact median and p90, even and odd n, cross-bucket") {
    val out = SparkEntry.queries("q_events_exact_quantiles")(spark, plantedDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out("A") == ((10L, 5.5, 9.0)))
    assert(out("B") == ((3L, 1.5, 2.5)))
    assert(!out.contains("C"), "all-NaN type must vanish")
  }

  /** Wide monetary domain: 20k rows spread over ~2.1e9 distinct
    * integer values. The old floor(value) pass-1 histogram would
    * collect 20k driver rows here (and grows with the domain); the
    * adaptive width (range/8192) keeps the driver ≤ ~8.2K buckets per
    * type at ANY width — while the selection stays exact.
    */
  private lazy val wideDir: String = {
    val rows = (1 to 20000).map(i => (i.toLong, "W", i.toDouble * 104729.0))
    val dir = java.nio.file.Files.createTempDirectory("quant_wide").toString
    rows.toDF("event_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("event_id")))
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("wide domain: exact result, driver histogram bounded at ~8K buckets") {
    val r = SparkEntry.queries("q_events_exact_quantiles")(spark, wideDir)
      .collect().head
    assert(r.getString(0) == "W" && r.getLong(1) == 20000L)
    assert(r.getDouble(2) == (10000.0 * 104729.0 + 10001.0 * 104729.0) / 2)
    assert(r.getDouble(3) == 18000.0 * 104729.0)
    // the pass-1 bucket expression over this corpus stays ≤ 8192+2
    // buckets (vs 20000 distinct floor(value) integers)
    val mn = 1.0 * 104729.0; val mx = 20000.0 * 104729.0
    val w = math.max((mx - mn) / 8192.0, java.lang.Double.MIN_NORMAL)
    val nBuckets = (1 to 20000)
      .map(i => math.floor((i * 104729.0 - mn) / w).toLong).distinct.size
    assert(nBuckets <= 8194, s"bucket count $nBuckets must stay bounded")
    assert(nBuckets > 4000, "fixture must actually exercise many buckets")
  }

  test("corpus: selection equals the brute-force sorted-multiset quantiles") {
    val vals = graft.sources.Tables.events(spark, sfDir)
      .filter(!isnan(col("value"))).select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sorted }
    val out = SparkEntry.queries("q_events_exact_quantiles")(spark, sfDir)
      .collect()
    assert(out.length == vals.size)
    out.foreach { r =>
      val v = vals(r.getString(0))
      val n = v.length
      assert(r.getLong(1) == n.toLong)
      val expMed = (v((n + 1) / 2 - 1) + v((n + 2) / 2 - 1)) / 2
      assert(r.getDouble(2) == expMed, s"median of ${r.getString(0)}")
      assert(r.getDouble(3) == v(((9 * n + 9) / 10 - 1).toInt),
        s"p90 of ${r.getString(0)}")
    }
  }

  test("q7: nation dims broadcast, no cartesian, partial aggregation") {
    val p = SparkEntry.queries("q7_nation_volume")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "nation dims must broadcast")
    assert(!p.contains("CartesianProduct"), p.linesIterator.take(5).mkString("\n"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }
}
