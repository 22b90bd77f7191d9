package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_events_ab_test and q_fulfillment_latency on
  * planted fixtures with hand-derived statistics.
  */
class AbTestSpec extends SparkSpecBase {
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("ab_fix").toString
    rows.toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("event_id")))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("planted experiment: exact rates and pooled z") {
    // variant 0 = users {2, 4}: user 2 converts (purchase >= 50);
    // variant 1 = users {1, 3}: none convert
    val dir = eventsDir(Seq(
      (1L, 2L, "purchase", 60.0), (2L, 4L, "purchase", 10.0),
      (3L, 1L, "view", 1.0), (4L, 3L, "click", 1.0)))
    val r = SparkEntry.queries("q_events_ab_test")(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L && r.getDouble(2) == 0.5)
    assert(r.getLong(3) == 2L && r.getLong(4) == 0L && r.getDouble(5) == 0.0)
    val expZ = (0.5 - 0.0) /
      math.sqrt((0.25 * (1 - 0.25)) * (1.0 / 2 + 1.0 / 2))
    assert(r.getDouble(6) == expZ)
    assert(!r.getBoolean(7))
  }

  test("zero-variance experiment pins z to 0 instead of erroring") {
    val dir = eventsDir(Seq(
      (1L, 2L, "purchase", 60.0), (2L, 1L, "purchase", 60.0)))
    val r = SparkEntry.queries("q_events_ab_test")(spark, dir).collect().head
    assert(r.getDouble(6) == 0.0 && !r.getBoolean(7))
  }

  test("q18: aggregate reduces lineitem before the joins; top-100 total order") {
    val df = SparkEntry.queries("q18_large_volume_customers")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "quantity sums must map-side combine before the joins")
    val rows = df.collect()
    rows.foreach(r => assert(r.getDouble(5) > 300.0))
    val prices = rows.map(_.getDouble(4)).toSeq
    assert(prices == prices.sorted.reverse)
  }

  test("partition balance: 16 dense partitions covering every doc, ratios consistent") {
    val rows = SparkEntry.queries("q_doc_partition_balance")(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L to 15L).toSet))
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.sources.Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getDouble(3) == r.getLong(1).toDouble * 16 / total)
    }
  }

  test("fulfillment latency: planted orders land in exact week buckets") {
    val dir = java.nio.file.Files.createTempDirectory("lat_fix").toString
    Seq((1L, 0L), (2L, 0L))
      .toDF("o_orderkey", "od_day")
      .withColumn("o_orderdate", timestamp_seconds(col("od_day") * 86400L))
      .select("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // order 1 ships on days 3 and 10 (max lag 10 -> week 1); order 2
    // on day 2 (week 0)
    Seq((1L, 1, 3L), (1L, 2, 10L), (2L, 1, 2L))
      .toDF("l_orderkey", "l_linenumber", "sd_day")
      .withColumn("l_shipdate", timestamp_seconds(col("sd_day") * 86400L))
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_fulfillment_latency")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 1L, 2L, 2L), (1L, 1L, 10L, 10L)))
  }
}
