package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Co-located joins via bucketing — the 100 TB fact⋈fact answer when
  * broadcast is off the table: both sides bucketed by the join key at
  * write time join WITHOUT a shuffle (no Exchange in the plan), because
  * their partitioning already satisfies the join's distribution
  * requirement.
  */
class BucketedJoinSpec extends SparkSpecBase {

  test("bucketed fact tables join with zero Exchange operators") {
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    // disable auto-broadcast so the join would otherwise shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("Join"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.linesIterator.take(20).mkString("\n")}")
      assert(plan.contains("Bucketed: true"), "scan should report bucketed read")
      // and the result is right
      val viaBuckets = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val direct = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaBuckets == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
