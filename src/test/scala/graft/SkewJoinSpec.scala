package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling, proven end-to-end: a 100 TB fact join always
  * has hot keys, and the session's AQE config must actually SPLIT the
  * skewed shuffle partition at runtime (OptimizeSkewedJoin) rather than
  * letting one task process the hot key alone. Thresholds are lowered
  * to test scale and restored afterwards — the mechanism under test is
  * identical at production thresholds.
  */
class SkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("AQE splits the skewed partition of a hot-key sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // 100k-row fact, 90% on one hot key; padding makes bytes-per-key real
      val fact = spark.range(100000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          lpad(col("id").cast("string"), 64, "x").as("pad"))
      val dim = spark.range(100000).select(col("id").as("k"),
        col("id").cast("string").as("name"))
      val joined = fact.join(dim, "k")
      // execute THIS DataFrame (count() would build a separate plan
      // tree and leave this one un-finalized under AQE)
      assert(joined.collect().length == 100000) // every fact row matches once
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(6).mkString("\n"))
      assert(plan.contains("skew=true"),
        s"AQE did not mark/split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
