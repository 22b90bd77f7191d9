package graft

import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroup

/** Ground truth for the custom top-k-per-group physical operator:
  * result equality with the ROW_NUMBER window form on adversarial
  * layouts (groups scattered across partitions, ties, groups smaller
  * than k), the partial→exchange→final plan shape, and rank
  * correctness.
  */
class TopKPerGroupPlanSpec extends SparkSpecBase {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("v").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("g", "id", "v", "rank")
  }

  test("matches the window form exactly on a scattered multi-partition layout") {
    val df = spark.range(0, 10000, 1, 16)
      .select(col("id"), (col("id") % 37).as("g"),
        ((col("id") * 7919) % 1000).as("v"))
    val native = TopKPerGroup(df, Seq("g"), Seq(("v", true), ("id", false)), 5)
      .select("g", "id", "v", "rank")
    val expected = windowForm(df.select("g", "id", "v"), 5)
    assert(native.collect().map(_.toSeq).toSet ==
      expected.collect().map(_.toSeq).toSet)
    assert(native.count() == 37 * 5)
  }

  test("groups smaller than k emit all members with dense ranks") {
    val df = Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 2L, 5L))
      .toDF("id", "g", "v")
    val out = TopKPerGroup(df, Seq("g"), Seq(("v", true), ("id", false)), 4)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getInt(3))).sorted
    assert(out.toSeq == Seq((1L, 1L, 2), (1L, 2L, 1), (2L, 3L, 1)))
  }

  test("ties resolve by the tie-break column, identically to ROW_NUMBER") {
    val df = Seq((10L, 1L, 7L), (11L, 1L, 7L), (12L, 1L, 7L), (13L, 1L, 3L))
      .toDF("id", "g", "v")
    val native = TopKPerGroup(df, Seq("g"), Seq(("v", true), ("id", false)), 2)
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(native.toSeq == Seq((10L, 1), (11L, 2)))
  }

  test("plan: partial heap before the exchange, final heap after, no window/sort of the corpus") {
    val df = spark.range(0, 1000, 1, 8)
      .select(col("id"), (col("id") % 5).as("g"), (col("id") % 100).as("v"))
    val out = TopKPerGroup(df, Seq("g"), Seq(("v", true), ("id", false)), 3)
    val p = out.queryExecution.executedPlan.toString
    assert("TopKPerGroup \\[".r.findAllIn(p).size == 2,
      s"partial+final operator pair expected:\n$p")
    assert(p.contains("Exchange hashpartitioning(g"),
      s"EnsureRequirements must insert the group-key exchange:\n$p")
    assert(!p.contains("Window"), "no window execution")
    assert(!p.contains("Sort "), "nothing larger than k is sorted")
    // exactly one phase carries the rank attribute (the final one,
    // above the exchange): the rank-bearing line mentions `rank#`
    assert(p.linesIterator.count(l =>
      l.contains("TopKPerGroup [") && l.contains("rank#")) == 1, p)
  }

  test("deterministic across runs and under repartitioning") {
    val df = spark.range(0, 5000, 1, 4)
      .select(col("id"), (col("id") % 11).as("g"), ((col("id") * 31) % 500).as("v"))
    val a = TopKPerGroup(df, Seq("g"), Seq(("v", true), ("id", false)), 4)
      .collect().map(_.toSeq).toSet
    val b = TopKPerGroup(df.repartition(13), Seq("g"),
      Seq(("v", true), ("id", false)), 4).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
