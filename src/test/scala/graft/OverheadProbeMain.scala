package graft

import org.apache.spark.sql.functions._

/** Manual fixed-cost probe (not a CI test — `Test/runMain
  * graft.OverheadProbeMain <sfDir>`): decomposes where a small catalog
  * query's wall-clock goes at driver scale — relation resolution
  * (spark.read.parquet), query-fn construction, and the timed
  * materialization — so tail-query optimization targets facts, not
  * guesses (guide §1).
  */
object OverheadProbeMain {
  def time[A](label: String, n: Int)(f: => A): Unit = {
    f // warm
    val t0 = System.nanoTime()
    (1 to n).foreach(_ => f)
    println(f"[probe] $label%-42s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms/op (n=$n)")
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    time("read.parquet(lineitem) resolve only", 20) {
      spark.read.parquet(s"$d/lineitem.parquet")
    }
    time("read.parquet(orders) resolve only", 20) {
      spark.read.parquet(s"$d/orders.parquet")
    }
    val ordersMemo = spark.read.parquet(s"$d/orders.parquet")

    val fn = SparkEntry.queries("q_try_cast")
    time("q_try_cast fn construction only", 10) { fn(spark, d) }
    time("q_try_cast fn + materialize", 5) { Bench.materialize(fn(spark, d)) }

    val tryCastMemo = ordersMemo.select(
      col("o_orderkey"),
      expr("try_cast(substring(o_orderpriority, 1, 1) as int)").as("priority_num"),
      expr("try_cast(o_orderstatus as int)").as("status_num"))
    time("materialize memoized-relation try_cast", 5) {
      Bench.materialize(tryCastMemo)
    }
    time("materialize bare orders count-ish agg", 5) {
      ordersMemo.groupBy().count().head()
    }
    time("materialize raw 3 cols", 5) {
      Bench.materialize(ordersMemo.select(
        col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus")))
    }
    time("materialize o_orderkey only", 5) {
      Bench.materialize(ordersMemo.select(col("o_orderkey")))
    }
    time("materialize substring only", 5) {
      Bench.materialize(ordersMemo.select(
        col("o_orderkey"), substring(col("o_orderpriority"), 1, 1)))
    }
    time("materialize try_cast(status) only", 5) {
      Bench.materialize(ordersMemo.select(
        col("o_orderkey"), expr("try_cast(o_orderstatus as int)")))
    }
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    time("materialize lineitem raw 6 cols", 5) {
      Bench.materialize(li.select(col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"), col("l_linestatus")))
    }
    time("lineitem 6-col sum agg (no hash)", 5) {
      li.agg(sum(col("l_quantity")), sum(col("l_extendedprice"))).head()
    }
    // AQE off comparison
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    graft.functions.GraftFunctions.registerAll(s2)
    val fn2 = SparkEntry.queries("q_try_cast")
    time("q_try_cast fn + materialize (AQE off)", 5) {
      Bench.materialize(fn2(s2, d))
    }
    spark.stop()
  }
}
