package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Manual fixed-cost probe (not a CI test — `Test/runMain
  * graft.TaskCountProbeMain <sfDir>`): counts the TASKS a few
  * representative small queries launch, and how the count responds to
  * `spark.sql.files.minPartitionNum` / AQE coalescing knobs. Motivation
  * (r15, guide §2.2/§6): every testdata table is a single one-row-group
  * parquet file, yet `leafNodeDefaultParallelism` defaults to the core
  * count, so a scan may split into 32 byte-range tasks of which 31 read
  * zero row groups — pure scheduling overhead per query, and the lead
  * suspect for the 8-core catalog beating the 32-core one at sf0.1
  * (PERF_r14 scaling block).
  */
object TaskCountProbeMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val tasks = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })

    def probe(label: String)(f: => Unit): Unit = {
      f // warm (codegen, memo)
      Thread.sleep(300) // let listener drain
      tasks.set(0)
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[taskprobe] $label%-52s tasks=${tasks.get()}%4d  $sec%7.3f s")
    }

    val li = spark.read.parquet(s"$d/lineitem.parquet")
    println(s"[taskprobe] lineitem scan partitions = ${li.rdd.getNumPartitions}")

    probe("lineitem 2-col sum agg") {
      li.agg(sum(col("l_quantity")), sum(col("l_extendedprice"))).head()
    }
    probe("q6_forecast_revenue materialize") {
      Bench.materialize(SparkEntry.queries("q6_forecast_revenue")(spark, d))
    }
    probe("q3_shipping_priority materialize") {
      Bench.materialize(SparkEntry.queries("q3_shipping_priority")(spark, d))
    }
    probe("q7_nation_volume materialize") {
      Bench.materialize(SparkEntry.queries("q7_nation_volume")(spark, d))
    }

    // same probes with minPartitionNum=1 in a new session
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.minPartitionNum", "1")
    graft.functions.GraftFunctions.registerAll(s2)
    val li2 = s2.read.parquet(s"$d/lineitem.parquet")
    println(s"[taskprobe] minPartitionNum=1: lineitem scan partitions = ${li2.rdd.getNumPartitions}")
    probe("minPart=1: lineitem 2-col sum agg") {
      li2.agg(sum(col("l_quantity")), sum(col("l_extendedprice"))).head()
    }
    probe("minPart=1: q6_forecast_revenue materialize") {
      Bench.materialize(SparkEntry.queries("q6_forecast_revenue")(s2, d))
    }
    probe("minPart=1: q3_shipping_priority materialize") {
      Bench.materialize(SparkEntry.queries("q3_shipping_priority")(s2, d))
    }
    probe("minPart=1: q7_nation_volume materialize") {
      Bench.materialize(SparkEntry.queries("q7_nation_volume")(s2, d))
    }
    spark.stop()
  }
}
