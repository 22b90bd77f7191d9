package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Manual per-row guard-cost probe (not a CI test — `Test/runMain
  * graft.GuardCostProbeMain <sfDir>`): decomposes where the integral
  * try_cast guard's time goes on CLEAN data (every value parseable, so
  * the guard is pure overhead and the throwing path never throws) —
  * bare try_cast vs the r14 rlike guard vs a regex-free
  * translate/contains guard, and whether the doubled get_json_object
  * in the guard's condition+branch is eliminated by codegen CSE.
  */
object GuardCostProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/tmp/graft_sf10")
    val ev = spark.read.parquet(s"$d/events.parquet")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[guardprobe] $label%-46s min=${runs.min}%6.3f s  (${runs.map(r => f"$r%.3f").mkString(", ")})")
    }

    val k = get_json_object(col("props"), "$.k")
    time("baseline: k string only (no cast)") {
      ev.select(col("event_type"), k.as("ks"))
    }
    time("bare try_cast(k as int)") {
      ev.select(col("event_type"), k.try_cast(IntegerType).as("km"))
    }
    time("rlike guard (r14 form)") {
      ev.select(col("event_type"),
        when(k.cast(StringType).rlike("[0-9]|(?i)(true|false)"),
          k.try_cast(IntegerType)).as("km"))
    }
    time("rlike guard, digit-only regex") {
      ev.select(col("event_type"),
        when(k.cast(StringType).rlike("[0-9]"),
          k.try_cast(IntegerType)).as("km"))
    }
    time("translate/contains guard") {
      val s = k.cast(StringType)
      val hasDigit = length(s) =!= length(translate(s, "0123456789", ""))
      val l = lower(s)
      ev.select(col("event_type"),
        when(hasDigit || l.contains("true") || l.contains("false"),
          k.try_cast(IntegerType)).as("km"))
    }
    time("pre-projected k + rlike guard (no CSE question)") {
      ev.select(col("event_type"), k.as("ks"))
        .select(col("event_type"),
          when(col("ks").rlike("[0-9]|(?i)(true|false)"),
            col("ks").try_cast(IntegerType)).as("km"))
    }
    spark.stop()
  }
}
