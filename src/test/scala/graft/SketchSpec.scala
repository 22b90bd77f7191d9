package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Ground truth for the no-oracle q_events_sketch_stats: sketch
  * answers must land within their documented error envelopes of the
  * exact answers computed on the same data.
  */
class SketchSpec extends SparkSpecBase {

  private lazy val exact = Tables.events(spark, sfDir)
    .groupBy("event_type")
    .agg(
      countDistinct(col("user_id")).as("users"),
      expr("percentile(value, 0.5)").as("p50"),
      expr("percentile(value, 0.95)").as("p95"))
    .collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap

  private lazy val sketched =
    SparkEntry.queries("q_events_sketch_stats")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap

  test("HLL++ distinct counts stay within 5x the configured 2% rsd") {
    assert(exact.nonEmpty && exact.keySet == sketched.keySet)
    exact.foreach { case (k, (users, _, _)) =>
      val approx = sketched(k)._1
      val err = math.abs(approx - users).toDouble / users
      assert(err <= 0.10, s"$k: approx $approx vs exact $users (err $err)")
    }
  }

  test("approximate percentiles bracket the exact ones") {
    exact.foreach { case (k, (_, p50, p95)) =>
      val (_, a50, a95) = sketched(k)
      // with accuracy 10000 over ~thousands of rows the approx
      // percentile is exact or adjacent; allow a 5% value corridor
      assert(math.abs(a50 - p50) <= math.max(0.05 * math.abs(p50), 1e-9),
        s"$k p50: $a50 vs $p50")
      assert(math.abs(a95 - p95) <= math.max(0.05 * math.abs(p95), 1e-9),
        s"$k p95: $a95 vs $p95")
    }
  }

  test("sketches are deterministic across runs (mergeable partials, fixed seeds)") {
    val a = SparkEntry.queries("q_events_sketch_stats")(spark, sfDir).collect()
    val b = SparkEntry.queries("q_events_sketch_stats")(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("WAU KMV sketch merge stays within bottom-k error of the exact rolling distinct") {
    val est = SparkEntry.queries("q_events_wau_sketch")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // exact 7-day rolling distinct, recomputed from raw events
    val days = graft.sources.Tables.events(spark, sfDir)
      .select(floor(floor(unix_micros(col("ts")).cast("double") / 1000000.0) / 86400.0)
        .cast("long").as("day"), col("user_id"))
    val spine = days.select(col("day").as("d")).distinct()
    val exact = spine.join(days, col("day").between(col("d") - 6, col("d")))
      .groupBy("d").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty && est.keySet == exact.keySet)
    exact.foreach { case (d, n) =>
      val e = est(d)
      if (n < 64) {
        // union held < k hashes => every daily sketch was complete:
        // the sketch answer is EXACT by construction
        assert(e == n.toDouble, s"day $d: exact branch $e vs $n")
      } else {
        // KMV k=64: RSE ~ 1/sqrt(k-2) ~ 12.7%; allow ~2 sigma
        val rel = math.abs(e - n) / n
        assert(rel <= 0.25, s"day $d: estimate $e vs exact $n (rel err $rel)")
      }
    }
  }
}
