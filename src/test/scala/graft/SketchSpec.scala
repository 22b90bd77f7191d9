package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Accuracy gate for q_events_sketch_stats (hash-verified relational
  * sketches since round 7 — KMV bottom-k distinct + adaptive-histogram
  * percentiles): sketch answers must land within their documented
  * error envelopes of the exact answers computed on the same data.
  */
class SketchSpec extends SparkSpecBase {

  private lazy val exact = Tables.events(spark, sfDir)
    .filter(!isnan(col("value")))
    .groupBy("event_type")
    .agg(
      countDistinct(col("user_id")).as("users"),
      expr("percentile(value, 0.5)").as("p50"),
      expr("percentile(value, 0.95)").as("p95"),
      (max("value") - min("value")).as("range"))
    .collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

  private lazy val sketched =
    SparkEntry.queries("q_events_sketch_stats")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap

  test("KMV k=256 distinct counts stay within ~2.5 sigma of 1/sqrt(k-2) RSE") {
    assert(exact.nonEmpty && exact.keySet == sketched.keySet)
    exact.foreach { case (k, (users, _, _, _)) =>
      val approx = sketched(k)._1
      if (users < 256) assert(approx == users.toDouble,
        s"$k: below k the KMV sketch is exact by construction")
      else {
        val err = math.abs(approx - users) / users
        assert(err <= 0.16, s"$k: approx $approx vs exact $users (err $err)")
      }
    }
  }

  test("histogram-sketch percentiles land within one adaptive bucket width") {
    // the sketch's contract is NEAREST-RANK (cum ≥ ceil(q·n) crossing):
    // its bucket contains the rank value, and the midpoint estimate is
    // within one bucket width of it. (The interpolated percentile() can
    // sit several units away when adjacent order stats jump — that's a
    // different definition, not sketch error.)
    val byType = Tables.events(spark, sfDir)
      .filter(!isnan(col("value"))).select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sorted }
    byType.foreach { case (k, v) =>
      val (_, a50, a95) = sketched(k)
      val n = v.length.toLong
      // smallest 1-based rank i with 2i >= n / 20i >= 19n
      val r50 = v(((n + 1) / 2 - 1).toInt)
      val r95 = v(((19 * n + 19) / 20 - 1).toInt)
      val w = math.max((v.last - v.head) / 8192.0, java.lang.Double.MIN_NORMAL)
      assert(math.abs(a50 - r50) <= w + 1e-9, s"$k p50: $a50 vs $r50 (w $w)")
      assert(math.abs(a95 - r95) <= w + 1e-9, s"$k p95: $a95 vs $r95 (w $w)")
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
