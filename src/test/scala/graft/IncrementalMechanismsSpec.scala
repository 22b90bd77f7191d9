package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Ground truth for the round-8 mechanism queries: incremental
  * aggregate maintenance (merge-vs-recompute equality as a property,
  * not a fixture), the binomial DP mechanism (noise recomputed
  * independently from first principles), and the bloom sidecar (a
  * planted corpus where footprint admission and bloom admission
  * provably disagree).
  */
class IncrementalMechanismsSpec extends SparkSpecBase {
  import spark.implicits._

  test("incremental agg: the merged two-state result equals one-pass recompute") {
    val merged = SparkEntry.queries("q_events_incremental_agg")(spark, sfDir)
      .collect()
    // independent one-pass recompute, same moment algebra
    val direct = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).as("sv"),
        sum(col("value").cast("decimal(12,2)")
          * col("value").cast("decimal(12,2)")).as("svv"),
        min("value").as("min_value"), max("value").as("max_value"))
      .orderBy(col("event_type").asc)
      .collect()
    assert(merged.length == direct.length && merged.nonEmpty)
    merged.zip(direct).foreach { case (m, dr) =>
      assert(m.getString(0) == dr.getString(0))
      assert(m.getLong(1) == dr.getLong(1), s"count diverges for ${m.getString(0)}")
      assert(m.getDouble(2) == dr.getDecimal(2).doubleValue(),
        s"decimal sum diverges for ${m.getString(0)}")
      assert(m.getDouble(3) == dr.getDouble(4), "min diverges")
      assert(m.getDouble(4) == dr.getDouble(5), "max diverges")
    }
    // the merge must be non-vacuous: events on both sides of the cut
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val ev = graft.sources.Tables.events(spark, sfDir)
    assert(ev.filter(col("ts") < lit(cut)).limit(1).count() == 1,
      "fixture must have pre-cut events or the merge proves nothing")
    assert(ev.filter(col("ts") >= lit(cut)).limit(1).count() == 1,
      "fixture must have post-cut events or the merge proves nothing")
  }

  test("dp counts: noise is exactly popcount(md5(seed||type))-30, bounded by ±30") {
    val noisy = SparkEntry.queries("q_events_dp_counts")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(noisy.keySet == exact.keySet && noisy.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    noisy.foreach { case (t, nv) =>
      val hex = md.digest(s"dp-seed-r8:$t".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val noise = java.lang.Long.bitCount(java.lang.Long.parseLong(hex, 16)) - 30
      assert(nv == exact(t) + noise,
        s"mechanism drift for $t: $nv != ${exact(t)} + $noise")
      assert(math.abs(noise) <= 30)
    }
  }

  private lazy val sesDir: String = {
    val d = Files.createTempDirectory("ses_fix").toString
    // type "flat": 4 events every day for 20 days -> SES of a constant
    // series is c * (1 - 2^-12) (the truncated dyadic mass, exactly).
    // type "spike": 1 event daily plus 32 extra on day 12 -> the spike
    // decays by exact halves through the following days.
    val day0 = 19800L
    val rows = (0 until 20).flatMap { dday =>
      val ts = new java.sql.Timestamp((day0 + dday) * 86400000L)
      val flat = (0 until 4).map(k =>
        (dday * 100L + k, ts, k.toLong, "flat", 1.0, "{}"))
      val spike = (0 until (if (dday == 11) 33 else 1)).map(k =>
        (dday * 1000L + 500L + k, ts, k.toLong, "spike", 1.0, "{}"))
      flat ++ spike
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("ses: constant series smooths to c*(1-2^-12); a spike decays by exact halves") {
    val rows = SparkEntry.queries("q_events_ses")(spark, sesDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val flat = rows.filter(_._1 == "flat")
    assert(flat.length == 9, s"20-day series must emit days 12..20, got ${flat.length}")
    flat.foreach { case (_, _, n, ses) =>
      assert(n == 4L)
      assert(ses == 4.0 * (1.0 - 1.0 / 4096.0), s"constant SES wrong: $ses")
    }
    // spike of +32 on day index 11 (the 12th day, first emitted row):
    // contributes 32 * 2^-(j+1) on the j-th day after it
    val spike = rows.filter(_._1 == "spike").sortBy(_._2)
    val base = 1.0 * (1.0 - 1.0 / 4096.0)
    spike.zipWithIndex.foreach { case ((_, _, _, ses), j) =>
      val expected = base + 32.0 / (1L << (j + 1))
      assert(ses == expected, s"day +$j after spike: $ses != $expected")
    }
  }

  test("trend: Theil-Sen shrugs off the spike day that drags OLS") {
    val rows = SparkEntry.queries("q_events_trend")(spark, sesDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val (fn, fOls, fTs) = rows("flat")
    assert(fn == 20L && fOls == 0.0 && fTs == 0.0, s"constant series: $rows")
    val (sn, sOls, sTs) = rows("spike")
    // one +32 outlier day just past the series midpoint: the median of
    // pairwise slopes is still 0 (171 of 190 pairs avoid the spike),
    // while OLS is dragged positive
    assert(sn == 20L && sTs == 0.0, s"Theil-Sen must resist the outlier: $sTs")
    assert(sOls > 0.0, s"OLS must be dragged by the outlier: $sOls")
  }

  test("changepoint: CUSUM peaks the day before the spike; flat series peaks at zero") {
    val rows = SparkEntry.queries("q_events_changepoint")(spark, sesDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val day0 = 19800L
    // spike series: prefix deficit -32t grows until the spike lands,
    // so |C| maxes at t=11 (the day BEFORE the +32 day): |C|=352
    assert(rows("spike") == ((day0 + 10, 352L, 352.0 / 20.0)), rows("spike"))
    // constant series: C == 0 everywhere, tie broken to the first day
    assert(rows("flat") == ((day0, 0L, 0.0)), rows("flat"))
  }

  test("autocorr: exact rational ACF on the spike; NULL on the zero-variance series") {
    val rows = SparkEntry.queries("q_events_autocorr")(spark, sesDir).collect()
    val spike = rows.filter(_.getString(0) == "spike")
      .map(r => r.getInt(1) -> r.getDouble(2)).toMap
    // hand-computed on dv = 20x - 52: den = 389120,
    // num(1) = 17*1024 - 2*19456, num(7) = 11*1024 - 2*19456
    assert(spike(1) == -21504.0 / 389120.0, s"acf(1)=${spike(1)}")
    assert(spike(7) == -27648.0 / 389120.0, s"acf(7)=${spike(7)}")
    rows.filter(_.getString(0) == "flat").foreach { r =>
      assert(r.isNullAt(2), "zero-variance series must yield NULL acf")
    }
  }

  test("holt: taps re-derive from the recursion; flat series pins to the exact tap sums") {
    // independent exact re-derivation of the 2^24-scaled tap weights:
    // run the zero-init alpha=beta=1/2 recursion on unit impulses with
    // BigDecimal (exact — every division is by 2)
    val W = 12
    val half = new java.math.BigDecimal("0.5")
    var la = Vector.fill(W)(java.math.BigDecimal.ZERO)
    var ba = Vector.fill(W)(java.math.BigDecimal.ZERO)
    (0 until W).foreach { t =>
      val nl0 = (0 until W).map(j => la(j).add(ba(j)).multiply(half))
      val nl = nl0.updated(t, nl0(t).add(half))
      val nb = (0 until W).map(j =>
        nl(j).subtract(la(j)).multiply(half).add(ba(j).multiply(half)))
      la = nl.toVector; ba = nb.toVector
    }
    val d24 = new java.math.BigDecimal(1L << 24)
    val kl = la.map(_.multiply(d24).longValueExact())
    val kb = ba.map(_.multiply(d24).longValueExact())
    // flat series (n = 4 every day): level = 4*sum(kl)/2^24 etc.
    val rows = SparkEntry.queries("q_events_holt")(spark, sesDir).collect()
      .filter(_.getString(0) == "flat")
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 9)
    val expL = 4.0 * kl.sum / (1L << 24).toDouble
    val expB = 4.0 * kb.sum / (1L << 24).toDouble
    val expF = 4.0 * (kl.sum + 7 * kb.sum) / (1L << 24).toDouble
    rows.foreach { case (l, b, f) =>
      assert(l == expL, s"level $l != $expL")
      assert(b == expB, s"trend $b != $expB")
      assert(f == expF, s"forecast $f != $expF")
    }
    // the production taps must equal the re-derived ones: compare via
    // the published values on a delta series (impulse on the last day)
    // — cheaper: assert the sums used above match the query's scaladoc
    // constants by recomputing one emitted row's level from raw counts
    // element-wise against the production constants (order-sensitive:
    // a transposition cannot hide behind matching sums)
    assert(kl == graft.queries.EventsQ.holtTapsL,
      s"level taps drifted from the recursion: $kl")
    assert(kb == graft.queries.EventsQ.holtTapsB,
      s"trend taps drifted from the recursion: $kb")
  }

  private lazy val bloomDir: String = {
    val d = Files.createTempDirectory("bloom_fix").toString
    // two parts at the key-range ends: the single file's footprint is
    // [0, 400] (admits every interior probe), but only the keys 0 and
    // 400 are present — interior bloom admission would need all 3 of a
    // probe's hash bits inside the file's 6 set bits, p ~ (6/32768)^3
    val ts0 = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("1996-06-01 00:00:00")
    (0 until 10).map { i =>
      (i.toLong, if (i % 2 == 0) 0L else 400L, 1L, i.toLong,
        1.0, 10.0, 0.0, 0.0, "N", "O", if (i < 5) ts0 else ts1)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("bloom sidecar: footprint admits every interior probe, bloom only the present key") {
    val rows = SparkEntry.queries("q_layout_bloom_stats")(spark, bloomDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == 8)
    rows.foreach { case (pid, lo, nFiles, mm, bloom) =>
      assert(nFiles == 1L)
      assert(mm == 1L, s"probe $pid at $lo: the [0,400] footprint must admit")
      val expectBloom = if (lo == 0L) 1L else 0L
      assert(bloom == expectBloom,
        s"probe $pid at key $lo: bloom admitted $bloom, expected $expectBloom")
    }
  }
}
