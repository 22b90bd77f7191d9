package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Prop, Test => SCTest}

import graft.transform.Ops

/** Unit coverage for the transform-op combinators that no catalog query
  * exercises directly (P1/P2/P3/P5 and friends), pinning the pandas
  * semantics quirks from SURVEY §7.5.1. Property tests use ScalaCheck
  * directly (the scalatest bridge artifact isn't in the offline cache).
  */
class OpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def checkProp(prop: Prop, minTests: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  test("P1 dropByPrefix removes SODA metadata columns only") {
    val df = Seq((1, "a", "b")).toDF(":id", "name", ":version")
    val out = df.transform(Ops.dropByPrefix(":"))
    assert(out.columns.toSeq == Seq("name"))
  }

  test("P2 renameAll renames mapped columns and leaves others") {
    val df = Seq((1, 2)).toDF("old_a", "keep")
    val out = df.transform(Ops.renameAll(Map("old_a" -> "new_a", "absent" -> "x")))
    assert(out.columns.toSeq == Seq("new_a", "keep"))
  }

  test("P3 normalizeName: lowercase, strip non-word, whitespace to underscore") {
    assert(Ops.normalizeName("  Food Insecure %  ") == "food_insecure_")
    assert(Ops.normalizeName("NTA2020") == "nta2020")
    assert(Ops.normalizeName("Median Household-Income") == "median_householdincome")
    val df = Seq((1, 2)).toDF("Zip Code", "Rent Index")
    assert(df.transform(Ops.normalizeColumnNames).columns.toSeq ==
      Seq("zip_code", "rent_index"))
  }

  test("P3 normalizeName is idempotent (property)") {
    checkProp(Prop.forAll { s: String =>
      val once = Ops.normalizeName(s)
      Ops.normalizeName(once) == once
    }, minTests = 100)
  }

  test("P5 withIngestionMetadata adds dataset_id and a timestamp") {
    val out = Seq((1, "x")).toDF("k", "v")
      .transform(Ops.withIngestionMetadata("food_supply_gap"))
    assert(out.columns.toSeq == Seq("k", "v", "dataset_id", "ingestion_timestamp"))
    val row = out.head
    assert(row.getString(2) == "food_supply_gap")
    assert(row.getTimestamp(3) != null)
  }

  test("P6 coerceNumeric nulls on parse failure (pandas to_numeric coerce)") {
    val out = Seq("12", "x7", "", "3.5").toDF("s")
      .select(Ops.coerceNumeric(col("s")).as("v")).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(12.0), None, None, Some(3.5)))
  }

  test("P8/P9 range and sentinel invalidation null out-of-domain values") {
    val vals = Seq(-5.0, 0.0, 50.0, 100.0, 101.0).toDF("v")
    val ranged = vals.select(Ops.rangeInvalidate(col("v"), 0, 100).as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(ranged.toSeq == Seq(None, Some(0.0), Some(50.0), Some(100.0), None))
    val sent = vals.select(Ops.sentinelInvalidate(col("v")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(sent.toSeq == Seq(None, Some(0.0), Some(50.0), Some(100.0), Some(101.0)))
  }

  test("P11 derivedRate pins divide-by-zero to NULL (not pandas inf)") {
    val out = Seq((10.0, 40.0), (10.0, 0.0)).toDF("num", "den")
      .select(Ops.derivedRate(col("num"), col("den")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(25.0), None))
  }

  test("W1/W2 latest-per-group and dedup keep-last are deterministic argmax") {
    val df = Seq(
      ("z1", "2024-01-01", 1.0), ("z1", "2024-03-01", 2.0),
      ("z1", "2024-02-01", 3.0), ("z2", "2024-01-01", 4.0)
    ).toDF("zip", "date", "rent")
    val latest = df.transform(Ops.latestPerGroup(Seq("zip"), Seq(col("date").desc)))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(latest == Map("z1" -> 2.0, "z2" -> 4.0))
    val kept = df.transform(Ops.dedupKeepLast(Seq("zip"), Seq(col("date"))))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kept == Map("z1" -> 2.0, "z2" -> 4.0))
  }

  test("W2 dedup is idempotent and never exceeds key cardinality (property)") {
    checkProp(Prop.forAll { rows: List[(Int, Int)] =>
      rows.isEmpty || {
        val df = rows.toDF("k", "v")
        val once = df.transform(Ops.dedupKeepLast(Seq("k"), Seq(col("v"))))
        val twice = once.transform(Ops.dedupKeepLast(Seq("k"), Seq(col("v"))))
        val onceRows = once.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
        val twiceRows = twice.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
        onceRows == twiceRows && onceRows.size == rows.map(_._1).distinct.size &&
          // keep-"last" = argmax under the order column
          onceRows.forall { case (k, v) =>
            v == rows.collect { case (`k`, x) => x }.max
          }
      }
    }, minTests = 15)
  }

  test("unpivot round-trip holds for arbitrary wide matrices (property)") {
    checkProp(Prop.forAll { rows: List[(Long, Double, Double)] =>
      val distinct = rows.distinctBy(_._1)
      distinct.isEmpty || {
        val wide = distinct.toDF("id", "m1", "m2")
        val long = wide.transform(
          Ops.unpivotToLong(Seq("id"), Seq("m1", "m2"), "metric", "v"))
        val back = long.groupBy("id").pivot("metric", Seq("m1", "m2")).agg(first("v"))
          .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
        long.count() == distinct.size * 2 && back == distinct.toSet
      }
    }, minTests = 10)
  }

  test("latestPerGroup value never exceeds the group max (property)") {
    checkProp(Prop.forAll { rows: List[(Int, Int)] =>
      rows.isEmpty || {
        val df = rows.toDF("k", "v")
        val latest = df.transform(Ops.latestPerGroup(Seq("k"), Seq(col("v").desc)))
          .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
        val maxes = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        latest == maxes
      }
    }, minTests = 15)
  }

  test("outOfRangeCounts partitions every non-null row (property: below+in+above = n)") {
    checkProp(Prop.forAll { vals: List[Double] =>
      val clean = vals.filterNot(v => v.isNaN)
      clean.isEmpty || {
        val df = clean.toDF("x")
        val row = df.transform(Ops.outOfRangeCounts(Seq(("x", -1.0, 1.0)))).head
        val below = row.getLong(0)
        val above = row.getLong(1)
        val inRange = clean.count(v => v >= -1.0 && v <= 1.0)
        below + above + inRange == clean.size
      }
    }, minTests = 15)
  }

  test("unpivot round-trips the wide matrix (melt then pivot)") {
    val wide = Seq((1L, 10.0, 20.0), (2L, 30.0, 40.0)).toDF("id", "m1", "m2")
    val long = wide.transform(Ops.unpivotToLong(Seq("id"), Seq("m1", "m2"), "metric", "v"))
    assert(long.count() == 4)
    val back = long.groupBy("id").pivot("metric", Seq("m1", "m2")).agg(first("v"))
    val got = back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 10.0, 20.0), (2L, 30.0, 40.0)))
  }

  test("O3 topK returns exactly k under the given total order") {
    val df = (1 to 100).map(i => (i.toLong, (i * 37 % 100).toLong)).toDF("id", "score")
    val top = df.transform(Ops.topK(5, Seq(col("score").desc, col("id").asc)))
      .collect().map(_.getLong(1))
    assert(top.length == 5)
    assert(top.toSeq == top.sorted(Ordering[Long].reverse).toSeq)
  }

  test("A4 duplicateKeys flags only keys with count > 1") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val dups = df.transform(Ops.duplicateKeys(Seq("k"))).collect()
    assert(dups.length == 1)
    assert(dups.head.getInt(0) == 1 && dups.head.getLong(1) == 2L)
  }

  test("A5 outOfRangeCounts counts below/above per rule in one pass") {
    val df = Seq(-1.0, 0.0, 5.0, 11.0, 12.0).toDF("x")
    val row = df.transform(Ops.outOfRangeCounts(Seq(("x", 0.0, 10.0)))).head
    assert(row.getLong(0) == 1L) // below
    assert(row.getLong(1) == 2L) // above
  }

  test("C3 binByBreaks maps breakpoint intervals to bin indices") {
    val df = Seq(-5.0, 0.0, 49999.0, 50000.0, 250000.0, 999999.0).toDF("p")
    val bins = df.select(Ops.binByBreaks(col("p"),
      Seq(0, 50000, 100000, 200000, 300000)).as("b"))
      .collect().map(_.getInt(0))
    assert(bins.toSeq == Seq(0, 0, 0, 1, 3, 4))
  }

  test("C5 classify applies thresholds highest-first") {
    val df = Seq(10000.0, 7000.0, 100.0).toDF("bal")
    val out = df.select(Ops.classify(col("bal"),
      Seq((9000.0, "high"), (5000.0, "medium")), "low").as("c"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("high", "medium", "low"))
  }
}
