package graft

import org.apache.spark.sql.functions._

import graft.transform.Ops

/** Hand-pinned semantics for the composed as-of and binned range
  * joins (the oracle queries cover the statistical shape; these pin
  * the boundary rules).
  */
class JoinsOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("asOfJoin: latest right at-or-before each left row; ties match; no-prior is NULL") {
    val left = Seq((1L, 7L, 10L), (2L, 7L, 15L), (3L, 7L, 4L), (4L, 8L, 100L))
      .toDF("event_id", "k", "ts")
    val right = Seq((7L, 5L, "a"), (7L, 15L, "b"), (9L, 1L, "z"))
      .toDF("k", "rts", "v")
    val out = Ops.asOfJoin(left, right, "k", "ts", "rts", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("v"))) null else r.getAs[String]("v"))).toMap
    assert(out(1L) == "a") // ts 10 → right@5
    assert(out(2L) == "b") // ts 15 ties right@15 → matches (≤)
    assert(out(3L) == null) // ts 4 → nothing before
    assert(out(4L) == null) // key 8 has no right rows at all
  }

  test("asOfJoin: carries multiple payload columns consistently from the same right row") {
    val left = Seq((1L, 7L, 20L)).toDF("event_id", "k", "ts")
    val right = Seq((7L, 5L, "a", 50.0), (7L, 10L, "b", 60.0))
      .toDF("k", "rts", "v", "w")
    val r = Ops.asOfJoin(left, right, "k", "ts", "rts", Seq("v", "w")).head
    assert(r.getAs[String]("v") == "b" && r.getAs[Double]("w") == 60.0)
  }

  test("asOfJoin: a NULL payload slot stays NULL — never backfilled from an older right row") {
    val left = Seq((1L, 7L, 20L)).toDF("event_id", "k", "ts")
    val right = Seq(
      (7L, 5L, Option("a"), Option(50.0)),
      (7L, 10L, Option("b"), Option.empty[Double])) // matching row has w = NULL
      .toDF("k", "rts", "v", "w")
    val r = Ops.asOfJoin(left, right, "k", "ts", "rts", Seq("v", "w")).head
    assert(r.getAs[String]("v") == "b")
    assert(r.isNullAt(r.fieldIndex("w")),
      "w must be NULL from the as-of row, not 50.0 from the older one")
  }

  test("rangeJoinBinned: inclusive bounds, multi-bin intervals, overlap multi-match") {
    val points = Seq((1L, 10.0), (2L, 25.0), (3L, 39.99), (4L, 40.0), (5L, 200.0))
      .toDF("id", "x")
    val intervals = Seq(("A", 10.0, 40.0), ("B", 20.0, 30.0)).toDF("name", "lo", "hi")
    val out = Ops.rangeJoinBinned(points, "x", intervals, "lo", "hi", binWidth = 7.0)
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set(
      (1L, "A"), // lo boundary inclusive
      (2L, "A"), (2L, "B"), // overlap → two matches
      (3L, "A"),
      (4L, "A"))) // hi boundary inclusive; 200.0 matches nothing
  }

  test("rangeJoinBinned equals the naive theta join on random data (property)") {
    val rng = new scala.util.Random(5)
    val points = (0 until 300).map(i => (i.toLong, rng.nextDouble() * 100)).toDF("id", "x")
    val ivs = (0 until 20).map { i =>
      val lo = rng.nextDouble() * 90
      (i.toLong, lo, lo + rng.nextDouble() * 15)
    }.toDF("iv", "lo", "hi")
    val binned = Ops.rangeJoinBinned(points, "x", ivs, "lo", "hi", binWidth = 9.0)
      .select("id", "iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("id", "iv").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
  }
}
