package graft

import java.nio.file.Files

/** Hand-computed ground truth for the second TPC-H tranche (Q8, Q12,
  * Q17, Q19 shapes) on a planted seven-table micro-warehouse where
  * every aggregate is checkable by hand, plus plan audits of the
  * shapes each query exists to exercise (the Q8 broadcast semi-join
  * reduction, Q17's single-shuffle window rewrite, Q19's implied
  * per-table prefilters reaching both parquet scans) on the real
  * corpus. Sibling of TpchCanonSpec, with its own fixture because the
  * two tranches need incompatible planted part/lineitem rows.
  */
class TpchCanon2Spec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("tpch2_fix").toString
    Seq((0L, "AFRICA"), (2L, "ASIA"))
      .toDF("r_regionkey", "r_name")
      .write.parquet(s"$d/region.parquet")
    Seq((0L, "NATION_0", 0L), (2L, "NATION_2", 2L), (7L, "NATION_7", 2L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$d/nation.parquet")
    // C1 sits in ASIA (nation 7), C2 in AFRICA (nation 0)
    Seq((1L, "C1", 7L, 1000.0, "BUILDING"), (2L, "C2", 0L, 2000.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    // S1 supplies from the Q8 target nation, S2 from the other ASIA one
    Seq((1L, "S1", 2L, 100.0), (2L, "S2", 7L, 200.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$d/supplier.parquet")
    // P4's size 40 fails q19's size<=35 prefilter by construction
    Seq(
      (1L, "P1", "Brand#2", "PROMO", 10L, 100.0),
      (2L, "P2", "Brand#19", "STANDARD", 20L, 100.0),
      (3L, "P3", "Brand#4", "PROMO", 1L, 100.0),
      (4L, "P4", "Brand#8", "PROMO", 40L, 100.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$d/part.parquet")
    Seq(
      (100L, 1L, "O", 1500.0, ts("1996-05-01"), "1-URGENT"),
      (101L, 1L, "O", 200.0, ts("1997-03-01"), "5-LOW"),
      (102L, 2L, "O", 600.0, ts("1996-06-01"), "3-MEDIUM"),
      (103L, 1L, "F", 1070.0, ts("1995-06-01"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    Seq(
      (100L, 1L, 1L, 1L, 5.0, 1000.0, 0.10, 0.0, "R", "O", ts("1996-08-01")),
      (100L, 2L, 1L, 2L, 15.0, 400.0, 0.00, 0.0, "A", "O", ts("1996-05-15")),
      (100L, 3L, 2L, 3L, 10.0, 500.0, 0.00, 0.0, "N", "O", ts("1996-07-15")),
      (101L, 4L, 1L, 1L, 25.0, 200.0, 0.00, 0.0, "N", "O", ts("1997-05-10")),
      (102L, 1L, 1L, 1L, 20.0, 600.0, 0.00, 0.0, "R", "O", ts("1996-09-01")),
      (103L, 1L, 1L, 1L, 11.0, 300.0, 0.00, 0.0, "A", "F", ts("1995-08-15")),
      (103L, 3L, 1L, 2L, 10.0, 700.0, 0.00, 0.0, "N", "F", ts("1995-07-01")),
      (103L, 3L, 2L, 3L, 1.0, 70.0, 0.00, 0.0, "N", "F", ts("1995-07-02")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, dir).collect()

  test("q8: PROMO volume into ASIA split by supplier nation, per year") {
    // 1996 = order 100: line 1 (P1 PROMO, S1=NATION_2, 1000*0.90=900)
    // + line 3 (P3 PROMO, S2=NATION_7, 500); line 2 is STANDARD, order
    // 102's customer is AFRICA, order 103 is outside the window.
    // 1997 = order 101: line 4 (P4 PROMO, S1, 200) alone.
    val rows = run("q8_market_share")
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (1996, 900.0, 1400.0, 900.0 / 1400.0),
      (1997, 200.0, 200.0, 1.0)))
  }

  test("q12: late 1996 lines split high/low priority per return flag") {
    // late+in-window: line 100-1 (92d, R, urgent), 100-3 (75d, N,
    // urgent), 102-1 (92d, R, medium); 100-2 shipped 14d (on time),
    // 101-4 shipped 1997, order 103's lines shipped 1995
    val rows = run("q12_priority_shipping")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("N", 1L, 0L), ("R", 1L, 1L)))
  }

  test("q17: only the below-20%-of-part-average line contributes") {
    // Brand#4 = P3; its lines have quantities 10, 10, 1 -> avg 7.0,
    // threshold 1.4 -> only the qty-1 line (price 70.00) qualifies:
    // 70 / 7.0 = 10.0
    val r = run("q17_small_qty_revenue").head
    assert(r.getDouble(0) == 10.0 && r.getLong(1) == 1L)
  }

  test("q19: the three-way disjunction keeps exactly the qualifying lines") {
    // Brand#2 qty 1-11: 100-1 (qty 5, 900.00) + 103-1 (qty 11, 300.00);
    // Brand#19 qty 10-20: 100-2 (qty 15, 400.00); Brand#8 fails the
    // size bound (P4 size 40); 102-1 (Brand#2 qty 20) misses its range
    val r = run("q19_disjunctive_revenue").head
    assert(r.getDouble(0) == 1600.0 && r.getLong(1) == 3L)
  }

  private lazy val giniDir: String = {
    val d = Files.createTempDirectory("gini_fix").toString
    Seq((0L, "A", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$d/nation.parquet")
    // balances 1,1,1,97: rank form gives G = (2*394 - 5*100)/(4*100)
    // = 0.72 exactly; top decile = ceil(4/10) = 1 holder = 0.97
    Seq((1L, "C1", 0L, 1.0, "B"), (2L, "C2", 0L, 1.0, "B"),
      (3L, "C3", 0L, 1.0, "B"), (4L, "C4", 0L, 97.0, "B"),
      (5L, "C5", 0L, -5.0, "B")) // negative balance excluded
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    d
  }

  test("gini: closed form on a planted distribution, negatives excluded") {
    val r = run("q_customer_gini").headOption // fixture reuse guard
    val rows = SparkEntry.queries("q_customer_gini")(spark, giniDir).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4)))
    assert(rows.toSeq == Seq((0L, "A", 4L, 0.72, 0.97)), rows.toSeq)
    assert(r.nonEmpty) // and the shared fixture still answers
  }

  test("plan shapes on the real corpus: Q8 semi-joins, Q17 single shuffle, Q19 pushdown") {
    def plan(name: String) =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
    val p8 = plan("q8_market_share")
    assert(p8.toLowerCase.contains("leftsemi"),
      s"q8's ASIA-customer and PROMO-part restrictions must stay semi-joins:\n$p8")
    assert(p8.contains("BroadcastHashJoin"),
      "q8's nation/region dims must broadcast")
    val p17 = plan("q17_small_qty_revenue")
    assert(p17.contains("Window"),
      s"q17's per-part average must be a window, not a join-back:\n$p17")
    assert(p17.toLowerCase.contains("leftsemi"),
      "q17 must reduce lineitem to the brand's parts BEFORE the window")
    // exactly one l_partkey shuffle: the window's (the semi-join
    // broadcasts at this SF; even unbroadcast it reuses the same key)
    val partkeyShuffles =
      "hashpartitioning\\(l_partkey".r.findAllIn(p17.toLowerCase).size
    assert(partkeyShuffles <= 1,
      s"q17 must not shuffle lineitem on l_partkey twice:\n$p17")
    val p19 = plan("q19_disjunctive_revenue")
    assert(p19.contains("In(p_brand"),
      s"q19's implied brand prefilter must reach the part scan:\n$p19")
    assert(p19.contains("LessThanOrEqual(l_quantity,30.0)"),
      s"q19's implied quantity prefilter must reach the lineitem scan:\n$p19")
  }
}
