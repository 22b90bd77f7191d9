package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Hand-computed ground truth for the round-8 TPC-H additions (Q4, Q6,
  * Q10, Q13, Q14, Q22 shapes) on a planted five-table micro-warehouse
  * where every aggregate is checkable by hand, plus plan audits of the
  * shapes each query exists to exercise (semi-join, anti-join,
  * TakeOrderedAndProject, broadcast dims) on the real corpus.
  */
class TpchCanonSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("tpch_fix").toString
    Seq((0L, "A", 0L), (1L, "B", 0L), (11L, "C", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$d/nation.parquet")
    Seq(
      (1L, "C1", 0L, 1000.0, "BUILDING"),
      (2L, "C2", 0L, 3000.0, "BUILDING"),
      (3L, "C3", 1L, 5000.0, "AUTOMOBILE"),
      (4L, "C4", 1L, -50.0, "BUILDING"),
      (5L, "C5", 11L, 9999.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    Seq(
      (100L, 1L, "O", 1000.0, ts("1996-02-01"), "2-HIGH"),
      (101L, 1L, "O", 2000.0, ts("1996-03-15"), "1-URGENT"),
      (102L, 2L, "O", 800.0, ts("1996-06-30"), "5-LOW"),
      (103L, 2L, "O", 500.0, ts("1998-02-01"), "1-URGENT"),
      (104L, 3L, "F", 100.0, ts("1995-01-01"), "3-MEDIUM"),
      (105L, 3L, "O", 500.0, ts("1996-01-10"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    Seq(
      (100L, 2L, 1L, 1L, 10.0, 1000.0, 0.06, 0.0, "R", "O", ts("1996-02-15")),
      (100L, 1L, 1L, 2L, 5.0, 200.0, 0.00, 0.0, "N", "O", ts("1996-03-10")),
      (101L, 2L, 1L, 1L, 30.0, 2000.0, 0.06, 0.0, "N", "O", ts("1996-06-01")),
      (101L, 2L, 1L, 2L, 4.0, 300.0, 0.00, 0.0, "N", "O", ts("1996-03-20")),
      (102L, 2L, 1L, 1L, 7.0, 800.0, 0.04, 0.0, "A", "O", ts("1996-07-05")),
      // order 104 (the only 'F' order): supplier 1 ships 90 days late,
      // supplier 2 on time -> the q21 "only late supplier" pattern
      (104L, 2L, 1L, 1L, 9.0, 100.0, 0.06, 0.0, "N", "F", ts("1995-04-01")),
      (104L, 2L, 2L, 2L, 5.0, 150.0, 0.00, 0.0, "N", "F", ts("1995-01-20")),
      (105L, 2L, 1L, 1L, 23.0, 500.0, 0.05, 0.0, "R", "O", ts("1996-04-15")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    Seq((1L, "S1", 0L, 100.0), (2L, "S2", 0L, 200.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$d/supplier.parquet")
    Seq((1L, "P1", "B", "PROMO", 1L, 100.0), (2L, "P2", "B", "STANDARD", 1L, 100.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$d/part.parquet")
    d
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, dir).collect()

  test("q4: only orders with a >60-day-late line survive the correlated semi-join") {
    // window = 1996 H1: orders 100,101,102,105; late lines only in 101
    // (78 days) and 105 (96 days)
    val rows = run("q4_order_priority").map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("1-URGENT", 1L), ("2-HIGH", 1L)))
  }

  test("q6: range predicates select exactly the two qualifying lines") {
    // 1000*0.06 + 500*0.05 = 85.00; the qty-30 and disc-0.04/0.00
    // lines and the 1995 shipment are all excluded
    val r = run("q6_forecast_revenue").head
    assert(r.getDouble(0) == 85.0 && r.getLong(1) == 2L)
  }

  test("q10: returned revenue per customer, ordered, with the right nation") {
    // Q1-1996 orders: 100, 101, 105; 'R' lines: 100-1 (940.00 to C1),
    // 105-1 (475.00 to C3)
    val rows = run("q10_returned_items")
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getString(4)))
    assert(rows.toSeq == Seq(
      (1L, "C1", 940.0, 1000.0, "A"),
      (3L, "C3", 475.0, 5000.0, "B")))
  }

  test("q13: the filtered left join keeps zero-order customers in the distribution") {
    // non-urgent counts: C1=1, C2=1, C3=2, C4=0, C5=0
    val rows = run("q13_customer_distribution")
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 2L), (0L, 2L), (2L, 1L)))
  }

  test("q14: promo share of March revenue") {
    // March shipments: 200.00 PROMO + 300.00 STANDARD -> 40%
    val r = run("q14_promo_revenue").head
    assert(r.getDouble(0) == 200.0 && r.getDouble(1) == 500.0 &&
      r.getDouble(2) == 40.0)
  }

  test("q22: above-average balance and no recent urgent order") {
    // avg positive balance in nations < 10 = (1000+3000+5000)/3 = 3000;
    // only C3 (5000.00) clears it AND has no 1998+ urgent order (C2's
    // order 103 disqualifies C2 even before the threshold)
    val rows = run("q22_global_sales_opp")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1L, 1L, 5000.0)))
  }

  test("q15: the max-of-aggregate equality join finds the quarter's top supplier") {
    // Q1-1996 shipments are all supplier 1: 940 + 200 + 300 = 1440.00
    val rows = run("q15_top_supplier")
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1L, "S1", 1440.0)))
  }

  test("q21: only the sole-late supplier on the multi-supplier finished order waits") {
    // order 104 ('F', two suppliers): supplier 1 late (90 days),
    // supplier 2 on time -> numwait 1 for S1, nothing for S2; the 'O'
    // orders never qualify
    val rows = run("q21_suppliers_waiting")
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "S1", 1L)))
  }

  test("grouping sets: per-nation and per-segment totals from one pass, correct lvl markers") {
    // sets ((n_name),(c_mktsegment)): lvl 1 rows = nations (A: C1+C2,
    // B: C3+C4, C: C5); lvl 2 rows = segments (BUILDING: C1,C2,C4,C5;
    // AUTOMOBILE: C3)
    val rows = run("q_grouping_sets")
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      (Some("A"), None, 1, 2L, 4000.0),
      (Some("B"), None, 1, 2L, 4950.0),
      (Some("C"), None, 1, 1L, 9999.0),
      (None, Some("AUTOMOBILE"), 2, 1L, 5000.0),
      (None, Some("BUILDING"), 2, 4L, 13949.0)))
  }

  test("bag set ops: EXCEPT ALL subtracts multiplicities, INTERSECT ALL takes the min") {
    // a = nationkeys of acctbal>0 = {0,0,1,11}; b = acctbal>5000 = {11}
    val rows = run("q_set_ops_all")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      ("except_all", 0L, 2L), ("except_all", 1L, 1L),
      ("intersect_all", 11L, 1L)))
  }

  test("plan shapes on the real corpus: semi, anti, topk, broadcast dim") {
    def plan(name: String) =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
    val p4 = plan("q4_order_priority")
    assert(p4.toLowerCase.contains("leftsemi"),
      s"q4 must stay a semi-join (lineitem matches never materialize):\n$p4")
    val p10 = plan("q10_returned_items")
    assert(p10.contains("TakeOrderedAndProject"),
      "q10's LIMIT 20 must lower to TakeOrderedAndProject, not a global sort")
    assert(p10.contains("BroadcastHashJoin"), "q10's nation dim must broadcast")
    val p22 = plan("q22_global_sales_opp")
    assert(p22.toLowerCase.contains("leftanti"),
      s"q22's NOT EXISTS must stay an anti-join:\n$p22")
    val p6 = plan("q6_forecast_revenue")
    // a concrete pushed predicate, not just the (possibly empty)
    // PushedFilters bracket — "PushedFilters: []" prints even when
    // nothing pushes
    assert(p6.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"q6's predicates must reach the parquet scan:\n$p6")
    assert(p6.contains("ReadSchema: struct<l_quantity"),
      "q6's scan must prune to the four referenced columns")
  }
}
