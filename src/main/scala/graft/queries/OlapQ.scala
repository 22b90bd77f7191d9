package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.sources.Tables
import Num._

/** General OLAP surface beyond the reference's own operator set — the
  * breadth a user migrating real analytical workloads onto the engine
  * expects: set operations, ROLLUP hierarchies, pivoting, and the full
  * ranking/offset window family. All oracle-checked.
  */
object OlapQ {

  /** INTERSECT / EXCEPT (distinct set semantics): customer nations
    * that do vs don't place urgent orders.
    */
  val qSetOps: Q = Q.sql(
    "q_set_ops",
    """WITH all_n AS (SELECT DISTINCT c_nationkey AS k FROM customer),
      |urgent_n AS (
      |  SELECT DISTINCT c.c_nationkey AS k
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |  WHERE o.o_orderpriority = '1-URGENT')
      |SELECT 'both' AS bucket, k FROM (SELECT k FROM all_n INTERSECT SELECT k FROM urgent_n)
      |UNION ALL
      |SELECT 'only_quiet' AS bucket, k FROM (SELECT k FROM all_n EXCEPT SELECT k FROM urgent_n)
      |ORDER BY bucket ASC, k ASC""".stripMargin) { (s, d) =>
    val allN = Tables.customer(s, d).select(col("c_nationkey").as("k")).distinct()
    val urgentN = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("c_nationkey").as("k")).distinct()
    allN.intersect(urgentN).select(lit("both").as("bucket"), col("k"))
      .unionByName(allN.except(urgentN).select(lit("only_quiet").as("bucket"), col("k")))
      .orderBy(col("bucket").asc, col("k").asc)
  }

  /** GROUP BY ROLLUP over the region→nation hierarchy with grouping
    * level markers — subtotals and the grand total in one pass.
    */
  val qRollup: Q = Q.sql(
    "q_rollup",
    s"""SELECT
       |  CASE WHEN GROUPING(r.r_name) = 1 THEN NULL ELSE r.r_name END AS region,
       |  CASE WHEN GROUPING(n.n_name) = 1 THEN NULL ELSE n.n_name END AS nation,
       |  CAST(GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS INT) AS lvl,
       |  COUNT(*) AS n_customers,
       |  ${Num.sqlDsum("c.c_acctbal")} AS sum_bal
       |FROM customer c
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |GROUP BY ROLLUP (r.r_name, n.n_name)
       |ORDER BY lvl ASC, region ASC NULLS FIRST, nation ASC NULLS FIRST""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_bal"),
        (grouping(col("r_name")) * 2 + grouping(col("n_name")))
          .cast(IntegerType).as("lvl"))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        col("lvl"), col("n_customers"), col("sum_bal"))
      .orderBy(col("lvl").asc, col("region").asc_nulls_first,
        col("nation").asc_nulls_first)
  }

  /** Pivot: order counts per nation × order status as a wide matrix
    * (groupBy.pivot with a pinned column set; oracle = conditional
    * aggregation, the portable pivot form).
    */
  val qPivot: Q = Q.sql(
    "q_pivot",
    """SELECT n.n_name,
      |  CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
      |  CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
      |  CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |GROUP BY n.n_name
      |ORDER BY n_name ASC""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(coalesce(count(lit(1)), lit(0L)))
      .na.fill(0L, Seq("F", "O", "P"))
      .select(col("n_name"), col("F").as("status_f"), col("O").as("status_o"),
        col("P").as("status_p"))
      .orderBy(col("n_name").asc)
  }

  /** The ranking/offset window family in one pass: rank, dense_rank,
    * ntile, lag/lead, percent_rank — per-nation customer balances.
    */
  val qWindowFuncs: Q = Q.sql(
    "q_window_funcs",
    """SELECT c_nationkey, c_custkey,
      |  CAST(rank() OVER w AS INT) AS rnk,
      |  CAST(dense_rank() OVER w AS INT) AS drnk,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  lag(c_custkey, 1) OVER w AS prev_cust,
      |  lead(c_custkey, 1) OVER w AS next_cust,
      |  round(percent_rank() OVER w, 6) AS pct_rank
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey ASC)
      |ORDER BY c_nationkey ASC, rnk ASC, c_custkey ASC""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, d).select(
      col("c_nationkey"), col("c_custkey"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      ntile(4).over(w).as("quartile"),
      lag(col("c_custkey"), 1).over(w).as("prev_cust"),
      lead(col("c_custkey"), 1).over(w).as("next_cust"),
      round(percent_rank().over(w), 6).as("pct_rank"))
      .orderBy(col("c_nationkey").asc, col("rnk").asc, col("c_custkey").asc)
  }

  /** CUBE: all 2^2 grouping combinations of (status, priority) in one
    * pass — completes the ROLLUP/PIVOT/CUBE trio. Same one-Expand
    * physical shape as ROLLUP (each input row expands to 4 grouping
    * tuples, then a single hash aggregate), so the cost is 4× the
    * grouped row count, never a per-level re-scan.
    */
  val qCube: Q = Q.sql(
    "q_cube",
    s"""SELECT
       |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN NULL ELSE o_orderstatus END AS status,
       |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN NULL ELSE o_orderpriority END AS priority,
       |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS lvl,
       |  COUNT(*) AS n_orders,
       |  ${Num.sqlDsum("o_totalprice")} AS sum_price
       |FROM orders
       |GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY lvl ASC, status ASC NULLS FIRST, priority ASC NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"),
        (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
          .cast(IntegerType).as("lvl"))
      .select(col("o_orderstatus").as("status"), col("o_orderpriority").as("priority"),
        col("lvl"), col("n_orders"), col("sum_price"))
      .orderBy(col("lvl").asc, col("status").asc_nulls_first,
        col("priority").asc_nulls_first)
  }

  /** Time-series gap filling (resampling): monthly order counts per
    * priority with missing months materialized as 0 — the dense-grid
    * shape every downstream time-series consumer (forecasting,
    * charting) needs. The month spine is `sequence()` + `explode` over
    * the global [min, max] bounds; the grid (priorities × months) is
    * dims-sized — tiny — and joins the PRE-AGGREGATED monthly counts,
    * so the fact table is reduced by a partial-agg shuffle before any
    * join and the fill itself never touches raw rows.
    */
  val qTimeFill: Q = Q.sql(
    "q_time_fill",
    """WITH o AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |         o_orderpriority AS priority
      |  FROM orders),
      |bounds AS (SELECT min(month) AS lo, max(month) AS hi FROM o),
      |months AS (
      |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
      |    CAST(hi AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS month
      |  FROM bounds),
      |dims AS (SELECT DISTINCT priority FROM o),
      |counts AS (SELECT priority, month, COUNT(*) AS n_orders FROM o GROUP BY 1, 2)
      |SELECT d.priority, m.month, COALESCE(c.n_orders, 0) AS n_orders
      |FROM dims d CROSS JOIN months m
      |LEFT JOIN counts c ON c.priority = d.priority AND c.month = m.month
      |ORDER BY d.priority ASC, m.month ASC""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .select(date_trunc("month", col("o_orderdate")).cast(DateType).as("month"),
        col("o_orderpriority").as("priority"))
    val months = o.agg(min("month").as("lo"), max("month").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 month")))
        .as("month"))
    val grid = o.select("priority").distinct().crossJoin(broadcast(months))
    val counts = o.groupBy("priority", "month").agg(count(lit(1)).as("n_orders"))
    grid.join(counts, Seq("priority", "month"), "left")
      .select(col("priority"), col("month"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy(col("priority").asc, col("month").asc)
  }

  val all: Seq[Q] = Seq(qSetOps, qRollup, qPivot, qWindowFuncs, qCube, qTimeFill)
}
