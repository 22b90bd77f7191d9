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

  val all: Seq[Q] = Seq(qSetOps, qRollup, qPivot, qWindowFuncs)
}
