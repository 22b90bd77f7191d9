package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.transform.Ops
import Num._

/** Client-side analytics reproduced as engine queries (SURVEY.md §2.8)
  * plus the canonical §2.6 query shapes re-expressed over the testdata
  * star schema. All dims broadcast; facts aggregate with map-side
  * partials before the single key shuffle.
  */
object Analytics {

  /** C1 — rent-burden analog: derived ratio across a join. For each
    * customer with a positive balance: total spend / acctbal ratio.
    * Ref: Dashboard.jsx:32-35.
    */
  val qBurdenRatio: Q = Q.sql(
    "q_burden_ratio",
    """SELECT c.c_custkey,
      |  round(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
      |    / NULLIF(CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) AS DOUBLE), 0) * 100, 2) AS spend_to_bal_pct
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |WHERE c.c_acctbal > 0
      |GROUP BY c.c_custkey, c.c_acctbal
      |ORDER BY c.c_custkey ASC""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d).filter(col("c_acctbal") > 0)
    val o = Tables.orders(s, d)
    val bal = dec(col("c_acctbal")).cast(DoubleType)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy(c("c_custkey"), c("c_acctbal"))
      .agg(round(dsum(col("o_totalprice")) / when(bal =!= 0, bal) * 100, 2)
        .as("spend_to_bal_pct"))
      .select(col("c_custkey"), col("spend_to_bal_pct"))
      .orderBy(col("c_custkey").asc)
  }

  /** C3 — choropleth binning: breakpoints → bin index, counts per bin.
    * Ref: App.jsx:162-253.
    */
  val qBinBreaks: Q = Q.sql(
    "q_bin_breaks",
    """SELECT CASE
      |    WHEN o_totalprice >= 300000 THEN 4
      |    WHEN o_totalprice >= 200000 THEN 3
      |    WHEN o_totalprice >= 100000 THEN 2
      |    WHEN o_totalprice >= 50000 THEN 1
      |    ELSE 0 END AS price_bin,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY 1
      |ORDER BY price_bin ASC""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .withColumn("price_bin",
        Ops.binByBreaks(col("o_totalprice"), Seq(0, 50000, 100000, 200000, 300000)))
      .groupBy("price_bin")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("price_bin").asc)
  }

  /** C5 — threshold classification (when-chain). Ref: Dashboard.jsx:60-64. */
  val qClassify: Q = Q.sql(
    "q_classify",
    """SELECT CASE
      |    WHEN c_acctbal >= 9000 THEN 'high'
      |    WHEN c_acctbal >= 5000 THEN 'medium'
      |    ELSE 'low' END AS bal_class,
      |  COUNT(*) AS n
      |FROM customer
      |GROUP BY 1
      |ORDER BY bal_class ASC""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .withColumn("bal_class", Ops.classify(col("c_acctbal"),
        Seq((9000.0, "high"), (5000.0, "medium")), "low"))
      .groupBy("bal_class")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bal_class").asc)
  }

  /** C6 — first-feature extraction (data vintage). Ref: App.jsx:325-341. */
  val qFirstFeature: Q = Q.sql(
    "q_first_feature",
    """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS vintage_year
      |FROM orders
      |ORDER BY o_orderdate DESC, o_orderkey ASC
      |LIMIT 1""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("vintage_year"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      .limit(1)
  }

  /** §2.6 #2 poverty-by-zip analog: inner join + latest-snapshot filter +
    * not-null guards + derived columns, Feature-properties shape.
    * Ref: routes.py:63-87.
    */
  val qSnapshotJoin: Q = Q.sql(
    "q_snapshot_join",
    """SELECT n.n_name AS zone_name, CAST(year(o.o_orderdate) AS INT) AS year,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |WHERE CAST(year(o.o_orderdate) AS INT) =
      |    (SELECT MAX(CAST(year(o_orderdate) AS INT)) FROM orders)
      |  AND o.o_totalprice IS NOT NULL
      |GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
      |ORDER BY zone_name ASC""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val o = Tables.orders(s, d).withColumn("year", year(col("o_orderdate")))
    // single-plan scalar max via broadcast join (no driver-side collect)
    val maxYear = o.agg(max(col("year")).as("max_year"))
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(o, o("o_custkey") === c("c_custkey"))
      .join(broadcast(maxYear), col("year") === col("max_year"))
      .filter(col("o_totalprice").isNotNull)
      .groupBy(col("n_name"), col("year"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spend"))
      .select(col("n_name").as("zone_name"), col("year"), col("n_orders"),
        col("total_spend"))
      .orderBy(col("zone_name").asc)
  }

  /** A2/A3 — Feature struct construction + JSON serialization (the
    * GeoJSON FeatureCollection building blocks). Integer-only payload so
    * the JSON text is engine-stable. Ref: routes.py:24-42.
    */
  val qFeatureJson: Q = Q.sql(
    "q_feature_json",
    """SELECT n.n_name,
      |  CAST(json_object('type', 'Feature', 'name', n.n_name, 'customers', cnt) AS VARCHAR) AS feature
      |FROM (SELECT n_name, n_nationkey FROM nation) n
      |JOIN (SELECT c_nationkey, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey) c
      |  ON n.n_nationkey = c.c_nationkey
      |ORDER BY n.n_name ASC""".stripMargin) { (s, d) =>
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d).groupBy("c_nationkey")
      .agg(count(lit(1)).as("cnt"))
    n.join(broadcast(c), n("n_nationkey") === c("c_nationkey"))
      .select(col("n_name"),
        to_json(struct(lit("Feature").as("type"), col("n_name").as("name"),
          col("cnt").as("customers"))).as("feature"))
      .orderBy(col("n_name").asc)
  }

  /** C2 — user-vs-neighborhood comparison (ComparisonTool.jsx:118-128):
    * a parameterized scalar query grading fixed user inputs against
    * every zone's aggregates — income ratio, spend diff, both burden
    * ratios. Decimal-exact sums; IEEE division of identical operands.
    */
  val qComparison: Q = {
    val userIncome = 75000
    val userSpend = 33600
    Q.sql(
      "q_comparison",
      s"""SELECT n.n_name AS zone,
         |  round($userIncome / (${Num.sqlDsum("c.c_acctbal")} / COUNT(*)) * 100, 2) AS income_ratio_pct,
         |  round($userSpend - (${Num.sqlDsum("o.o_totalprice")} / COUNT(*)), 2) AS spend_diff,
         |  round(CAST($userSpend AS DOUBLE) / $userIncome * 100, 2) AS user_burden_pct,
         |  round((${Num.sqlDsum("o.o_totalprice")} / COUNT(*))
         |    / (${Num.sqlDsum("c.c_acctbal")} / COUNT(*)) * 100, 2) AS zone_burden_pct
         |FROM customer c
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN orders o ON o.o_custkey = c.c_custkey
         |GROUP BY n.n_name
         |HAVING ${Num.sqlDsum("c.c_acctbal")} <> 0
         |ORDER BY zone ASC""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val o = Tables.orders(s, d)
      val avgBal = dsum(col("c_acctbal")) / count(lit(1))
      val avgSpend = dsum(col("o_totalprice")) / count(lit(1))
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(o, o("o_custkey") === c("c_custkey"))
        .groupBy(col("n_name"))
        .agg(
          round(lit(userIncome) / avgBal * 100, 2).as("income_ratio_pct"),
          round(lit(userSpend) - avgSpend, 2).as("spend_diff"),
          round(lit(userSpend).cast(DoubleType) / userIncome * 100, 2)
            .as("user_burden_pct"),
          round(avgSpend / avgBal * 100, 2).as("zone_burden_pct"),
          dsum(col("c_acctbal")).as("__bal"))
        .filter(col("__bal") =!= 0)
        .select(col("n_name").as("zone"), col("income_ratio_pct"),
          col("spend_diff"), col("user_burden_pct"), col("zone_burden_pct"))
        .orderBy(col("zone").asc)
    }
  }

  /** A6 — summary statistics (describe() analog, ingest_data.py:108-116)
    * over lineitem measures: explicit count/min/max/decimal-exact mean
    * per column rather than .describe() (whose stddev strings aren't
    * engine-portable), emitted one row per column.
    */
  val qSummaryStats: Q = Q.sql(
    "q_summary_stats",
    s"""SELECT 'l_quantity' AS column_name, COUNT(*) AS n,
       |  CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
       |  CAST(MAX(l_quantity) AS DOUBLE) AS max_v,
       |  ${Num.sqlDavg("l_quantity")} AS mean_v
       |FROM lineitem
       |UNION ALL
       |SELECT 'l_extendedprice' AS column_name, COUNT(*) AS n,
       |  CAST(MIN(l_extendedprice) AS DOUBLE) AS min_v,
       |  CAST(MAX(l_extendedprice) AS DOUBLE) AS max_v,
       |  ${Num.sqlDavg("l_extendedprice")} AS mean_v
       |FROM lineitem
       |ORDER BY column_name ASC""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    def statsOf(c: String) =
      li.agg(
        count(lit(1)).as("n"),
        min(col(c)).cast(DoubleType).as("min_v"),
        max(col(c)).cast(DoubleType).as("max_v"),
        davg(col(c)).as("mean_v"))
        .select(lit(c).as("column_name"), col("n"), col("min_v"), col("max_v"),
          col("mean_v"))
    statsOf("l_quantity").unionByName(statsOf("l_extendedprice"))
      .orderBy(col("column_name").asc)
  }

  /** Typed bounded top-k per group via the TopKAggregator
    * (Aggregator[IN,BUF,OUT] → ObjectHashAggregate with O(k) state per
    * group and partial merge — collect_list-free; see the aggregator's
    * scale doc). Top-3 orders per market segment.
    */
  val qTopkPerGroup: Q = Q.sql(
    "q_topk_per_group",
    """SELECT c_mktsegment, CAST(rn - 1 AS INT) AS pos, o_totalprice, o_orderkey
      |FROM (
      |  SELECT c.c_mktsegment, o.o_totalprice, o.o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
      |      ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rn
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey)
      |WHERE rn <= 3
      |ORDER BY c_mktsegment ASC NULLS FIRST, pos ASC""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val topk = udaf(graft.functions.TopKAggregator(3),
      ExpressionEncoder[(Double, Long)]())
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("topk"))
      .select(col("c_mktsegment"), posexplode(col("topk")))
      .select(col("c_mktsegment"), col("pos").cast(IntegerType).as("pos"),
        col("col._1").as("o_totalprice"), col("col._2").as("o_orderkey"))
      .orderBy(col("c_mktsegment").asc, col("pos").asc)
  }

  /** The same per-group top-k semantics as [[qTopkPerGroup]], executed
    * by the engine's own physical operator (graft.plans.TopKPerGroup:
    * LogicalPlan + SparkStrategy + bounded-heap SparkPlan pair injected
    * via SparkSessionExtensions) instead of an aggregate or a window —
    * the whole-operator tier of the custom-operator ladder. Top-2
    * suppliers per nation by account balance; shuffle volume is
    * |partitions|·|nations|·2 rows, and nothing larger than k is ever
    * sorted (see the operator's scaladoc for the contract and the
    * disclosed memory bound).
    */
  val qTopkPerGroupNative: Q = Q.sql(
    "q_topk_per_group_native",
    """SELECT s_nationkey, CAST(rn AS INT) AS rank, s_suppkey, s_acctbal
      |FROM (
      |  SELECT s_nationkey, s_suppkey, s_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY s_nationkey
      |      ORDER BY s_acctbal DESC, s_suppkey ASC) AS rn
      |  FROM supplier)
      |WHERE rn <= 2
      |ORDER BY s_nationkey ASC, rank ASC""".stripMargin) { (s, d) =>
    graft.plans.TopKPerGroup(
      Tables.supplier(s, d).select("s_nationkey", "s_suppkey", "s_acctbal"),
      groupCols = Seq("s_nationkey"),
      orderBy = Seq(("s_acctbal", true), ("s_suppkey", false)),
      k = 2)
      .select(col("s_nationkey"), col("rank"), col("s_suppkey"), col("s_acctbal"))
      .orderBy(col("s_nationkey").asc, col("rank").asc)
  }

  val all: Seq[Q] = Seq(
    qBurdenRatio, qBinBreaks, qClassify, qFirstFeature, qSnapshotJoin,
    qFeatureJson, qComparison, qSummaryStats, qTopkPerGroup,
    qTopkPerGroupNative)
}
