package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.transform.Ops
import Num._

/** Core relational operator catalog (SURVEY.md §2.3–2.5) expressed over
  * the driver testdata tables, each with a DuckDB oracle.
  *
  * Scale notes (100 TB design intent, verified at sf0.1):
  *   - aggregations are plain `groupBy().agg()` → partial (map-side)
  *     aggregation + single shuffle on the group keys;
  *   - dim⋈fact joins broadcast the dim side (nation/region/customer are
  *     thousands of rows even at SF 100k); fact⋈fact joins shuffle on the
  *     join key and AQE handles skew;
  *   - top-k uses orderBy+limit → TakeOrderedAndProject (per-partition
  *     heap, no global sort);
  *   - windows partition on high-cardinality keys (custkey/suppkey) so
  *     state per key is small and the shuffle is even.
  */
object Relational {

  /** TPC-H Q1-style pricing summary (A1/A5/A7 + P6 arithmetic).
    * Ref semantics: SURVEY.md §2.5; decimal-exact sums per Num contract.
    */
  val q1PricingSummary: Q = Q.sql(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag ASC, l_linestatus ASC""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (oneD - rate(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (oneD - rate(col("l_discount")))
          * (oneD + rate(col("l_tax")))).cast(DoubleType).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        (sum(rate(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)
  }

  /** O3 — top-k with total tie-break (TakeOrderedAndProject, no global
    * sort at scale). Ref: README.md:334-339 (ORDER BY … LIMIT 10).
    */
  val qTopkOrders: Q = Q.sql(
    "q_topk_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 10""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .transform(Ops.topK(10, Seq(col("o_totalprice").desc, col("o_orderkey").asc)))
  }

  /** W1 — latest-per-group (argmax): latest order per customer.
    * Ref: zillow transformer.py:26-29 (sort desc + first-per-key).
    */
  val qLatestPerGroup: Q = Q.sql(
    "q_latest_per_group",
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders) WHERE rn = 1
      |ORDER BY o_custkey ASC""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .transform(Ops.latestPerGroup(Seq("o_custkey"),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc)))
      .orderBy(col("o_custkey").asc)
  }

  /** W2 — keyed dedup keep-"last" (deterministic: max l_linenumber wins).
    * Ref: food transformer.py:75 (drop_duplicates keep='last').
    */
  val qDedupKeepLast: Q = Q.sql(
    "q_dedup_keep_last",
    """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity FROM (
      |  SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
      |    ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey
      |      ORDER BY l_linenumber DESC, l_quantity DESC) AS rn
      |  FROM lineitem) WHERE rn = 1
      |ORDER BY l_orderkey ASC, l_partkey ASC""".stripMargin) { (s, d) =>
    // (l_orderkey, l_partkey, l_linenumber) is NOT unique in the data —
    // l_quantity completes the total order so "last" is deterministic.
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
      .transform(Ops.dedupKeepLast(Seq("l_orderkey", "l_partkey"),
        Seq(col("l_linenumber"), col("l_quantity"))))
      .orderBy(col("l_orderkey").asc, col("l_partkey").asc)
  }

  /** J1+J4 — the food-gaps shape: dim LEFT JOIN fact, then a predicate on
    * the fact's year column — which silently turns the left join inner
    * (quirk preserved). Ref: routes.py:43-46.
    * customer = geometry dim analog, orders = fact analog.
    */
  val qLeftJoinSnapshot: Q = Q.sql(
    "q_left_join_snapshot",
    """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
      |FROM customer c
      |LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |WHERE CAST(year(o.o_orderdate) AS INT) =
      |  (SELECT MAX(CAST(year(o_orderdate) AS INT)) FROM orders)
      |ORDER BY c.c_custkey ASC, o.o_orderkey ASC""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).withColumn("o_year", year(col("o_orderdate")))
    // scalar-subquery form: the 1-row max aggregates map-side then
    // broadcasts — one plan, no driver collect, no crash on empty input
    val maxYear = o.agg(max(col("o_year")).as("max_year"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .join(broadcast(maxYear), col("o_year") === col("max_year"))
      .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc)
  }

  /** J2/J3 — inner dim⋈dim⋈fact rollup; broadcasts nation+region.
    * Ref: routes.py:82-83 (zcta⋈acs zip join).
    */
  val qJoinAggRollup: Q = Q.sql(
    "q_join_agg_rollup",
    """SELECT r.r_name, n.n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name, n.n_name
      |ORDER BY r.r_name ASC, n.n_name ASC""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("r_name").asc, col("n_name").asc)
  }

  /** J4/A1 — scalar-subquery max-snapshot filter. Ref: routes.py:45,84. */
  val qScalarSubqueryMax: Q = Q.sql(
    "q_scalar_subquery_max",
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders
      |WHERE o_orderdate = (SELECT MAX(o_orderdate) FROM orders)
      |ORDER BY o_orderkey ASC""".stripMargin) { (s, d) =>
    Tables.registerAll(s, d)
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderdate = (SELECT MAX(o_orderdate) FROM orders)
        |ORDER BY o_orderkey ASC""".stripMargin)
  }

  /** J5 — chunked-fetch union (pd.concat analog): two disjoint slices
    * unioned then aggregated. Ref: census_fetcher.py:114.
    */
  val qUnionChunks: Q = Q.sql(
    "q_union_chunks",
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM (
      |  SELECT * FROM orders WHERE o_totalprice < 100000
      |  UNION ALL
      |  SELECT * FROM orders WHERE o_totalprice >= 100000)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus ASC""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val lo = o.filter(col("o_totalprice") < 100000)
    val hi = o.filter(col("o_totalprice") >= 100000)
    lo.unionByName(hi)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus").asc)
  }

  /** Left-semi join (EXISTS): customers having at least one urgent order. */
  val qSemiJoin: Q = Q.sql(
    "q_semi_join",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey ASC""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy(col("c_custkey").asc)
  }

  /** Left-anti join (NOT EXISTS): customers with no orders at all. */
  val qAntiJoin: Q = Q.sql(
    "q_anti_join",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey ASC""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy(col("c_custkey").asc)
  }

  /** P6 — try_cast numeric coercion, null on parse failure.
    * '1-URGENT' → 1; 'F'/'O'/'P' status → NULL. Ref: food transformer.py:54-60.
    */
  val qTryCast: Q = Q.sql(
    "q_try_cast",
    """SELECT o_orderkey,
      |  TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS priority_num,
      |  TRY_CAST(o_orderstatus AS INT) AS status_num
      |FROM orders
      |ORDER BY o_orderkey ASC""".stripMargin) { (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      Ops.coerceNumeric(substring(col("o_orderpriority"), 1, 1), IntegerType)
        .as("priority_num"),
      Ops.coerceNumeric(col("o_orderstatus"), IntegerType).as("status_num"))
      .orderBy(col("o_orderkey").asc)
  }

  /** P8 — range invalidation: discount outside [0, 0.05] → NULL, with
    * explicit NULLS ordering pinned. Ref: food transformer.py:63-68.
    */
  val qRangeInvalidate: Q = Q.sql(
    "q_range_invalidate",
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN l_discount >= 0 AND l_discount <= 0.05 THEN l_discount END AS discount_valid
      |FROM lineitem
      |ORDER BY discount_valid ASC NULLS LAST, l_orderkey ASC, l_linenumber ASC""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      Ops.rangeInvalidate(col("l_discount"), 0, 0.05).as("discount_valid"))
      .orderBy(col("discount_valid").asc_nulls_last,
        col("l_orderkey").asc, col("l_linenumber").asc)
  }

  /** P9 — sentinel invalidation (negative → NULL) over a derived signed
    * value. Ref: census_acs transformer.py:29-33.
    */
  val qSentinelInvalidate: Q = Q.sql(
    "q_sentinel_invalidate",
    """SELECT event_id,
      |  CASE WHEN value - 100 >= 0 THEN value - 100 END AS value_pos
      |FROM events
      |ORDER BY event_id ASC""".stripMargin) { (s, d) =>
    Tables.events(s, d).select(
      col("event_id"),
      Ops.sentinelInvalidate(col("value") - 100).as("value_pos"))
      .orderBy(col("event_id").asc)
  }

  /** P11 — derived rate with divide-by-zero → NULL pinned (poverty_rate
    * analog): % of a customer's order spend that is urgent.
    * Ref: census_acs transformer.py:36-38.
    */
  val qDerivedRate: Q = Q.sql(
    "q_derived_rate",
    """SELECT o_custkey,
      |  round(CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
      |          THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
      |    / NULLIF(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 0) * 100, 2) AS urgent_pct
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey ASC""".stripMargin) { (s, d) =>
    val urgent = sum(when(col("o_orderpriority") === "1-URGENT",
      dec(col("o_totalprice"))).otherwise(dec(lit(0)))).cast(DoubleType)
    val total = sum(dec(col("o_totalprice"))).cast(DoubleType)
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(round(urgent / when(total =!= 0, total) * 100, 2).as("urgent_pct"))
      .orderBy(col("o_custkey").asc)
  }

  /** P12 — isin membership filter (NYC-ZIP-list analog).
    * Ref: zillow transformer.py:10-11.
    */
  val qIsinFilter: Q = Q.sql(
    "q_isin_filter",
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
      |ORDER BY c_custkey ASC""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE"))
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy(col("c_custkey").asc)
  }

  /** P13/P14 — drop-null filter + IS NOT NULL predicate over a derived
    * nullable column. Ref: zillow transformer.py:23; routes.py:85-86.
    */
  val qNotNullFilter: Q = Q.sql(
    "q_notnull_filter",
    """SELECT l_orderkey, l_linenumber, discount_valid FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN l_discount >= 0 AND l_discount <= 0.03 THEN l_discount END AS discount_valid
      |  FROM lineitem)
      |WHERE discount_valid IS NOT NULL
      |ORDER BY l_orderkey ASC, l_linenumber ASC""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      Ops.rangeInvalidate(col("l_discount"), 0, 0.03).as("discount_valid"))
      .na.drop(Seq("discount_valid"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc)
  }

  /** P15/P16 — typed-literal equality predicate + point lookup.
    * Ref: nyc_open_data_fetcher.py:67-77; App.jsx:116-117.
    */
  val qPointLookup: Q = Q.sql(
    "q_point_lookup",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
      |FROM lineitem WHERE l_orderkey = 042
      |ORDER BY l_linenumber ASC""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") === lit(42L))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
      .orderBy(col("l_linenumber").asc)
  }

  /** A4 — duplicate-key detection. Ref: parser.py:107-113. */
  val qDuplicateKeys: Q = Q.sql(
    "q_duplicate_keys",
    """SELECT l_orderkey, l_partkey, COUNT(*) AS dup_count
      |FROM lineitem
      |GROUP BY l_orderkey, l_partkey
      |HAVING COUNT(*) > 1
      |ORDER BY l_orderkey ASC, l_partkey ASC""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .transform(Ops.duplicateKeys(Seq("l_orderkey", "l_partkey")))
      .orderBy(col("l_orderkey").asc, col("l_partkey").asc)
  }

  /** A5 — out-of-range counts, one pass, map-side combinable.
    * Ref: parser.py:92-105.
    */
  val qOutOfRangeCounts: Q = Q.sql(
    "q_out_of_range_counts",
    """SELECT
      |  CAST(SUM(CASE WHEN l_quantity < 5 THEN 1 ELSE 0 END) AS BIGINT) AS l_quantity_below_min,
      |  CAST(SUM(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT) AS l_quantity_above_max,
      |  CAST(SUM(CASE WHEN l_discount < 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS l_discount_below_min,
      |  CAST(SUM(CASE WHEN l_discount > 0.06 THEN 1 ELSE 0 END) AS BIGINT) AS l_discount_above_max
      |FROM lineitem""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .transform(Ops.outOfRangeCounts(Seq(
        ("l_quantity", 5, 45), ("l_discount", 0.01, 0.06))))
  }

  /** O1 — multi-key sort with NULLS LAST (pandas na_position='last').
    * Ref: food transformer.py:81.
    */
  val qMultiKeySort: Q = Q.sql(
    "q_multi_key_sort",
    """SELECT o_orderkey, o_orderstatus,
      |  CASE WHEN o_totalprice > 50000 THEN o_totalprice END AS big_price
      |FROM orders
      |ORDER BY o_orderstatus ASC NULLS LAST, big_price ASC NULLS LAST, o_orderkey ASC""".stripMargin) { (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"), col("o_orderstatus"),
      when(col("o_totalprice") > 50000, col("o_totalprice")).as("big_price"))
      .orderBy(col("o_orderstatus").asc_nulls_last,
        col("big_price").asc_nulls_last, col("o_orderkey").asc)
  }

  /** Zillow wide→long unpivot (stack). Ref: zillow transformer.py:12-24.
    * Oracle uses UNION ALL (portable ANSI unpivot).
    */
  val qUnpivot: Q = Q.sql(
    "q_unpivot",
    """SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS metric_value FROM part
      |UNION ALL
      |SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS metric_value FROM part
      |ORDER BY p_partkey ASC, metric ASC""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .withColumn("p_size", col("p_size").cast(DoubleType))
      .transform(Ops.unpivotToLong(Seq("p_partkey"),
        Seq("p_retailprice", "p_size"), "metric", "metric_value"))
      .orderBy(col("p_partkey").asc, col("metric").asc)
  }

  /** Running window aggregate (rows-between) — beyond the reference's
    * row_number-only window use; per-supplier running quantity.
    */
  val qRunningWindow: Q = Q.sql(
    "q_running_window",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
      |    PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC,
      |      l_linenumber ASC, l_partkey ASC, l_quantity ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem
      |ORDER BY l_suppkey ASC, l_orderkey ASC, l_linenumber ASC, running_qty ASC""".stripMargin) { (s, d) =>
    // (orderkey, linenumber) is not unique → extend the frame order with
    // partkey+quantity and add running_qty as the last output sort key so
    // fully-tied rows still emit in one deterministic order.
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
        col("l_linenumber").asc, col("l_partkey").asc, col("l_quantity").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d).select(
      col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      col("l_quantity"),
      sum(dec(col("l_quantity"))).over(w).cast(DoubleType).as("running_qty"))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
      .orderBy(col("l_suppkey").asc, col("l_orderkey").asc,
        col("l_linenumber").asc, col("running_qty").asc)
  }

  /** A7 — record counts (metadata bookkeeping analog). Ref: storage.py:206. */
  val qRecordCount: Q = Q.sql(
    "q_record_count",
    """SELECT 'lineitem' AS table_name, COUNT(*) AS n FROM lineitem
      |UNION ALL SELECT 'orders' AS table_name, COUNT(*) AS n FROM orders
      |UNION ALL SELECT 'customer' AS table_name, COUNT(*) AS n FROM customer
      |ORDER BY table_name ASC""".stripMargin) { (s, d) =>
    val counts = Seq("lineitem", "orders", "customer").map { t =>
      Tables.load(s, d, t).agg(count(lit(1)).as("n"))
        .select(lit(t).as("table_name"), col("n"))
    }
    counts.reduce(_ unionByName _).orderBy(col("table_name").asc)
  }

  /** TPC-H Q5-shaped six-table join: region⋈nation⋈customer⋈orders⋈
    * lineitem⋈supplier with a local-supplier predicate and revenue
    * rollup — the join-graph stress case. Catalyst broadcasts the three
    * small dims and reorders the fact joins; the plan is the point as
    * much as the result.
    */
  val q5LocalSupplierVolume: Q = Q.sql(
    "q5_local_supplier_volume",
    """SELECT n.n_name,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM customer c
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  AND s.s_nationkey = c.c_nationkey
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |JOIN region r ON r.r_regionkey = n.n_regionkey
      |WHERE r.r_name IN ('ASIA', 'EUROPE')
      |GROUP BY n.n_name
      |ORDER BY n_name ASC""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(o, o("o_custkey") === c("c_custkey"))
      .join(l, l("l_orderkey") === o("o_orderkey"))
      .join(sup, sup("s_suppkey") === l("l_suppkey") &&
        sup("s_nationkey") === c("c_nationkey"))
      .join(broadcast(n), n("n_nationkey") === c("c_nationkey"))
      .join(broadcast(r), r("r_regionkey") === n("n_regionkey"))
      .filter(col("r_name").isin("ASIA", "EUROPE"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (oneD - rate(col("l_discount"))))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name").asc)
  }

  /** Correlated-aggregate filter: customers whose spend exceeds 2× their
    * nation's average spend — the correlated scalar subquery shape,
    * decorrelated by hand into aggregate + broadcast join (exactly what
    * Catalyst's decorrelation would produce).
    */
  val qCorrelatedAgg: Q = Q.sql(
    "q_correlated_agg",
    """WITH spend AS (
      |  SELECT c.c_custkey, c.c_nationkey,
      |    CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY c.c_custkey, c.c_nationkey),
      |nation_avg AS (
      |  SELECT c_nationkey, CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE)
      |    / COUNT(*) AS avg_total
      |  FROM spend GROUP BY c_nationkey)
      |SELECT s.c_custkey, s.total
      |FROM spend s JOIN nation_avg a ON s.c_nationkey = a.c_nationkey
      |WHERE s.total > 2 * a.avg_total
      |ORDER BY c_custkey ASC""".stripMargin) { (s, d) =>
    val spend = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_nationkey")
      .agg(dsum(col("o_totalprice")).as("total"))
    val nationAvg = spend.groupBy("c_nationkey")
      .agg((sum(col("total").cast(DecimalType(18, 2))).cast(DoubleType)
        / count(lit(1))).as("avg_total"))
    spend.join(broadcast(nationAvg), Seq("c_nationkey"))
      .filter(col("total") > lit(2) * col("avg_total"))
      .select("c_custkey", "total")
      .orderBy(col("c_custkey").asc)
  }

  /** TPC-H Q3-style shipping priority — the canonical 3-way
    * fact⋈fact⋈dim join-agg-topk: unshipped-as-of-cutoff revenue per
    * order for one market segment (o_orderpriority standing in for
    * the spec's o_shippriority, which this schema doesn't carry).
    * Revenue sums decimal-exact per the Num contract.
    *
    * Scale shape: the segment-filtered customer side (1/5 of
    * customers — corpus-sized, deliberately NOT broadcast) joins
    * orders on the custkey hash; lineitem joins on the orderkey hash;
    * both are the natural co-partitioned fact joins with AQE free to
    * re-plan either side at runtime. The top-10 lowers to
    * TakeOrderedAndProject — no global sort.
    */
  val q3ShippingPriority: Q = Q.sql(
    "q3_shipping_priority",
    """SELECT l.l_orderkey,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  CAST(o.o_orderdate AS DATE) AS order_date, o.o_orderpriority
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND CAST(o.o_orderdate AS DATE) < DATE '1998-06-01'
      |  AND CAST(l.l_shipdate AS DATE) > DATE '1998-06-01'
      |GROUP BY 1, 3, 4
      |ORDER BY revenue DESC, order_date ASC, l_orderkey ASC
      |LIMIT 10""".stripMargin) { (s, d) =>
    val cutoff = to_date(lit("1998-06-01"))
    val c = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate").cast(DateType) < cutoff)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast(DateType).as("order_date"),
        col("o_orderpriority"))
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate").cast(DateType) > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "order_date", "o_orderpriority")
      .agg(sum(dec(col("l_extendedprice")) * (oneD - rate(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("order_date"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("order_date").asc,
        col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q7-style cross-nation volume — the deepest join tree in
    * the catalog (lineitem ⋈ supplier ⋈ orders ⋈ customer ⋈ nation×2):
    * decimal-exact revenue flowing between every ordered pair of
    * DISTINCT (supplier-nation, customer-nation) per ship year — the
    * trade-flow matrix behind every "volume shipping" report.
    *
    * Scale shape: the two nation dims broadcast (25 rows); the three
    * fact joins hash on their natural keys (suppkey, orderkey,
    * custkey) with AQE free to re-plan; the final rollup is
    * |nations|² × years-sized after a map-side combine. No join in
    * the tree carries more than one corpus-sized side.
    */
  val q7NationVolume: Q = Q.sql(
    "q7_nation_volume",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS ship_year,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      |WHERE n1.n_nationkey <> n2.n_nationkey
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation ASC, cust_nation ASC, ship_year ASC""".stripMargin) { (s, d) =>
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_discount"), year(col("l_shipdate")).as("ship_year"))
      .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("s_nk") =!= col("c_nk"))
      .groupBy("supp_nation", "cust_nation", "ship_year")
      .agg(sum(dec(col("l_extendedprice")) * (oneD - rate(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("supp_nation").asc, col("cust_nation").asc,
        col("ship_year").asc)
  }

  val all: Seq[Q] = Seq(
    q1PricingSummary, qTopkOrders, qLatestPerGroup, qDedupKeepLast,
    qLeftJoinSnapshot, qJoinAggRollup, qScalarSubqueryMax, qUnionChunks,
    qSemiJoin, qAntiJoin, qTryCast, qRangeInvalidate, qSentinelInvalidate,
    qDerivedRate, qIsinFilter, qNotNullFilter, qPointLookup, qDuplicateKeys,
    qOutOfRangeCounts, qMultiKeySort, qUnpivot, qRunningWindow, qRecordCount,
    q5LocalSupplierVolume, qCorrelatedAgg, q3ShippingPriority, q7NationVolume)
}
