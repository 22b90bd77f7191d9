package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

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

  /** GROUPING SETS with ARBITRARY (non-hierarchical) sets — the
    * rollup/cube sibling the pair can't express: per-nation totals
    * AND per-segment totals in ONE Expand-based pass (a union of two
    * grouped aggregates would scan the join twice). Spark 4's native
    * `Dataset.groupingSets` keeps it declarative on the engine side.
    */
  val qGroupingSets: Q = Q.sql(
    "q_grouping_sets",
    s"""SELECT
       |  CASE WHEN GROUPING(n.n_name) = 1 THEN NULL ELSE n.n_name END AS nation,
       |  CASE WHEN GROUPING(c.c_mktsegment) = 1 THEN NULL ELSE c.c_mktsegment END AS segment,
       |  CAST(GROUPING(n.n_name) * 2 + GROUPING(c.c_mktsegment) AS INT) AS lvl,
       |  COUNT(*) AS n_customers,
       |  ${Num.sqlDsum("c.c_acctbal")} AS sum_bal
       |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       |GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment))
       |ORDER BY lvl ASC, nation ASC NULLS FIRST, segment ASC NULLS FIRST""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupingSets(Seq(Seq(col("n_name")), Seq(col("c_mktsegment"))),
        col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_bal"),
        (grouping(col("n_name")) * 2 + grouping(col("c_mktsegment")))
          .cast(IntegerType).as("lvl"))
      .select(col("n_name").as("nation"), col("c_mktsegment").as("segment"),
        col("lvl"), col("n_customers"), col("sum_bal"))
      .orderBy(col("lvl").asc, col("nation").asc_nulls_first,
        col("segment").asc_nulls_first)
  }

  /** EXCEPT ALL / INTERSECT ALL — BAG semantics, which the distinct
    * set ops of [[qSetOps]] cannot express: multiplicities subtract
    * (A ∖ B keeps count_A − count_B copies) and take the minimum
    * respectively. The multisets here are customer nation keys above
    * two balance thresholds, so per nation EXCEPT ALL yields exactly
    * the mid-balance population — verified value-for-value by the
    * post-aggregation (the aggregate compacts output; the operator
    * under test is the bag op itself).
    */
  val qSetOpsAll: Q = Q.sql(
    "q_set_ops_all",
    """WITH a AS (SELECT c_nationkey FROM customer WHERE c_acctbal > 0),
      |b AS (SELECT c_nationkey FROM customer WHERE c_acctbal > 5000),
      |diff AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b),
      |inter AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
      |SELECT 'except_all' AS op, c_nationkey, COUNT(*) AS n
      |FROM diff GROUP BY c_nationkey
      |UNION ALL
      |SELECT 'intersect_all' AS op, c_nationkey, COUNT(*) AS n
      |FROM inter GROUP BY c_nationkey
      |ORDER BY op ASC, c_nationkey ASC""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    val a = cust.filter(col("c_acctbal") > 0).select("c_nationkey")
    val b = cust.filter(col("c_acctbal") > 5000).select("c_nationkey")
    def agg(df: org.apache.spark.sql.DataFrame, op: String) =
      df.groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .select(lit(op).as("op"), col("c_nationkey"), col("n"))
    agg(a.exceptAll(b), "except_all")
      .unionByName(agg(a.intersectAll(b), "intersect_all"))
      .orderBy(col("op").asc, col("c_nationkey").asc)
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
      |ORDER BY d.priority ASC NULLS FIRST, m.month ASC""".stripMargin) { (s, d) =>
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

  /** The Morton interleave as DuckDB SQL, generated from the same bit
    * layout as [[graft.expressions.MortonInterleave]] (position 2i for
    * y's bit i, 2i+1 for x's) so the two can never drift.
    */
  private def mortonZSql(x: String, y: String): String =
    (0 until 16).map(i =>
      s"((($x >> $i) & 1) << ${2 * i + 1}) | ((($y >> $i) & 1) << ${2 * i})")
      .mkString(" | ")

  /** The order-16 Hilbert walk as DuckDB SQL — the same per-bit
    * quadrant+rotation recurrence as
    * [[graft.expressions.HilbertIndex.index]], unrolled into 16
    * chained CTEs (h0…h16; SQL has no loops) carrying the rotating
    * frame (x_k, y_k) and accumulated position d_k. Emits a final CTE
    * named `outCte(l_orderkey, l_linenumber, p, day, z)` reading
    * x/y from `norm`. The (3·rx) xor ry quadrant offset is spelled
    * CASE rx=1 → 3−ry (identical on the {0,1}² domain) to stay inside
    * portable integer SQL.
    */
  private def hilbertChainSql(outCte: String): String = {
    val steps = (0 until 16).map { k =>
      val s = 1L << (15 - k)
      val s2 = s * s
      val rxPos = s"(x$k & $s) > 0"
      val ryZero = s"(y$k & $s) = 0"
      val ryBit = s"(CASE WHEN (y$k & $s) > 0 THEN 1 ELSE 0 END)"
      s"""h${k + 1} AS (
         |  SELECT l_orderkey, l_linenumber, p, day,
         |    CASE WHEN $ryZero THEN
         |      CASE WHEN $rxPos THEN 65535 - y$k ELSE y$k END
         |    ELSE x$k END AS x${k + 1},
         |    CASE WHEN $ryZero THEN
         |      CASE WHEN $rxPos THEN 65535 - x$k ELSE x$k END
         |    ELSE y$k END AS y${k + 1},
         |    d$k + CAST($s2 AS BIGINT)
         |      * (CASE WHEN $rxPos THEN 3 - $ryBit ELSE $ryBit END) AS d${k + 1}
         |  FROM h$k)""".stripMargin
    }
    (s"""h0 AS (
        |  SELECT l_orderkey, l_linenumber, p, day,
        |    x AS x0, y AS y0, CAST(0 AS BIGINT) AS d0
        |  FROM norm)""".stripMargin +: steps :+
      s"""$outCte AS (
         |  SELECT l_orderkey, l_linenumber, p, day, d16 AS z FROM h16)""".stripMargin)
      .mkString(",\n")
  }

  /** Rank + file-cut CTE suffix shared by every layout oracle: global
    * row rank along the curve (`zCte` supplies z), cut into 4096-row
    * files, per-file min/max footprint of both dimensions.
    */
  private def layoutFilesSuffixSql(zCte: String, rCte: String,
                                   filesCte: String): String =
    s"""$rCte AS (
       |  SELECT p, day,
       |    ROW_NUMBER() OVER (ORDER BY z ASC, l_orderkey ASC,
       |      l_linenumber ASC) - 1 AS rk
       |  FROM $zCte),
       |$filesCte AS (
       |  SELECT (rk >> 12) AS file_id, COUNT(*) AS n_rows,
       |    MIN(p) AS part_min, MAX(p) AS part_max,
       |    MIN(day) AS day_min, MAX(day) AS day_max,
       |    MAX(p) - MIN(p) AS part_span, MAX(day) - MIN(day) AS day_span
       |  FROM $rCte GROUP BY 1)""".stripMargin

  /** Z-ORDER LAYOUT PLAN — multi-dimensional clustering for scan
    * pruning (the public Delta/Iceberg `OPTIMIZE ZORDER BY` idea,
    * Morton 1966): lineitem rows sort by the bit-interleave of
    * 16-bit-normalized (l_partkey, shipdate-day) and cut into
    * 4096-row target files; the output is the per-file min/max
    * footprint of BOTH dimensions — the row-group statistics a format
    * like parquet would carry, whose narrow spans are exactly what
    * lets a predicate on EITHER column skip most files. A linear sort
    * on one key would give that column tight spans and leave the
    * other's footprint corpus-wide; the interleave bounds both.
    *
    * Scale shape: one bounds pass (2-dim min/max aggregate), then the
    * two-phase global rank the shard packer uses — a leading-bit
    * prefix of the Morton code is the range-partition bucket (a
    * prefix of the sort key, so bucket order IS global z order),
    * per-bucket counts collect ≤ 2^16 tiny rows to the driver for
    * the exclusive prefix, and ranks come from per-bucket row_number
    * + broadcast offsets. The prefix WIDTH adapts to the corpus
    * (counted once at 16-bit granularity, coarsened driver-side):
    * small corpora get few buckets — WindowExec pays a per-group
    * setup cost, so 2^16 near-empty groups cost more than the sort
    * they shard (measured 8.5 s → 0.9 s at sf0.1) — while a 600B-row
    * corpus bottoms out at the full 16 bits and ~9M-row task-sized
    * buckets. The final aggregate is map-side-combined to rows/4096
    * groups. Degenerate case: if BOTH dims are corpus-constant every
    * z collides and the rank funnels — but then the data has no 2-D
    * structure and Z-ordering itself is moot; a layout tool would
    * bail out at the bounds pass (min == max on both dims).
    */
  /** Oracle CTE chain ending in `files(file_id, n_rows, part_min,
    * part_max, day_min, day_max, part_span, day_span)` — shared by the
    * layout plan's oracle and the skip-stats oracle that consumes it.
    */
  private def layoutNormCte: String =
    s"""base AS (
       |  SELECT l_orderkey, l_linenumber, l_partkey AS p,
       |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
       |  FROM lineitem),
       |b AS (SELECT MIN(p) AS pmin, MAX(p) AS pmax,
       |             MIN(day) AS dmin, MAX(day) AS dmax FROM base),
       |norm AS (
       |  SELECT l_orderkey, l_linenumber, p, day,
       |    ((p - b.pmin) * 65535) // GREATEST(b.pmax - b.pmin, 1) AS x,
       |    ((day - b.dmin) * 65535) // GREATEST(b.dmax - b.dmin, 1) AS y
       |  FROM base, b)""".stripMargin

  private def zorderFilesCte: String =
    s"""$layoutNormCte,
       |z AS (
       |  SELECT l_orderkey, l_linenumber, p, day,
       |    ${mortonZSql("x", "y")} AS z
       |  FROM norm),
       |${layoutFilesSuffixSql("z", "r", "files")}""".stripMargin

  /** Same chain under the Hilbert key (CTE names disjoint from the
    * Morton chain's so q_layout_compare can carry both).
    */
  private def hilbertFilesCte: String =
    s"""$layoutNormCte,
       |${hilbertChainSql("hz")},
       |${layoutFilesSuffixSql("hz", "hr", "filesh")}""".stripMargin

  val qLayoutZorder: Q = Q.sql(
    "q_layout_zorder",
    s"""WITH $zorderFilesCte
       |SELECT file_id, n_rows, part_min, part_max, day_min, day_max,
       |  part_span, day_span
       |FROM files
       |ORDER BY file_id ASC""".stripMargin) { (s, d) =>
    zorderFileStats(s, d).orderBy(col("file_id").asc)
  }

  /** Spark side of [[zorderFilesCte]] / [[hilbertFilesCte]]: the
    * per-file min/max footprint table the layout queries consume,
    * memoized per (session, curve, corpus) — four catalog queries now
    * read these frames, and a production layout tool would persist
    * exactly this table as the file-statistics manifest.
    */
  private def layoutFileStats(s: org.apache.spark.sql.SparkSession,
                              d: String,
                              hilbert: Boolean): org.apache.spark.sql.DataFrame =
    SharedFrames.frame(s,
      s"layout_files:${if (hilbert) "hilbert" else "morton"}:$d") {
      layoutRows(s, d, hilbert)
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          min("p").as("part_min"), max("p").as("part_max"),
          min("day").as("day_min"), max("day").as("day_max"))
        .withColumn("part_span", col("part_max") - col("part_min"))
        .withColumn("day_span", col("day_max") - col("day_min"))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }

  private def zorderFileStats(s: org.apache.spark.sql.SparkSession,
                              d: String): org.apache.spark.sql.DataFrame =
    layoutFileStats(s, d, hilbert = false)

  /** Memoized per-row file assignment (p, day, file_id) along the
    * chosen curve — the materialized REWRITE the layout queries
    * simulate (at 100 TB this is the re-clustered table itself; here
    * it backs the file-stats manifest and the bloom sidecar without
    * re-ranking the corpus per query).
    */
  private def layoutRows(s: org.apache.spark.sql.SparkSession,
                         d: String,
                         hilbert: Boolean): org.apache.spark.sql.DataFrame =
    SharedFrames.frame(s,
      s"layout_rows:${if (hilbert) "hilbert" else "morton"}:$d") {
      layoutRowsBuild(s, d, hilbert).localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }

  private[graft] def layoutRowsBuild(s: org.apache.spark.sql.SparkSession,
                              d: String,
                              hilbert: Boolean): org.apache.spark.sql.DataFrame = {
    val base = Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"), col("l_partkey").as("p"),
      datediff(col("l_shipdate").cast(DateType),
        to_date(lit("1970-01-01"))).cast(LongType).as("day"))
    // Bounds land on the driver as 4 scalars and inline as literals:
    // a broadcast-join formulation instead invites Catalyst to push
    // the equi-join's isnotnull(__b) THROUGH the projections into the
    // bounds cross-join as an interpreted BroadcastNestedLoopJoin
    // condition carrying the whole inlined Morton tree (measured 8.5 s
    // of the 10 s total at sf0.1); literal bounds keep every operator
    // a codegen'd projection. The interleave itself is the native
    // morton_interleave expression — composed from 96 shift/mask
    // nodes it re-inlines into every collapsed projection downstream
    // (count key, shuffle hash, sort key) and blows past codegen
    // limits; as one expression it is a static call that recomputes
    // for free, so the corpus is scanned twice (counts, rank) and
    // never materialized.
    graft.expressions.MortonInterleave.ensureRegistered(s)
    graft.expressions.HilbertIndex.ensureRegistered(s)
    val keyFn = if (hilbert) "hilbert_index" else "morton_interleave"
    val b = base.agg(min("p"), max("p"), min("day"), max("day")).head()
    val (pmin, pmax, dmin, dmax) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val pSpan = math.max(pmax - pmin, 1L)
    val dSpan = math.max(dmax - dmin, 1L)
    val z = base
      .withColumn("x", expr(s"((p - $pmin) * 65535) div $pSpan"))
      .withColumn("y", expr(s"((day - $dmin) * 65535) div $dSpan"))
      .withColumn("z", expr(s"$keyFn(x, y)"))
      .select(col("l_orderkey"), col("l_linenumber"), col("p"), col("day"),
        col("z"))
    // Two-phase global rank: the bucket is the sort key's own leading
    // prefix, so (bucket, z-within-bucket) order IS global z order.
    // Count once at the finest (16-bit) granularity, then coarsen the
    // prefix so bucket count tracks corpus size: ~16k rows per bucket,
    // floored at 2^8 and capped at the 2^16 counting grain.
    val counts16 = z.select(shiftright(col("z"), 16).as("__b16"))
      .groupBy("__b16").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = counts16.map(_._2).sum
    val targetBuckets = math.max(256L, math.min(65536L, total / 16384L))
    val shift = 16 + math.max(0,
      16 - (64 - java.lang.Long.numberOfLeadingZeros(targetBuckets - 1)))
    val counts = counts16.groupBy { case (b16, _) => b16 >> (shift - 16) }
      .view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (b, n) => val o = acc; acc += n; (b, o) }
    import s.implicits._
    val offsetDf = broadcast(offsets.toDF("__b", "__off"))
    val zb = z.withColumn("__b", shiftright(col("z"), shift))
    val w = Window.partitionBy(col("__b"))
      .orderBy(col("z").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    zb.join(offsetDf, Seq("__b"))
      .withColumn("rk",
        row_number().over(w).cast(LongType) - 1L + col("__off"))
      .withColumn("file_id", shiftright(col("rk"), 12))
      .select(col("p"), col("day"), col("file_id"))
  }

  /** FILE-SKIPPING ESTIMATE over the Z-ordered layout — the "measure,
    * don't guess" companion to [[qLayoutZorder]]: for a deterministic
    * probe set (8 part-key point lookups spread across the key range,
    * 4 shipdate range scans of 1/8th the date span), how many target
    * files' [min, max] footprints admit the probe, and the skip ratio
    * a min/max-pruning scan would achieve. This is exactly the
    * decision input for adopting the layout: a point probe on EITHER
    * dimension should skip most files — a single-column sort gives
    * that for one dimension and ~zero for the other.
    *
    * Scale shape: the probe table is 12 rows broadcast against the
    * file-stats table (corpus/4096 rows — at 100 TB that is the
    * statistics MANIFEST, millions of rows, not the corpus), with one
    * map-side-combined conditional count per probe. Admission and
    * probe endpoints are all integer arithmetic; the skip ratio is
    * one IEEE divide of exact counts.
    */
  val qLayoutSkipStats: Q = Q.sql(
    "q_layout_skip_stats",
    s"""WITH $zorderFilesCte,
       |g AS (
       |  SELECT MIN(part_min) AS pmin, MAX(part_max) AS pmax,
       |    MIN(day_min) AS dmin, MAX(day_max) AS dmax
       |  FROM files),
       |pp AS (
       |  SELECT i AS probe_id, 'part_point' AS kind,
       |    g.pmin + i * (g.pmax - g.pmin) // 8 AS lo,
       |    g.pmin + i * (g.pmax - g.pmin) // 8 AS hi
       |  FROM g, (SELECT unnest(range(0, 8)) AS i)),
       |dr AS (
       |  SELECT j AS probe_id, 'day_range' AS kind,
       |    g.dmin + j * (g.dmax - g.dmin) // 4 AS lo,
       |    g.dmin + j * (g.dmax - g.dmin) // 4
       |      + (g.dmax - g.dmin) // 8 AS hi
       |  FROM g, (SELECT unnest(range(0, 4)) AS j)),
       |probes AS (SELECT * FROM pp UNION ALL SELECT * FROM dr),
       |adm AS (
       |  SELECT p.probe_id, p.kind, p.lo, p.hi,
       |    COUNT(*) AS n_files,
       |    SUM(CASE WHEN p.kind = 'part_point'
       |      THEN CASE WHEN f.part_min <= p.lo AND p.lo <= f.part_max
       |        THEN 1 ELSE 0 END
       |      ELSE CASE WHEN f.day_max >= p.lo AND f.day_min <= p.hi
       |        THEN 1 ELSE 0 END END) AS n_admitted
       |  FROM probes p CROSS JOIN files f
       |  GROUP BY 1, 2, 3, 4)
       |SELECT probe_id, kind, lo, hi,
       |  CAST(n_files AS BIGINT) AS n_files,
       |  CAST(n_admitted AS BIGINT) AS n_admitted,
       |  1e0 - CAST(n_admitted AS DOUBLE) / n_files AS skip_ratio
       |FROM adm
       |ORDER BY kind ASC, probe_id ASC""".stripMargin) { (s, d) =>
    // the memoized frame materializes the two-phase z-rank pipeline
    // ONCE per session×corpus: both the g-bounds head() and the probe
    // crossJoin read the checkpointed file stats
    val files = zorderFileStats(s, d)
    val g = files.agg(min("part_min"), max("part_max"),
      min("day_min"), max("day_max")).head()
    val (pmin, pmax, dmin, dmax) =
      (g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3))
    import s.implicits._
    val probes = ((0L until 8L).map { i =>
      val p = pmin + i * (pmax - pmin) / 8
      (i, "part_point", p, p)
    } ++ (0L until 4L).map { j =>
      val lo = dmin + j * (dmax - dmin) / 4
      (j, "day_range", lo, lo + (dmax - dmin) / 8)
    }).toDF("probe_id", "kind", "lo", "hi")
    val admits = when(col("kind") === "part_point",
      col("part_min") <= col("lo") && col("lo") <= col("part_max"))
      .otherwise(col("day_max") >= col("lo") && col("day_min") <= col("hi"))
    files.crossJoin(broadcast(probes))
      .groupBy("probe_id", "kind", "lo", "hi")
      .agg(count(lit(1)).as("n_files"),
        sum(when(admits, 1L).otherwise(0L)).as("n_admitted"))
      .select(col("probe_id"), col("kind"), col("lo"), col("hi"),
        col("n_files"), col("n_admitted"),
        (lit(1.0) - col("n_admitted").cast(DoubleType) /
          col("n_files").cast(DoubleType)).as("skip_ratio"))
      .orderBy(col("kind").asc, col("probe_id").asc)
  }

  /** HILBERT LAYOUT PLAN — [[qLayoutZorder]]'s file-footprint table
    * under the order-16 Hilbert key instead of the Morton one, same
    * normalization, rank machinery, and 4096-row file cut. Exists
    * because the two curves genuinely differ where it matters for
    * skipping: Morton's quadrant seams put corpus-wide (x, y) jumps
    * inside files, inflating their min/max footprints; Hilbert's
    * unit-step continuity keeps every file a contiguous curve segment
    * of grid neighbors. [[qLayoutCompare]] measures the difference on
    * identical probes. The oracle replays the rotation recurrence as
    * 16 unrolled CTE steps generated from the same bit layout as the
    * native `hilbert_index` expression, so the two cannot drift.
    */
  val qLayoutHilbert: Q = Q.sql(
    "q_layout_hilbert",
    s"""WITH $hilbertFilesCte
       |SELECT file_id, n_rows, part_min, part_max, day_min, day_max,
       |  part_span, day_span
       |FROM filesh
       |ORDER BY file_id ASC""".stripMargin) { (s, d) =>
    layoutFileStats(s, d, hilbert = true).orderBy(col("file_id").asc)
  }

  /** LAYOUT BAKE-OFF — the head-to-head decision table for the two
    * clustering keys: the SAME 12 probes as [[qLayoutSkipStats]]
    * (endpoints depend only on corpus bounds, so both layouts face
    * identical queries) admitted against each layout's file
    * footprints, side by side. The measured answer to "is Hilbert's
    * extra rotation arithmetic worth it over Morton here" — at 100 TB
    * the layout is rewritten once and scanned forever, so the choice
    * is made from exactly this table, not from folklore.
    *
    * Scale shape: two memoized manifest-sized file-stats frames
    * (built once per session×corpus, shared with the other layout
    * queries), a 12-row broadcast probe table, one map-side-combined
    * conditional count per (layout, probe).
    */
  val qLayoutCompare: Q = Q.sql(
    "q_layout_compare",
    s"""WITH $zorderFilesCte,
       |${hilbertChainSql("hz")},
       |${layoutFilesSuffixSql("hz", "hr", "filesh")},
       |allf AS (
       |  SELECT 'morton' AS layout, * FROM files
       |  UNION ALL
       |  SELECT 'hilbert' AS layout, * FROM filesh),
       |g AS (
       |  SELECT MIN(part_min) AS pmin, MAX(part_max) AS pmax,
       |    MIN(day_min) AS dmin, MAX(day_max) AS dmax
       |  FROM files),
       |pp AS (
       |  SELECT i AS probe_id, 'part_point' AS kind,
       |    g.pmin + i * (g.pmax - g.pmin) // 8 AS lo,
       |    g.pmin + i * (g.pmax - g.pmin) // 8 AS hi
       |  FROM g, (SELECT UNNEST(RANGE(0, 8)) AS i)),
       |dr AS (
       |  SELECT j AS probe_id, 'day_range' AS kind,
       |    g.dmin + j * (g.dmax - g.dmin) // 4 AS lo,
       |    g.dmin + j * (g.dmax - g.dmin) // 4
       |      + (g.dmax - g.dmin) // 8 AS hi
       |  FROM g, (SELECT UNNEST(RANGE(0, 4)) AS j)),
       |probes AS (SELECT * FROM pp UNION ALL SELECT * FROM dr),
       |adm AS (
       |  SELECT f.layout, p.probe_id, p.kind, p.lo, p.hi,
       |    COUNT(*) AS n_files,
       |    SUM(CASE WHEN p.kind = 'part_point'
       |      THEN CASE WHEN f.part_min <= p.lo AND p.lo <= f.part_max
       |        THEN 1 ELSE 0 END
       |      ELSE CASE WHEN f.day_max >= p.lo AND f.day_min <= p.hi
       |        THEN 1 ELSE 0 END END) AS n_admitted
       |  FROM probes p CROSS JOIN allf f
       |  GROUP BY 1, 2, 3, 4, 5)
       |SELECT layout, probe_id, kind, lo, hi,
       |  CAST(n_files AS BIGINT) AS n_files,
       |  CAST(n_admitted AS BIGINT) AS n_admitted,
       |  1e0 - CAST(n_admitted AS DOUBLE) / n_files AS skip_ratio
       |FROM adm
       |ORDER BY layout ASC, kind ASC, probe_id ASC""".stripMargin) { (s, d) =>
    val mf = layoutFileStats(s, d, hilbert = false)
    val hf = layoutFileStats(s, d, hilbert = true)
    val files = mf.withColumn("layout", lit("morton"))
      .unionByName(hf.withColumn("layout", lit("hilbert")))
    val g = mf.agg(min("part_min"), max("part_max"),
      min("day_min"), max("day_max")).head()
    val (pmin, pmax, dmin, dmax) =
      (g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3))
    import s.implicits._
    val probes = ((0L until 8L).map { i =>
      val p = pmin + i * (pmax - pmin) / 8
      (i, "part_point", p, p)
    } ++ (0L until 4L).map { j =>
      val lo = dmin + j * (dmax - dmin) / 4
      (j, "day_range", lo, lo + (dmax - dmin) / 8)
    }).toDF("probe_id", "kind", "lo", "hi")
    val admits = when(col("kind") === "part_point",
      col("part_min") <= col("lo") && col("lo") <= col("part_max"))
      .otherwise(col("day_max") >= col("lo") && col("day_min") <= col("hi"))
    files.crossJoin(broadcast(probes))
      .groupBy("layout", "probe_id", "kind", "lo", "hi")
      .agg(count(lit(1)).as("n_files"),
        sum(when(admits, 1L).otherwise(0L)).as("n_admitted"))
      .select(col("layout"), col("probe_id"), col("kind"), col("lo"),
        col("hi"), col("n_files"), col("n_admitted"),
        (lit(1.0) - col("n_admitted").cast(DoubleType) /
          col("n_files").cast(DoubleType)).as("skip_ratio"))
      .orderBy(col("layout").asc, col("kind").asc, col("probe_id").asc)
  }

  /** The md5→60-bit-integer fragment as a DuckDB correlated scalar
    * subquery (the engine side is `conv(substring(md5(..),1,15),16,10)`
    * — same 15 hex chars, same value).
    */
  private def sqlHex60(e: String): String =
    s"""(SELECT SUM(CAST(strpos('0123456789abcdef',
       |       substr(md5($e), CAST(i + 1 AS INT), 1)) - 1 AS BIGINT)
       |       * (CAST(1 AS BIGINT) << CAST(4 * (14 - i) AS INT)))
       |     FROM range(15) t(i))""".stripMargin

  /** BLOOM SIDECAR SKIPPING ESTIMATE — the third leg of the layout
    * family: per-file Bloom filters (m = 32768 bits, k = 3 md5-derived
    * hashes — parquet's column bloom sidecar, Bloom CACM 1970) probed
    * with the SAME 8 part-key point lookups as [[qLayoutSkipStats]],
    * reported next to the min/max-footprint admissions. The structural
    * point a min/max manifest can't make: bloom admission is
    * CLUSTERING-INDEPENDENT — a file is admitted only if every probe
    * hash hits its bit set (fp ≈ (1−e^{−kn/m})^k ≲ 2% at n ≤ 4096
    * keys/file), so point probes skip cold files even where the sort
    * order leaves a dimension's footprints corpus-wide; min/max needs
    * the clustering. Range probes are the opposite trade (blooms
    * cannot serve them) — which is why real manifests carry both.
    *
    * Scale shape: the bloom build is one explode+distinct over the
    * memoized layout rows, bounded by files × m bits; probes are 24
    * broadcast rows; admission is a keys-only join on bit position.
    * The relational bit-set (file_id, bitpos) IS the sidecar, just
    * row-oriented so the oracle can replay it.
    */
  val qLayoutBloomStats: Q = Q.sql(
    "q_layout_bloom_stats",
    s"""WITH $zorderFilesCte,
       |ph AS (SELECT DISTINCT p FROM base),
       |phh AS (
       |  SELECT p,
       |    ${sqlHex60("'1:' || CAST(p AS VARCHAR)")} % 32768 AS b1,
       |    ${sqlHex60("'2:' || CAST(p AS VARCHAR)")} % 32768 AS b2,
       |    ${sqlHex60("'3:' || CAST(p AS VARCHAR)")} % 32768 AS b3
       |  FROM ph),
       |rows_ AS (SELECT (rk >> 12) AS file_id, p FROM r),
       |fb AS (SELECT DISTINCT file_id, bitpos FROM (
       |  SELECT r2.file_id, unnest([ph2.b1, ph2.b2, ph2.b3]) AS bitpos
       |  FROM rows_ r2 JOIN phh ph2 USING (p))),
       |g AS (SELECT MIN(part_min) AS pmin, MAX(part_max) AS pmax FROM files),
       |probes AS (
       |  SELECT i AS probe_id, g.pmin + i * (g.pmax - g.pmin) // 8 AS lo
       |  FROM g, (SELECT UNNEST(RANGE(0, 8)) AS i)),
       |pbh AS (
       |  SELECT probe_id, lo,
       |    ${sqlHex60("'1:' || CAST(lo AS VARCHAR)")} % 32768 AS b1,
       |    ${sqlHex60("'2:' || CAST(lo AS VARCHAR)")} % 32768 AS b2,
       |    ${sqlHex60("'3:' || CAST(lo AS VARCHAR)")} % 32768 AS b3
       |  FROM probes),
       |pb AS (SELECT DISTINCT probe_id, bitpos FROM (
       |  SELECT probe_id, unnest([b1, b2, b3]) AS bitpos FROM pbh)),
       |req AS (SELECT probe_id, COUNT(*) AS k FROM pb GROUP BY 1),
       |bm AS (
       |  SELECT pb.probe_id, f.file_id, COUNT(DISTINCT pb.bitpos) AS nb
       |  FROM pb JOIN fb f ON f.bitpos = pb.bitpos GROUP BY 1, 2),
       |badm AS (
       |  SELECT bm.probe_id, COUNT(*) AS bloom_admitted
       |  FROM bm JOIN req ON bm.probe_id = req.probe_id AND bm.nb = req.k
       |  GROUP BY 1),
       |mm AS (
       |  SELECT p.probe_id, p.lo, COUNT(*) AS n_files,
       |    SUM(CASE WHEN f.part_min <= p.lo AND p.lo <= f.part_max
       |      THEN 1 ELSE 0 END) AS mm_admitted
       |  FROM probes p CROSS JOIN files f GROUP BY 1, 2)
       |SELECT m.probe_id, m.lo, CAST(m.n_files AS BIGINT) AS n_files,
       |  CAST(m.mm_admitted AS BIGINT) AS mm_admitted,
       |  CAST(COALESCE(b.bloom_admitted, 0) AS BIGINT) AS bloom_admitted
       |FROM mm m LEFT JOIN badm b ON m.probe_id = b.probe_id
       |ORDER BY m.probe_id ASC""".stripMargin) { (s, d) =>
    val rows = layoutRows(s, d, hilbert = false)
    val files = layoutFileStats(s, d, hilbert = false)
    def h(j: Int, c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      pmod(conv(substring(md5(
        concat(lit(s"$j:"), c.cast(StringType)).cast(BinaryType)), 1, 15),
        16, 10).cast(LongType), lit(32768L))
    val g = files.agg(min("part_min"), max("part_max")).head()
    val (pmin, pmax) = (g.getLong(0), g.getLong(1))
    import s.implicits._
    val probes = (0L until 8L).map(i => (i, pmin + i * (pmax - pmin) / 8))
      .toDF("probe_id", "lo")
    val probebits = probes.select(col("probe_id"),
      explode(array(h(1, col("lo")), h(2, col("lo")), h(3, col("lo"))))
        .as("bitpos")).distinct()
    val req = probebits.groupBy("probe_id").agg(count(lit(1)).as("k"))
    // hash once per DISTINCT (file, part) pair — the oracle's ph shape;
    // hashing before the distinct would run 3 md5s per corpus row
    val filebits = rows.select(col("file_id"), col("p")).distinct()
      .select(col("file_id"),
        explode(array(h(1, col("p")), h(2, col("p")), h(3, col("p"))))
          .as("bitpos")).distinct()
    val bloomAdm = filebits.join(broadcast(probebits), "bitpos")
      .groupBy("probe_id", "file_id").agg(countDistinct(col("bitpos")).as("nb"))
      .join(broadcast(req), "probe_id")
      .filter(col("nb") === col("k"))
      .groupBy("probe_id").agg(count(lit(1)).as("bloom_admitted"))
    files.crossJoin(broadcast(probes))
      .groupBy("probe_id", "lo")
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("part_min") <= col("lo") && col("lo") <= col("part_max"),
          1L).otherwise(0L)).as("mm_admitted"))
      .join(bloomAdm, Seq("probe_id"), "left")
      .select(col("probe_id"), col("lo"), col("n_files"), col("mm_admitted"),
        coalesce(col("bloom_admitted"), lit(0L)).as("bloom_admitted"))
      .orderBy(col("probe_id").asc)
  }

  /** BALANCE CONCENTRATION per nation — Gini coefficient plus the
    * top-decile share of positive account balances: the inequality
    * diagnostics behind "how dependent is this market on its largest
    * accounts". Gini uses the rank form G = (2·Σi·x − (n+1)·Σx) /
    * (n·Σx) over ascending ranks — every sum is DECIMAL-exact and
    * the two final divides are IEEE on identical operands; ties in x
    * leave both Σi·x and the decile boundary sum invariant under any
    * tie order, so ROW_NUMBER's arbitrary tie choice cannot diverge
    * the engines. Negative/zero balances are excluded (Gini is
    * defined on nonnegative mass) — disclosed.
    *
    * Scale shape: one window pass per nation partition and a
    * ≤#nations-row aggregate; nothing touches the driver.
    */
  val qCustomerGini: Q = Q.sql(
    "q_customer_gini",
    """WITH pos AS (
      |  SELECT c_nationkey, CAST(c_acctbal AS DECIMAL(12,2)) AS x
      |  FROM customer WHERE c_acctbal > 0),
      |r AS (
      |  SELECT c_nationkey, x,
      |    ROW_NUMBER() OVER w AS i,
      |    COUNT(*) OVER (PARTITION BY c_nationkey) AS n
      |  FROM pos
      |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY x ASC)),
      |a AS (
      |  SELECT c_nationkey, CAST(MAX(n) AS BIGINT) AS n,
      |    SUM(x) AS sx,
      |    SUM(CAST(i AS DECIMAL(18,0)) * x) AS six,
      |    SUM(CASE WHEN i > n - (n + 9) // 10 THEN x
      |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS topx
      |  FROM r GROUP BY 1)
      |SELECT a.c_nationkey, nn.n_name AS nation, a.n AS n_customers,
      |  CAST(2 * six - (n + 1) * sx AS DOUBLE)
      |    / CAST(n * sx AS DOUBLE) AS gini,
      |  CAST(topx AS DOUBLE) / CAST(sx AS DOUBLE) AS top_decile_share
      |FROM a JOIN nation nn ON a.c_nationkey = nn.n_nationkey
      |ORDER BY a.c_nationkey ASC""".stripMargin) { (s, d) =>
    val pos = Tables.customer(s, d)
      .filter(col("c_acctbal") > 0)
      .select(col("c_nationkey"), dec(col("c_acctbal")).as("x"))
    val w = Window.partitionBy("c_nationkey").orderBy(col("x").asc)
    val wAll = Window.partitionBy("c_nationkey")
    val r = pos
      .withColumn("i", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(wAll))
    val a = r.groupBy("c_nationkey")
      .agg(max("n").cast(LongType).as("n"),
        sum("x").as("sx"),
        sum(col("i").cast(DecimalType(18, 0)) * col("x")).as("six"),
        sum(when(col("i") > col("n") - expr("(n + 9) div 10"), col("x"))
          .otherwise(lit(0).cast(DecimalType(12, 2)))).as("topx"))
    a.join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_nationkey"), col("n_name").as("nation"),
        col("n").as("n_customers"),
        ((lit(2) * col("six") - (col("n") + 1) * col("sx")).cast(DoubleType)
          / (col("n") * col("sx")).cast(DoubleType)).as("gini"),
        (col("topx").cast(DoubleType) / col("sx").cast(DoubleType))
          .as("top_decile_share"))
      .orderBy(col("c_nationkey").asc)
  }

  /** LENGTH CONCENTRATION per document source — the same Gini +
    * top-decile machinery over per-document character mass: the
    * "does a handful of mega-documents carry this source" triage a
    * curation pipeline reads before setting per-document token caps
    * (a high Gini source truncates differently than a flat one).
    * Same exactness argument as [[qCustomerGini]].
    */
  val qDocLengthGini: Q = Q.sql(
    "q_doc_length_gini",
    """WITH pos AS (
      |  SELECT source, CAST(n_chars AS DECIMAL(18,0)) AS x
      |  FROM documents WHERE n_chars > 0),
      |r AS (
      |  SELECT source, x,
      |    ROW_NUMBER() OVER w AS i,
      |    COUNT(*) OVER (PARTITION BY source) AS n
      |  FROM pos
      |  WINDOW w AS (PARTITION BY source ORDER BY x ASC)),
      |a AS (
      |  SELECT source, CAST(MAX(n) AS BIGINT) AS n,
      |    SUM(x) AS sx,
      |    SUM(CAST(i AS DECIMAL(18,0)) * x) AS six,
      |    SUM(CASE WHEN i > n - (n + 9) // 10 THEN x
      |      ELSE CAST(0 AS DECIMAL(18,0)) END) AS topx
      |  FROM r GROUP BY 1)
      |SELECT source, n AS n_docs,
      |  CAST(2 * six - (n + 1) * sx AS DOUBLE)
      |    / CAST(n * sx AS DOUBLE) AS gini,
      |  CAST(topx AS DOUBLE) / CAST(sx AS DOUBLE) AS top_decile_share
      |FROM a
      |ORDER BY source ASC""".stripMargin) { (s, d) =>
    val pos = Tables.documents(s, d)
      .filter(col("n_chars") > 0)
      .select(col("source"), col("n_chars").cast(DecimalType(18, 0)).as("x"))
    val w = Window.partitionBy("source").orderBy(col("x").asc)
    val wAll = Window.partitionBy("source")
    val r = pos
      .withColumn("i", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(wAll))
    r.groupBy("source")
      .agg(max("n").cast(LongType).as("n"),
        sum("x").as("sx"),
        sum(col("i").cast(DecimalType(18, 0)) * col("x")).as("six"),
        sum(when(col("i") > col("n") - expr("(n + 9) div 10"), col("x"))
          .otherwise(lit(0).cast(DecimalType(18, 0)))).as("topx"))
      .select(col("source"), col("n").as("n_docs"),
        ((lit(2) * col("six") - (col("n") + 1) * col("sx")).cast(DoubleType)
          / (col("n") * col("sx")).cast(DoubleType)).as("gini"),
        (col("topx").cast(DoubleType) / col("sx").cast(DoubleType))
          .as("top_decile_share"))
      .orderBy(col("source").asc)
  }

  /** Mega-basket pair-space cap for [[qMarketBasket]]: each basket
    * contributes pairs from its [[maxBasketParts]] LOWEST part keys
    * only (a deterministic, engine-portable subset — the band-join
    * guard's keep-lowest idiom). The pair space is then
    * Σ min(basket, cap)² : TPC-H's ≤ 7 lines/order never touches the
    * cap (both gate corpora hash-identical to uncapped), while a real
    * retailer's 10⁵-line order — quadratic uncapped, the exact
    * mega-key regime q_join_skew_advisor exists to flag — contributes
    * at most cap²/2 pairs. Individual part frequencies, support
    * denominators, and the order total stay UNCAPPED (they are linear
    * in input); only the quadratic pair enumeration is bounded.
    * Truncation is a disclosed loss: [[logBasketCapLoss]] logs the
    * over-cap basket count and excluded-part count whenever the cap
    * binds (once per session × corpus). 64² = 4096 pairs/basket max —
    * two orders of magnitude above anything TPC-H-shaped, far below
    * quadratic blowup.
    */
  private[graft] val maxBasketParts = 64

  /** The distinct (order, part) basket table — ONE definition shared
    * by the timed query and its preparedBy audit warm-up, so the
    * cap-gating bit is always computed from exactly the frame the
    * query gates its plan on.
    */
  private def basketItems(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()

  /** One-row disclosed-loss audit, memoized per session × corpus (the
    * [[graft.queries.SimilarityQ.logBucketCapLoss]] idiom): one extra
    * aggregation pass that on clean corpora never fires. Returns
    * whether ANY basket exceeds [[maxBasketParts]] — the r13
    * BENCH_NOTES flagged the rank window that enforces the cap as a
    * +15% cost paid even when no basket binds it, so the query gates
    * the window on this measured bit (the
    * [[graft.plans.AdaptiveSmallSide]] measured-plan-choice idiom):
    * a clean corpus pays nothing, an adversarial corpus gets the full
    * cap, and either way the loss is disclosed here.
    */
  private def logBasketCapLoss(li: DataFrame, d: String): Boolean =
    SharedFrames.value[java.lang.Boolean](
        li.sparkSession, s"basket_cap_loss:$d") {
      val over = li.groupBy("ok").agg(count(lit(1)).as("n"))
        .filter(col("n") > maxBasketParts)
        .agg(count(lit(1)).as("baskets"),
          sum(col("n") - maxBasketParts).as("dropped"))
        .head()
      val binds = !over.isNullAt(1) && over.getLong(1) > 0L
      if (binds)
        System.err.println(s"[graft] q_market_basket: ${over.getLong(0)} " +
          s"basket(s) over $maxBasketParts parts; ${over.getLong(1)} part " +
          s"row(s) excluded from pair mining (disclosed loss)")
      java.lang.Boolean.valueOf(binds)
    }

  /** MARKET-BASKET PAIR MINING — the frequent-itemset primitive
    * (Agrawal & Srikant VLDB 1994, at the k = 2 level that co-purchase
    * dashboards actually consume): for every pair of parts appearing
    * in the same order, the co-occurrence count with both parts'
    * individual frequencies, support and directional confidence — all
    * ratios of exact integers. Top-25 by co-occurrence.
    *
    * Scale shape: the self-join is CO-PARTITIONED on l_orderkey (ONE
    * hash exchange feeds both join sides via ReusedExchange), and the
    * pair space is capped at Σ min(basket, [[maxBasketParts]])² — see
    * the cap scaladoc above (r12 verdict #4: the Σ basket² hazard was
    * prose-only; now it is code, mirrored in the oracle, and
    * MarketBasketCapSpec plants a 300-part order that binds it). The
    * rank window that ENFORCES the cap is count-gated (r13 verdict
    * #7): [[logBasketCapLoss]]'s audit aggregate — which runs anyway
    * for loss disclosure — reports whether any basket exceeds the
    * cap, and the window enters the plan only then, so a clean corpus
    * never pays it. Pair counts map-side combine; the order total is
    * a 1-row scalar; the final top-25 is TakeOrderedAndProject, cut
    * BEFORE the frequency joins so both lookups join a broadcast
    * 25-row side.
    *
    * r13 adjudication note: the r12 in-scan collect_set rewrite read
    * +57% in the driver's full-catalog sf10 sweep and +73% in this
    * round's same-host back-to-back A/B (55.3 s vs 32.0 s) — the
    * basket-array build spills under full-catalog memory pressure
    * (UnsafeKVExternalSorter in every sampled stack). Reverted to the
    * co-partitioned self-join; BENCH_NOTES has the numbers.
    */
  val qMarketBasket: Q = Q.sql(
    "q_market_basket",
    s"""WITH li AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |capped AS (
      |  SELECT ok, pk FROM (
      |    SELECT ok, pk,
      |      ROW_NUMBER() OVER (PARTITION BY ok ORDER BY pk ASC) AS rn
      |    FROM li) WHERE rn <= $maxBasketParts),
      |pairs AS (
      |  SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS n_ab
      |  FROM capped a JOIN capped b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2),
      |parts AS (SELECT pk, COUNT(*) AS n FROM li GROUP BY pk),
      |t AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM li)
      |SELECT p.part_a, p.part_b, p.n_ab,
      |  pa.n AS n_a, pb.n AS n_b,
      |  CAST(p.n_ab AS DOUBLE) / t.n_orders AS support,
      |  CAST(p.n_ab AS DOUBLE) / pa.n AS confidence_a
      |FROM pairs p
      |JOIN parts pa ON p.part_a = pa.pk
      |JOIN parts pb ON p.part_b = pb.pk
      |CROSS JOIN t
      |ORDER BY p.n_ab DESC, p.part_a ASC, p.part_b ASC
      |LIMIT 25""".stripMargin) { (s, d) =>
    val li = basketItems(s, d)
    val capBinds = logBasketCapLoss(li, d)
    // 1-row order total folded in lazily (crossJoin of a broadcast
    // aggregate, matching the oracle's CROSS JOIN t) — no driver-side
    // action, the whole query stays one plan
    val t = li.select(countDistinct(col("ok")).as("n_orders"))
    // the rank window only exists when the measured audit says some
    // basket exceeds the cap — on a clean corpus the filter is a
    // provable no-op and the window would be pure cost (the oracle
    // keeps the unconditional rank filter: a no-op there too, just a
    // slower one, and DuckDB is not the component under test)
    val capped =
      if (!capBinds) li
      else li
        .withColumn("__rn", row_number().over(
          Window.partitionBy("ok").orderBy(col("pk").asc)))
        .filter(col("__rn") <= maxBasketParts)
        .drop("__rn")
    val pairs = capped.as("a")
      .join(capped.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
    val parts = li.groupBy("pk").agg(count(lit(1)).as("n"))
    // The top-25 order depends ONLY on the pair count, so the cut runs
    // BEFORE the frequency joins: TakeOrderedAndProject on the pair
    // table, then both part-frequency lookups join a broadcast 25-row
    // side. The previous shape joined the full pair table (Σ basket²
    // rows — ~9e7 at sf10) against the part table twice via sort-merge
    // just to discard all but 25 rows at the end.
    val top = pairs
      .orderBy(col("n_ab").desc, col("part_a").asc, col("part_b").asc)
      .limit(25)
    val withA = broadcast(top)
      .join(parts.select(col("pk").as("part_a"), col("n").as("n_a")), Seq("part_a"))
    broadcast(withA)
      .join(parts.select(col("pk").as("part_b"), col("n").as("n_b")), Seq("part_b"))
      .crossJoin(broadcast(t))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast(DoubleType) / col("n_orders")).as("support"),
        (col("n_ab").cast(DoubleType) / col("n_a").cast(DoubleType))
          .as("confidence_a"))
      .orderBy(col("n_ab").desc, col("part_a").asc, col("part_b").asc)
  }.preparedBy { (s, d) =>
    // warm the once-per-corpus cap audit OUTSIDE the timed path (the
    // persistent-index idiom): the memoized bit both discloses the
    // loss and gates the rank window; fn re-reads it for free
    logBasketCapLoss(basketItems(s, d), d)
    ()
  }

  /** ORDER-FULFILLMENT LATENCY — the operations report joining the
    * order header to its line shipments: per order the worst (max)
    * ship lag in whole days, rolled into a week-bucketed histogram
    * with exact counts and integer min/max. Integer day arithmetic
    * end-to-end.
    *
    * Scale shape: one orderkey-hash join (both sides pre-projected to
    * two columns), a per-order max (map-side combined on the same
    * exchange), and a ≤ dozens-row rollup.
    *
    * Parity guard: the week bucket divides GREATEST(lag_days, 0) —
    * DuckDB `//` floors while Spark `div` truncates toward zero, so
    * a negative lag (ship-before-order, impossible in TPC-H but not
    * enforced by this query) would otherwise bucket differently per
    * engine. Clamping makes the contract explicit instead of resting
    * on an unstated data invariant; a real negative lag still
    * surfaces through min_days.
    */
  val qFulfillmentLatency: Q = Q.sql(
    "q_fulfillment_latency",
    """WITH lag AS (
      |  SELECT o.o_orderkey,
      |    MAX(CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
      |      AS BIGINT)) AS lag_days
      |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  GROUP BY o.o_orderkey)
      |SELECT GREATEST(lag_days, 0) // 7 AS week_bucket, COUNT(*) AS n_orders,
      |  MIN(lag_days) AS min_days, MAX(lag_days) AS max_days
      |FROM lag GROUP BY 1
      |ORDER BY week_bucket ASC""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate").cast(DateType).as("od"))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate").cast(DateType).as("sd"))
    o.join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(max(datediff(col("sd"), col("od"))).cast(LongType).as("lag_days"))
      .groupBy(expr("greatest(lag_days, 0L) div 7").as("week_bucket"))
      .agg(count(lit(1)).as("n_orders"),
        min("lag_days").as("min_days"), max("lag_days").as("max_days"))
      .orderBy(col("week_bucket").asc)
  }

  /** TPC-H Q18-style large-volume customers — the aggregate-then-join
    * shape: orders whose total line quantity clears a threshold,
    * decorated with customer and header columns, top-100 by price.
    * The HAVING aggregate REDUCES lineitem to qualifying order keys
    * BEFORE any join touches the wide tables — the optimization Q18
    * exists to test (joining first would carry every line through two
    * joins to discard 99% at the end).
    *
    * Scale shape: map-side-combined quantity sums, then two hash
    * joins against the pre-reduced key set; top-100 lowers to
    * TakeOrderedAndProject. Quantity and price sums decimal-exact.
    */
  val qLargeVolumeCustomers: Q = Q.sql(
    "q18_large_volume_customers",
    """WITH big AS (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY 1
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300)
      |SELECT c.c_custkey, c.c_name, o.o_orderkey,
      |  CAST(o.o_orderdate AS DATE) AS order_date,
      |  o.o_totalprice AS total_price, b.sum_qty
      |FROM big b
      |JOIN orders o ON b.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |ORDER BY total_price DESC, o_orderkey ASC
      |LIMIT 100""".stripMargin) { (s, d) =>
    val big = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sum(dec(col("l_quantity"))).as("q"))
      .filter(col("q") > 300)
      .select(col("l_orderkey"), col("q").cast(DoubleType).as("sum_qty"))
    big
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast(DateType).as("order_date"),
        col("o_totalprice").as("total_price"), col("sum_qty"))
      .orderBy(col("total_price").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q4-shape (order-priority checking): orders in a half-year
    * window counted per priority, kept only when a CORRELATED EXISTS
    * finds a late-shipping line (adapted predicate: the testdata
    * carries no l_commitdate/l_receiptdate, so "late" = shipped more
    * than 60 days after ordering — ~50% selective, non-vacuous at
    * every SF). The shape under test is the correlated-exists
    * semi-join with a non-equi conjunct referencing the outer row.
    *
    * Scale shape: the semi-join hashes on orderkey (lineitem never
    * materializes matches, Spark lowers left_semi to a hash semi);
    * the priority rollup is a ≤5-row map-side-combined aggregate.
    */
  val qOrderPriority: Q = Q.sql(
    "q4_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o.o_orderdate AS DATE) < DATE '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
      |              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority ASC""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate").cast(DateType) >= to_date(lit("1996-01-01")) &&
        col("o_orderdate").cast(DateType) < to_date(lit("1996-07-01")))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority").asc)
  }

  /** TPC-H Q6 (forecasting revenue change): the canonical pure
    * scan-aggregate — three range predicates, no join, one row out.
    * Exists in the catalog as the pushdown litmus: every predicate
    * must reach the parquet scan (discount compares in DECIMAL(4,2)
    * so 0.07's double representation can't off-by-one the boundary in
    * either engine).
    */
  val qForecastRevenue: Q = Q.sql(
    "q6_forecast_revenue",
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      |  AND CAST(l_discount AS DECIMAL(4,2))
      |    BETWEEN CAST(0.05 AS DECIMAL(4,2)) AND CAST(0.07 AS DECIMAL(4,2))
      |  AND l_quantity < 24""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").cast(DateType) >= to_date(lit("1996-01-01")) &&
        col("l_shipdate").cast(DateType) < to_date(lit("1997-01-01")) &&
        rate(col("l_discount")).between(
          lit(0.05).cast(DecimalType(4, 2)), lit(0.07).cast(DecimalType(4, 2))) &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * rate(col("l_discount")))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q10 (returned-item reporting): which customers returned
    * the most revenue last quarter — customer ⋈ orders ⋈ lineitem ⋈
    * nation, returnflag = 'R', decimal-exact revenue, top 20.
    *
    * Scale shape: orders filters to one quarter BEFORE its join
    * (partition-prunable on a date-partitioned table); nation
    * broadcasts; the aggregate keys on custkey so the topk is
    * TakeOrderedAndProject over customer-sized input.
    *
    * r14 note: a SHUFFLE_HASH hint on the customer⋈orders leg was
    * tried (guide §3.1) and looked good under the session-wide
    * preferSortMergeJoin=false probe, but did not reproduce as a
    * standalone hint across four interleaved sf10 leg pairs (min
    * 3.89 s hinted vs 2.98 s sort-merge) — kept sort-merge.
    */
  val qReturnedItems: Q = Q.sql(
    "q10_returned_items",
    """SELECT c.c_custkey, c.c_name,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  c.c_acctbal, n.n_name
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
      |  AND l.l_returnflag = 'R'
      |GROUP BY 1, 2, 4, 5
      |ORDER BY revenue DESC, c_custkey ASC
      |LIMIT 20""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate").cast(DateType) >= to_date(lit("1996-01-01")) &&
        col("o_orderdate").cast(DateType) < to_date(lit("1996-04-01")))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    Tables.customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(dec(col("l_extendedprice")) * (oneD - rate(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q13 (customer order-count distribution): LEFT join with a
    * FILTERED join condition (non-urgent orders only — the testdata
    * has no o_comment, so the classic NOT LIKE becomes a priority
    * exclusion; the shape under test is identical: the predicate
    * lives in the JOIN clause, so excluded-order customers still
    * surface with count 0 instead of dropping), then the
    * histogram-of-counts double aggregate.
    */
  val qCustomerDistribution: Q = Q.sql(
    "q13_customer_distribution",
    """WITH co AS (
      |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      |  FROM customer c LEFT JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey)
      |SELECT c_count, COUNT(*) AS custdist
      |FROM co GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q14 (promotion effect): what share of a month's revenue
    * came from promo-type parts — the conditional-aggregate ratio.
    * Both sums are decimal-exact before ONE final double divide (the
    * Num contract), so the percentage is bit-identical across
    * engines; `p_type = 'PROMO'` (the testdata's single-word
    * categories) replaces the classic LIKE 'PROMO%'.
    */
  val qPromoRevenue: Q = Q.sql(
    "q14_promo_revenue",
    """SELECT
      |  CAST(SUM(CASE WHEN p.p_type = 'PROMO'
      |    THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
      |      * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue,
      |  CAST(100 AS DOUBLE)
      |    * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
      |        THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
      |          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
      |        ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
      |        * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS promo_pct
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-03-01'
      |  AND CAST(l.l_shipdate AS DATE) < DATE '1996-04-01'""".stripMargin) { (s, d) =>
    val rev = dec(col("l_extendedprice")) * (oneD - rate(col("l_discount")))
    val promoRev = sum(when(col("p_type") === "PROMO", rev)
      .otherwise(lit(0).cast(DecimalType(12, 2)))).cast(DoubleType)
    val totalRev = sum(rev).cast(DoubleType)
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").cast(DateType) >= to_date(lit("1996-03-01")) &&
        col("l_shipdate").cast(DateType) < to_date(lit("1996-04-01")))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(promoRev.as("promo_revenue"), totalRev.as("total_revenue"),
        (lit(100).cast(DoubleType) * promoRev / totalRev).as("promo_pct"))
  }

  /** TPC-H Q22-shape (global sales opportunity): well-funded
    * customers in a nation subset with NO recent urgent orders — the
    * scalar-subquery average threshold plus a correlated NOT EXISTS
    * anti-join, rolled up per country. Adapted predicates (the
    * testdata has no c_phone, and every customer has SOME order):
    * country code = c_nationkey < 10, dormancy = no '1-URGENT' order
    * since 1998 — both non-vacuous at every SF. The average divides
    * a decimal-exact sum by a count once (Num contract), and the
    * threshold compare runs in double in both engines.
    *
    * Scale shape: the 1-row average broadcasts into the customer
    * scan (never a driver-side collect-then-literal); the anti-join
    * hashes on custkey against the pre-filtered urgent-order set.
    */
  val qGlobalSalesOpp: Q = Q.sql(
    "q22_global_sales_opp",
    """WITH avg_pos AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
      |    / COUNT(*) AS a
      |  FROM customer WHERE c_acctbal > 0.0 AND c_nationkey < 10),
      |hot AS (
      |  SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
      |  FROM customer c CROSS JOIN avg_pos
      |  WHERE c.c_nationkey < 10 AND c.c_acctbal > avg_pos.a
      |    AND NOT EXISTS (SELECT 1 FROM orders o
      |      WHERE o.o_custkey = c.c_custkey
      |        AND o.o_orderpriority = '1-URGENT'
      |        AND CAST(o.o_orderdate AS DATE) >= DATE '1998-01-01'))
      |SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM hot GROUP BY 1
      |ORDER BY 1 ASC""".stripMargin) { (s, d) =>
    val cSub = Tables.customer(s, d).filter(col("c_nationkey") < 10)
    val avgPos = cSub.filter(col("c_acctbal") > 0.0)
      .agg((sum(dec(col("c_acctbal"))).cast(DoubleType) / count(lit(1))).as("a"))
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate").cast(DateType) >= to_date(lit("1998-01-01")))
      .select(col("o_custkey"))
    cSub.join(broadcast(avgPos))
      .filter(col("c_acctbal") > col("a"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast(DoubleType).as("totacctbal"))
      .orderBy(col("cntrycode").asc)
  }

  /** TPC-H Q15 (top supplier): per-supplier quarterly revenue, then
    * the supplier(s) achieving the ungrouped MAX of that aggregate —
    * the aggregate-over-aggregate + equality-join shape, which keeps
    * ALL tied winners (a topk-1 would drop ties). The equality
    * compares two doubles both derived from the same decimal-exact
    * sum, so it cannot miss by a bit in either engine.
    *
    * Scale shape: revenue is one suppkey-keyed aggregate; the 1-row
    * MAX broadcasts back into it (never a collect-then-literal);
    * supplier joins last, on the already-aggregated (small) side.
    */
  val qTopSupplier: Q = Q.sql(
    "q15_top_supplier",
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name, r.total_revenue
      |FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
      |WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
      |ORDER BY s_suppkey ASC""".stripMargin) { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate").cast(DateType) >= to_date(lit("1996-01-01")) &&
        col("l_shipdate").cast(DateType) < to_date(lit("1996-04-01")))
      .groupBy("l_suppkey")
      .agg(sum(dec(col("l_extendedprice")) * (oneD - rate(col("l_discount"))))
        .cast(DoubleType).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    Tables.supplier(s, d)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(mx))
      .filter(col("total_revenue") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey").asc)
  }

  /** TPC-H Q21-shape (suppliers who kept orders waiting): for
    * finished orders, count each supplier's late lines on
    * MULTI-supplier orders where that supplier was the ONLY late one
    * — the classic double-correlated EXISTS ("another supplier
    * participated") + NOT EXISTS ("no other supplier was late")
    * composition, late adapted to ship > order + 60 days as in Q4.
    *
    * The oracle keeps the literal EXISTS/NOT-EXISTS form; the engine
    * expresses the SAME predicate as one per-order aggregate —
    * n_suppliers ≥ 2 AND n_late_suppliers = 1 (the late l1 row's
    * supplier then IS the only late one) — because two correlated
    * subqueries over lineitem would scan the fact table three times.
    * Single-pass shape (r12; the r11 form materialized the
    * lineitem⋈orders join TWICE — once for the order stats, once for
    * the late rows — then joined them back, plus a two-distinct
    * Expand): ONE lineitem⋈orders join keyed on orderkey, then a
    * (orderkey, suppkey) aggregate and an orderkey aggregate that BOTH
    * reuse that partitioning (grouping keys ⊇ join key → zero further
    * exchanges), carrying the qualifying order's late supplier and its
    * late-row count in the same pass; numwait is then a tiny
    * suppkey-keyed sum over ≤ #qualifying-orders rows. No
    * countDistinct (no Expand), no join-back, one fact-table scan.
    * Equivalence is definitional — n_late_sup = 1 makes
    * max(late suppkey) THE late supplier and sum(late rows) its l1
    * multiplicity — pinned on a planted fixture in TpchCanonSpec.
    */
  val qSuppliersWaiting: Q = Q.sql(
    "q21_suppliers_waiting",
    """SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderstatus = 'F'
      |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s.s_suppkey, s.s_name
      |ORDER BY numwait DESC, s_suppkey ASC
      |LIMIT 20""".stripMargin) { (s, d) =>
    val isLate = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    // r14 (guide §3.1): the filtered orders side takes a SHUFFLE_HASH
    // hint — it is the smaller side of the fact join and the shuffle on
    // orderkey is paid either way, so the hash build skips both
    // per-partition sorts (and the downstream orderkey-keyed aggregates
    // still ride the join's hash partitioning, exchange-free). Same-host
    // sf10 evidence: better in 4 of 6 interleaved leg pairs, min-of-legs
    // 4.59 s vs 4.91 s (~−8%); the conf-wide probe read 4.53 vs 5.11.
    // Build memory is |orders, status F|/shuffle.partitions — scales
    // down with cluster-sized partition counts.
    val lo = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")).hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
    val perSup = lo
      .groupBy("l_orderkey", "l_suppkey") // rides the join's orderkey partitioning
      .agg(sum(when(isLate, 1L).otherwise(0L)).as("n_late_rows"))
    val qualifying = perSup
      .groupBy("l_orderkey") // still the same partitioning — no exchange
      .agg(count(lit(1)).as("n_sup"),
        sum(when(col("n_late_rows") > 0, 1L).otherwise(0L)).as("n_late_sup"),
        max(when(col("n_late_rows") > 0, col("l_suppkey"))).as("late_suppkey"),
        sum(col("n_late_rows")).as("order_late_rows"))
      .filter(col("n_sup") >= 2 && col("n_late_sup") === 1)
    qualifying
      .groupBy("late_suppkey")
      .agg(sum(col("order_late_rows")).cast(LongType).as("numwait"))
      .join(Tables.supplier(s, d), col("late_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(20)
  }

  /** HASH-PARTITION BALANCE AUDIT — the shuffle-skew pre-check for a
    * planned partitioning: docs bucketed into 16 partitions by the
    * first md5 hex char of doc_id (the engine-portable stand-in for
    * the partitioner hash), per-partition doc count and char mass,
    * and each partition's deviation from the ideal 1/16 share. Read
    * before `repartition($"doc_id")`: a ratio near 1 everywhere says
    * the key hashes evenly, a hot row says re-key or salt — the hash
    * sibling of q_doc_partition_advisor's range analysis.
    *
    * Scale shape: one map-side-combined aggregate to 16 rows, the
    * 1-row total inlined as a scalar literal.
    */
  val qPartitionBalance: Q = Q.sql(
    "q_doc_partition_balance",
    """WITH p AS (
      |  SELECT CAST(instr('0123456789abcdef',
      |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT) AS pid,
      |    n_chars
      |  FROM documents),
      |a AS (
      |  SELECT pid, COUNT(*) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS char_mass
      |  FROM p GROUP BY pid),
      |t AS (SELECT SUM(n_docs) AS total FROM a)
      |SELECT a.pid, a.n_docs, a.char_mass,
      |  CAST(a.n_docs AS DOUBLE) * 16 / t.total AS share_ratio
      |FROM a CROSS JOIN t
      |ORDER BY pid ASC""".stripMargin) { (s, d) =>
    val p = Tables.documents(s, d)
      .select((expr(
        "instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 1, 1))")
        .cast(LongType) - 1).as("pid"), col("n_chars"))
    val a = p.groupBy("pid")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("char_mass"))
    val total = a.agg(sum("n_docs")).head().getLong(0)
    a.select(col("pid"), col("n_docs"), col("char_mass"),
        (col("n_docs").cast(DoubleType) * 16 / lit(total.toDouble))
          .as("share_ratio"))
      .orderBy(col("pid").asc)
  }

  /** TPC-H Q8-shape (national market share): of the PROMO-part
    * revenue sold into ASIA-region customers over two years, what
    * share did NATION_2's suppliers supply, per order year — the
    * widest join tree in the catalog (lineitem ⋈ part ⋈ orders ⋈
    * customer ⋈ nation ⋈ region ⋈ supplier ⋈ nation) with nation
    * used twice in different roles.
    *
    * Scale shape: orders prunes to the two-year window and part to
    * one type BEFORE their joins; the ASIA customer restriction
    * collapses to a broadcast semi-join against a ≤25-row nation⋈
    * region list (customers never widen); supplier⋈nation stays a
    * plain hash join (supplier grows with SF — deliberately NOT
    * broadcast). Conditional volume follows the Q14 decimal contract.
    */
  val qMarketShare: Q = Q.sql(
    "q8_market_share",
    """WITH vol AS (
      |  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
      |    CAST(l.l_extendedprice AS DECIMAL(12,2))
      |      * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume,
      |    n2.n_name AS supp_nation
      |  FROM lineitem l
      |  JOIN part p ON p.p_partkey = l.l_partkey
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      |  JOIN region r ON n1.n_regionkey = r.r_regionkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      |  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
      |    AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      |    AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01')
      |SELECT o_year,
      |  CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS nation_volume,
      |  CAST(SUM(volume) AS DOUBLE) AS total_volume,
      |  CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
      |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
      |FROM vol GROUP BY o_year ORDER BY o_year ASC""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate").cast(DateType) >= to_date(lit("1996-01-01")) &&
        col("o_orderdate").cast(DateType) < to_date(lit("1998-01-01")))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast(IntegerType).as("o_year"))
    val promoParts = Tables.part(s, d)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val asiaNationKeys = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("asia_nkey"))
    val asiaCust = Tables.customer(s, d)
      .join(broadcast(asiaNationKeys),
        col("c_nationkey") === col("asia_nkey"), "left_semi")
      .select("c_custkey")
    val suppNation = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val rev = dec(col("l_extendedprice")) * (oneD - rate(col("l_discount")))
    val natRev = sum(when(col("supp_nation") === "NATION_2", rev)
      .otherwise(lit(0).cast(DecimalType(12, 2)))).cast(DoubleType)
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(promoParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(natRev.as("nation_volume"),
        sum(rev).cast(DoubleType).as("total_volume"))
      .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
      .orderBy(col("o_year").asc)
  }

  /** TPC-H Q12-shape (shipping priority audit): among lines shipped
    * late in 1996 ("late" = shipped > order + 60 days, the catalog's
    * standing Q4 adaptation — the testdata has no
    * commit/receipt dates or ship modes, so the classic per-shipmode
    * split becomes per-returnflag), how many belonged to
    * high-priority vs low-priority orders. The shape under test is
    * the conditional twin-count aggregate over a join with a
    * non-equi residual.
    *
    * Scale shape: the shipdate window prunes lineitem at the scan;
    * orders projects to three columns before the hash join; the
    * rollup is a ≤3-row map-side-combined aggregate. Oracle SUMs
    * cast to BIGINT (DuckDB's bare SUM(INT) widens to HUGEINT — the
    * q_doc_pii_stats lesson).
    */
  val qPriorityShipping: Q = Q.sql(
    "q12_priority_shipping",
    """SELECT l.l_returnflag AS ship_class,
      |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
      |  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |GROUP BY 1 ORDER BY 1 ASC""".stripMargin) { (s, d) =>
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").cast(DateType) >= to_date(lit("1996-01-01")) &&
        col("l_shipdate").cast(DateType) < to_date(lit("1997-01-01")))
      .select(col("l_orderkey"), col("l_shipdate"), col("l_returnflag"))
      .join(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag").as("ship_class"))
      .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("ship_class").asc)
  }

  /** TPC-H Q17-shape (small-quantity-order revenue): yearly revenue
    * lost if Brand#4's below-20%-of-average-quantity orders stopped —
    * the classic correlated scalar-subquery-per-part (avg quantity of
    * THIS part) folded against the same fact table.
    *
    * The engine exploits that p_brand is functionally determined by
    * l_partkey: it semi-joins lineitem down to the brand's parts
    * FIRST, then computes the per-part average with one window over
    * the already-reduced slice — one shuffle on l_partkey total,
    * versus the naive plan's full-table aggregate joined back to the
    * filtered scan (the oracle keeps that naive form; averages over
    * a part's lines are identical either way since brand is a part
    * property). avg() sums small integral quantities — exact in
    * double in both engines, so the 0.2·avg threshold compare is
    * bit-deterministic.
    */
  val qSmallQtyRevenue: Q = Q.sql(
    "q17_small_qty_revenue",
    """WITH pa AS (
      |  SELECT l_partkey, CAST(0.2 AS DOUBLE) * AVG(l_quantity) AS qty_thresh
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |    / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_lines
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |JOIN pa ON pa.l_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#4' AND l.l_quantity < pa.qty_thresh""".stripMargin) { (s, d) =>
    val brandParts = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#4").select("p_partkey")
    val w = Window.partitionBy("l_partkey")
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(brandParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .withColumn("qty_thresh",
        lit(0.2).cast(DoubleType) * avg(col("l_quantity")).over(w))
      .filter(col("l_quantity") < col("qty_thresh"))
      .agg((sum(dec(col("l_extendedprice"))).cast(DoubleType) / lit(7.0))
          .as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q19-shape (discounted revenue, disjunctive predicate):
    * revenue from three OR'd (brand, size-range, quantity-range)
    * conjunct groups spanning BOTH join sides — the canonical
    * pushdown-through-OR stress test (containers/shipmodes absent
    * from the testdata become size ranges).
    *
    * Catalyst cannot always factor a cross-table disjunction, so the
    * engine adds the IMPLIED per-table prefilters by hand — p_brand
    * IN (…) ∧ p_size ≤ 35 on part, 1 ≤ l_quantity ≤ 30 on lineitem
    * (each the union of its disjunct's bounds, so semantics are
    * unchanged) — which reach both parquet scans as PushedFilters;
    * the exact disjunction then runs as the join residual over the
    * pre-shrunk inputs.
    */
  val qDisjunctiveRevenue: Q = Q.sql(
    "q19_disjunctive_revenue",
    """SELECT
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
      |    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 15
      |    AND l.l_quantity BETWEEN 1 AND 11)
      |  OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 25
      |    AND l.l_quantity BETWEEN 10 AND 20)
      |  OR (p.p_brand = 'Brand#8' AND p.p_size BETWEEN 1 AND 35
      |    AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
    val p = Tables.part(s, d)
      .filter(col("p_brand").isin("Brand#2", "Brand#19", "Brand#8") &&
        col("p_size").between(1, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val l = Tables.lineitem(s, d)
      .filter(col("l_quantity").between(1, 30))
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
    val disjunct =
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#19" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#8" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 30))
    l.join(p, col("p_partkey") === col("l_partkey"))
      .filter(disjunct)
      .agg(sum(dec(col("l_extendedprice")) * (oneD - rate(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val all: Seq[Q] = Seq(qSetOps, qRollup, qPivot, qWindowFuncs, qCube, qTimeFill,
    qLayoutZorder, qLayoutSkipStats, qLayoutHilbert, qLayoutCompare,
    qLayoutBloomStats, qMarketBasket, qFulfillmentLatency,
    qLargeVolumeCustomers, qPartitionBalance, qOrderPriority, qForecastRevenue,
    qReturnedItems, qCustomerDistribution, qPromoRevenue, qGlobalSalesOpp,
    qTopSupplier, qSuppliersWaiting, qGroupingSets, qSetOpsAll,
    qMarketShare, qPriorityShipping, qSmallQtyRevenue, qDisjunctiveRevenue,
    qCustomerGini, qDocLengthGini)
}
