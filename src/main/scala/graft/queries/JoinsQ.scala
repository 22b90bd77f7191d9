package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.transform.Ops
import Num._

/** Advanced join operators beyond the reference's equi-join surface —
  * the time-series and interval shapes a training-data pipeline needs,
  * each built scalably from existing operators (SURVEY §7.4 preference
  * (a)) and oracle-checked (DuckDB has native ASOF JOIN, making the
  * as-of semantics independently verifiable).
  */
object JoinsQ {

  /** As-of join: each 'view' event picks up the user's latest
    * 'purchase' at-or-before it. Plan shape: union + one shuffle on
    * user_id + keyed window — no range join, no nested loop
    * (Ops.asOfJoin doc). Right side pre-deduped to unique (user, ts)
    * via aggregation in BOTH engines.
    */
  val qAsOfJoin: Q = Q.sql(
    "q_asof_join",
    """WITH l AS (
      |  SELECT event_id, user_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
      |  FROM events WHERE event_type = 'view'),
      |r AS (
      |  SELECT user_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec,
      |    CAST(MAX(TRY_CAST(CASE WHEN isnan(value) THEN NULL ELSE value END AS DECIMAL(12,2))) AS DOUBLE) AS last_purchase_value
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY 1, 2)
      |SELECT l.event_id, l.user_id, l.ts_sec,
      |  r.last_purchase_value, r.ts_sec AS last_purchase_sec
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_sec >= r.ts_sec
      |ORDER BY l.event_id ASC""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .withColumn("ts_sec",
        floor(unix_micros(col("ts")) / lit(1000000L)).cast(LongType))
    val left = ev.filter(col("event_type") === "view")
      .select("event_id", "user_id", "ts_sec")
    val right = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts_sec")
      .agg(max(dec(col("value"))).cast(DoubleType).as("last_purchase_value"))
      .withColumn("last_purchase_sec", col("ts_sec"))
    Ops.asOfJoin(left, right, key = "user_id",
        leftTs = "ts_sec", rightTs = "ts_sec",
        payload = Seq("last_purchase_value", "last_purchase_sec"))
      .select("event_id", "user_id", "ts_sec", "last_purchase_value",
        "last_purchase_sec")
      .orderBy(col("event_id").asc)
  }

  /** Interval (range) join via binning: orders matched to overlapping
    * price bands through a bin equi-join + exact rerank instead of a
    * nested-loop theta join (Ops.rangeJoinBinned doc). Bands overlap
    * (20k step, 30k width) so multi-matches are exercised.
    */
  val qRangeJoin: Q = Q.sql(
    "q_range_join",
    s"""WITH bands AS (
       |  SELECT n_nationkey AS band_id,
       |    CAST(n_nationkey * 20000 AS DOUBLE) AS lo,
       |    CAST(n_nationkey * 20000 + 29999.99 AS DOUBLE) AS hi
       |  FROM nation)
       |SELECT b.band_id, COUNT(*) AS n,
       |  ${Num.sqlDsum("o.o_totalprice")} AS sum_price
       |FROM orders o JOIN bands b
       |  ON o.o_totalprice >= b.lo AND o.o_totalprice <= b.hi
       |GROUP BY b.band_id
       |ORDER BY band_id ASC""".stripMargin) { (s, d) =>
    val bands = Tables.nation(s, d).select(
      col("n_nationkey").as("band_id"),
      (col("n_nationkey") * 20000).cast(DoubleType).as("lo"),
      (col("n_nationkey") * 20000 + 29999.99).cast(DoubleType).as("hi"))
    Ops.rangeJoinBinned(Tables.orders(s, d), "o_totalprice",
        bands, "lo", "hi", binWidth = 10000)
      .groupBy("band_id")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("band_id").asc)
  }

  /** Target output rows per task for [[qJoinSkewAdvisor]]'s salt
    * recommendation (2^20 — the order of rows a shuffle task should
    * own before a skewed key needs splitting).
    */
  private val skewTargetRows = 1048576L

  /** JOIN-SKEW ADVISOR — the pre-flight profile a 100 TB self-join
    * needs BEFORE running: per join key, the row count, the pair-space
    * contribution n² (what a self-join on that key would emit), its
    * share of the total output, and the recommended salt factor
    * ⌈n² / [[skewTargetRows]]⌉ — the split count that brings the key's
    * output back under one task's budget (the manual form of AQE's
    * skew-join mitigation, computable from a keys-only scan). The
    * catalog's pair-join families (LSH buckets, basket pairs, band
    * joins) all live or die by exactly this bound; this operator turns
    * the Σ n² analysis their scaladocs argue BY HAND into a query.
    *
    * NULL keys never meet an inner join, so they are excluded (the
    * standard advisor convention; a null-heavy key column shows up in
    * the profile's absence, not as a fake mega-key).
    *
    * Scale shape: one map-side-combined groupBy over the keys-only
    * scan, a broadcast 1-row total, and a ≤ #keys output — the
    * advisor costs one aggregation however large the fact table. All
    * arithmetic is exact: n² and its corpus sum are DECIMAL(38,0) —
    * a Long n² wraps negative past ~3.04e9 rows per key, i.e. exactly
    * the mega-key regime the advisor exists to catch (Spark non-ANSI
    * wraps, DuckDB raises: wrong answer AND divergence) — and the
    * ceiling division is an integral divide of the decimal (exact up
    * to salt factors of 2^63, reached only past ~3.1e12 rows on one
    * key). The share ratio is integer parts-per-million — an exact
    * integral divide in both engines (the q_doc_pii_stats permille
    * idiom): a DOUBLE quotient of DECIMAL(38,0) operands hits
    * engine-specific decimal→double rounding paths (the r9 audit
    * class) and is banned from hashed columns. The ×1e6 scaling is
    * exact while n_pairs < ~1.7e32 (DuckDB's int128 ceiling; Spark's
    * DECIMAL(38,0) holds more) — i.e. under ~1.3e16 rows on a single
    * key, far past any real corpus.
    *
    * PUBLISHED n_pairs is VARCHAR, not DECIMAL(38,0): the decimal math
    * stays internal, and the hashed output carries its exact digit
    * string. Rationale (r13): a wide-decimal OUTPUT column is the one
    * type a downstream normalizer may render through engine-specific
    * decimal128 paths (the r10 HUGEINT→DOUBLE double-rounding family)
    * — this row was value-exact locally yet hash-red on the driver two
    * rounds running, and it was the catalog's only remaining
    * DECIMAL(38) output. Both engines render a scale-0 decimal as
    * plain digits, so the VARCHAR round-trip (proven driver-green in
    * the ab_test/anomaly z columns) is exact and unambiguous. The
    * total order keys off n_rows — n_pairs = n_rows² is strictly
    * monotone in it — so ordering never touches the string form.
    */
  val qJoinSkewAdvisor: Q = Q.sql(
    "q_join_skew_advisor",
    s"""WITH k AS (
       |  SELECT event_type AS join_key, COUNT(*) AS n_rows
       |  FROM events WHERE event_type IS NOT NULL
       |  GROUP BY event_type),
       |p AS (
       |  SELECT join_key, n_rows,
       |    CAST(CAST(n_rows AS DECIMAL(38,0)) * n_rows AS DECIMAL(38,0))
       |      AS n_pairs
       |  FROM k),
       |tot AS (SELECT CAST(SUM(n_pairs) AS DECIMAL(38,0)) AS t FROM p)
       |SELECT join_key, n_rows, CAST(n_pairs AS VARCHAR) AS n_pairs,
       |  CAST(CAST(n_pairs AS HUGEINT) * 1000000
       |    // CAST(t AS HUGEINT) AS BIGINT) AS share_ppm,
       |  CAST(CAST(n_pairs + ${skewTargetRows - 1} AS HUGEINT)
       |    // $skewTargetRows AS BIGINT) AS salt_factor
       |FROM p CROSS JOIN tot
       |ORDER BY n_rows DESC, join_key ASC""".stripMargin) { (s, d) =>
    val k = Tables.events(s, d)
      .filter(col("event_type").isNotNull)
      .groupBy(col("event_type").as("join_key"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("join_key"), col("n_rows"),
        (col("n_rows").cast(DecimalType(38, 0)) * col("n_rows"))
          .cast(DecimalType(38, 0)).as("n_pairs"))
    val tot = k.agg(sum("n_pairs").cast(DecimalType(38, 0)).as("t"))
    k.crossJoin(broadcast(tot))
      .select(col("join_key"), col("n_rows"),
        col("n_pairs").cast(StringType).as("n_pairs"),
        expr("(n_pairs * 1000000) div t").cast(LongType).as("share_ppm"),
        expr(s"(n_pairs + ${skewTargetRows - 1}) div $skewTargetRows")
          .cast(LongType).as("salt_factor"))
      .orderBy(col("n_rows").desc, col("join_key").asc)
  }

  val all: Seq[Q] = Seq(qAsOfJoin, qRangeJoin, qJoinSkewAdvisor)
}
