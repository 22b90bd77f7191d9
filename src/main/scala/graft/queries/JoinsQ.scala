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

  val all: Seq[Q] = Seq(qAsOfJoin, qRangeJoin)
}
