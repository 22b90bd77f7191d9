package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Ground truth for q_join_skew_advisor: exact pair-space arithmetic,
  * ceiling-division salt factor, null-key exclusion, and ordering.
  */
class JoinSkewAdvisorSpec extends SparkSpecBase {
  import spark.implicits._

  /** 2048 "hot" rows, 3 "cold" rows, 2 null-key rows. 2048² = 2^22 =
    * exactly 4× the 2^20 salt target, so salt_factor = 4 with no
    * ceiling remainder; 3² = 9 → salt_factor = 1 (ceiling of a tiny
    * fraction).
    */
  private lazy val dir: String = {
    val rows =
      (1 to 2048).map(i => (i.toLong, "hot")) ++
        (3000 to 3002).map(i => (i.toLong, "cold")) ++
        Seq((4000L, null: String), (4001L, null: String))
    val d = java.nio.file.Files.createTempDirectory("skew_fix").toString
    rows.map { case (id, t) => (id, Timestamp.valueOf("2024-01-01 00:00:00"),
      id % 7, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("planted skew: exact pair counts, ceiling salt, null keys excluded") {
    val out = SparkEntry.queries("q_join_skew_advisor")(spark, dir).collect()
    assert(out.length == 2, out.mkString("; "))
    // n_pairs is DECIMAL(38,0) internally (a Long n² wraps negative
    // past ~3e9 rows per key — the exact mega-key regime the advisor
    // exists for) but PUBLISHED as its exact digit string: the r13
    // fix for the driver-red wide-decimal hashed surface
    val hot = out.head
    assert(hot.getString(0) == "hot" && hot.getLong(1) == 2048L)
    assert(BigInt(hot.getString(2)) == BigInt(2048L) * 2048L)
    assert(hot.getLong(4) == 4L, s"salt ${hot.getLong(4)}")
    val cold = out(1)
    assert(cold.getString(0) == "cold" && BigInt(cold.getString(2)) == 9)
    assert(cold.getLong(4) == 1L, "any nonempty key needs at least one split")
    // share is exact integer ppm (floor): no IEEE division anywhere
    val total = 2048L * 2048L + 9L
    assert(hot.getLong(3) == 2048L * 2048L * 1000000L / total)
    assert(cold.getLong(3) == 9L * 1000000L / total)
  }

  test("corpus run: ppm shares sum to ~1e6 (floor loss < #keys) and ordering is pair-count desc") {
    val rows = SparkEntry.queries("q_join_skew_advisor")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getLong(3))
    assert(shares.sum <= 1000000L && shares.sum > 1000000L - rows.length,
      s"ppm sum ${shares.sum} over ${rows.length} keys")
    val pairs = rows.map(r => BigInt(r.getString(2)))
    assert(pairs.toSeq == pairs.sortBy(p => -p).toSeq)
    rows.foreach { r =>
      assert(BigInt(r.getString(2)) == BigInt(r.getLong(1)) * r.getLong(1))
      assert(r.getLong(4) >= 1L)
    }
  }

  test("mega-key arithmetic: n-squared past Long range stays exact in decimal") {
    // 4e9 rows on one key -> n² = 1.6e19 > Long.MaxValue (9.22e18),
    // wraps negative as a Long; the decimal path must carry it
    // exactly, and Spark's integral `div` on the decimal must agree
    // with DuckDB's HUGEINT `//` (cross-checked: 15258789062500)
    import org.apache.spark.sql.types.{DecimalType, LongType}
    import spark.implicits._
    val r = Seq(4000000000L).toDF("n_rows")
      .select((col("n_rows").cast(DecimalType(38, 0)) * col("n_rows"))
        .cast(DecimalType(38, 0)).as("n_pairs"))
      .select(col("n_pairs"),
        expr("(n_pairs + 1048575) div 1048576").cast(LongType).as("salt"))
      .head()
    assert(r.getDecimal(0).toBigInteger
      == new java.math.BigInteger("16000000000000000000"))
    assert(r.getLong(1) == 15258789062500L)
  }

  test("plan: one map-side-combined aggregate over a keys-only scan, no shuffled join") {
    val p = SparkEntry.queries("q_join_skew_advisor")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "key counts must partial-aggregate map-side")
    assert(!p.linesIterator.exists(l => l.contains("Scan") && l.contains("value#")),
      "the advisor must scan join keys only, not event payloads")
  }
}
