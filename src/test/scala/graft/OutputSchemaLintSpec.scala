package graft

import org.apache.spark.sql.types._

/** Catalog-WIDE hashed-output TYPE linter (round-12 verdict #2): walks
  * the OUTPUT schema of every `SparkEntry.queries` entry and fails on
  * the column types that have produced value-equal-but-hash-different
  * driver rows — the r9/r10/r12 audit class, now as code instead of a
  * BENCH_NOTES checklist:
  *
  *   - `wide-decimal`: DecimalType(precision > 18). Decimal128 values
  *     route through engine/normalizer-specific rendering (DuckDB
  *     HUGEINT→DOUBLE double-rounding, decimal128 string forms);
  *     q_join_skew_advisor shipped driver-red for two rounds on
  *     exactly this. Wide decimals are for INTERNAL math; publish a
  *     digit string (VARCHAR round-trip) or a BIGINT with a documented
  *     overflow contract.
  *   - `float32`: FloatType. Float→string formatting differs between
  *     engines (shortest-roundtrip vs %g); no catalog query needs a
  *     published float32.
  *   - `double`: DoubleType — allowed ONLY when pinned in
  *     `src/test/resources/double_output_pins.json` with an idiom tag.
  *     A double is hash-safe under the determinism contract
  *     (QueryDef.scala) under exactly four idioms (every pin was
  *     audited against its defining expression in round 14; the
  *     original 193-entry `r12-driver-green` grandfather set is gone
  *     and `grandfatherCeiling` = 0 keeps it gone):
  *       - `dsum`: decimal-exact arithmetic (sum/max/windowed sum over
  *         DECIMAL-cast operands) with ONE terminal widening to
  *         double. Order-independent in any engine.
  *       - `ieee-pinned`: at most ONE rounding IEEE op (typically the
  *         final division) on operands whose VALUES are exactly
  *         determined — integer/decimal arithmetic, pinned literals,
  *         power-of-two scaling, and correctly-rounded operand
  *         widenings (long/decimal→double casts) do not count as
  *         rounding ops — replayed identically in the oracle SQL.
  *       - `raw-column`: a source/scan value passed through or
  *         SELECTED (filter, CASE guard, argmax snapshot, min/max,
  *         top-k, exact-quantile pick) with no FP arithmetic.
  *       - `replay`: a deterministic scalar fold of 2+ rounding IEEE
  *         ops (+,−,×,÷,√,round) in PINNED operand order over
  *         deterministic inputs — or a value read from a shared
  *         oracle-aux table — replayed op-for-op in the oracle SQL.
  *         No order-dependent double aggregation, no transcendentals
  *         (IEEE 754 requires correct rounding for ÷ and √ but not
  *         for libm log/exp/pow, so those stay banned).
  *
  * Nested types are walked (array/map/struct elements hash too).
  * Like CatalogPlanLintSpec, the pin set may not rot: a pin whose
  * (query, column) no longer exists — or no longer types as double —
  * fails the suite as stale.
  */
class OutputSchemaLintSpec extends SparkSpecBase {

  /** One entry = one justified IDIOM: the lint code it accepts, the
    * exact (query → columns) it covers, and the replay argument.
    */
  private case class Allow(code: String, cols: Map[String, Set[String]], why: String)

  private val allowed: Seq[Allow] = Seq()

  /** Idiom tags a NEW double pin may use (scaladoc above). */
  private val newPinTags = Set("dsum", "ieee-pinned", "raw-column", "replay")

  /** The `r12-driver-green` grandfather set was burned down to ZERO in
    * round 14 (every pin re-audited against its defining expression
    * and tagged with its idiom); the ceiling stays at 0 so the tag can
    * never be reintroduced.
    */
  private val grandfatherCeiling = 0

  private lazy val doublePins: Map[String, String] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/double_output_pins.json"))
    val text = try src.mkString finally src.close()
    // flat {"query.column": "tag"} object; parse without a JSON lib
    """"([^"]+)"\s*:\s*"([^"]+)"""".r.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  private def leafTypes(dt: DataType): Seq[DataType] = dt match {
    case s: StructType => s.fields.toSeq.flatMap(f => leafTypes(f.dataType))
    case a: ArrayType => leafTypes(a.elementType)
    case m: MapType => leafTypes(m.keyType) ++ leafTypes(m.valueType)
    case other => Seq(other)
  }

  private def codeOf(dt: DataType): Option[String] = dt match {
    case d: DecimalType if d.precision > 18 => Some("wide-decimal")
    case FloatType => Some("float32")
    case DoubleType => Some("double")
    case _ => None
  }

  test("every catalog query's published schema is hash-stable-typed (allow-list justified, non-rotting)") {
    val lint = spark
    val prepares = SparkEntry.prepares
    val found: Seq[(String, String, String)] =
      SparkEntry.catalog.sortBy(_.name).flatMap { q =>
        try prepares.get(q.name).foreach(p => p(lint, sfDir))
        catch { case _: Throwable => () }
        val schema =
          try q.fn(lint, sfDir).schema
          catch { case t: Throwable =>
            fail(s"${q.name}: query build failed during schema lint — " +
              s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("")
                .linesIterator.take(3).mkString(" | ")}")
          }
        schema.fields.toSeq.flatMap { f =>
          leafTypes(f.dataType).flatMap(codeOf).distinct
            .map(code => (q.name, f.name, code))
        }
      }
    def covered(n: String, col: String, c: String): Boolean = c match {
      case "double" => doublePins.contains(s"$n.$col")
      case _ => allowed.exists(a => a.code == c && a.cols.get(n).exists(_(col)))
    }
    val bad = found.filterNot { case (n, col, c) => covered(n, col, c) }
    assert(bad.isEmpty,
      "hash-unstable output column types (fix the type; or for a double " +
        "authored against a contract idiom, pin it in " +
        "double_output_pins.json with its tag):\n" +
        bad.map { case (n, col, c) => s"  $n.$col [$c]" }.mkString("\n"))
    // pins may not rot: every pin must still name a live double column
    val liveDoubles = found.collect { case (n, col, "double") => s"$n.$col" }.toSet
    val stale = doublePins.keys.filterNot(liveDoubles).toSeq.sorted
    assert(stale.isEmpty,
      s"stale double pins (column gone or type changed — remove): $stale")
    // the grandfather set may only shrink; new pins need a real idiom tag
    val badTags = doublePins.filter { case (_, t) =>
      !newPinTags(t) && t != "r12-driver-green" }
    assert(badTags.isEmpty, s"unknown pin tags: $badTags")
    val grandfathered = doublePins.count(_._2 == "r12-driver-green")
    assert(grandfathered <= grandfatherCeiling,
      s"grandfather set grew ($grandfathered > $grandfatherCeiling): a new " +
        "double column must carry one of " + newPinTags.mkString("/"))
    info(s"${SparkEntry.catalog.size} schemas linted; " +
      s"${found.size} pinned double columns ($grandfathered grandfathered)")
  }
}
