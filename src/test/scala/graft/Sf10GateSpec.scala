package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Mechanized 10×-probe gate (round-11 verdict #4): the ≤1.04/decade
  * rule used to live in discipline only — nothing failed when a
  * pair-join query was edited without a fresh sf1→sf10 exponent. This
  * spec closes that hole for the WHOLE catalog:
  *
  *   - `src/test/resources/sf10_exponent_pins.json` pins, per query,
  *     the plan fingerprint it was probed at ([[FingerprintKit]]) and
  *     the measured scale exponent (adjudicated per
  *     tools/update_pins.py — family-sum when memo builds dominate);
  *   - any semantic edit to a query changes its analyzed-plan
  *     fingerprint → this spec fails until the probe re-runs and
  *     tools/update_pins.py re-pins it;
  *   - a pinned exponent > 1.04/decade fails unless the query carries
  *     a named floor below, WITH its justification — same contract as
  *     CatalogPlanLintSpec's allow-list.
  *
  * Re-pin workflow (also in tools/update_pins.py --help):
  *   sbt -batch "Test/runMain graft.Sf1GenMain /tmp/graft_sf1 10"
  *   sbt -batch "Test/runMain graft.Sf1GenMain /tmp/graft_sf10 100"
  *   SPARK_GRAFT_BENCH_ONLY=<q> SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
  *     sbt -batch "runMain graft.Bench" 2>/dev/null | grep metric > lo.json
  *   (same with /tmp/graft_sf10 > hi.json)
  *   sbt -batch "Test/runMain graft.FingerprintDumpMain"
  *   python3 tools/update_pins.py /tmp/graft_fingerprints.json lo.json \
  *     hi.json --only <q>
  */
class Sf10GateSpec extends SparkSpecBase {

  private val maxExponent = 1.04

  /** Named floors: queries whose measured exponent exceeds the gate by
    * DESIGN. Every entry carries the argument; an entry whose pinned
    * exponent drops back under the gate fails as stale.
    */
  private val floors: Map[String, String] = Map(
    "q_embedding_neardup" ->
      ("the DISCLOSED exact all-pairs oracle baseline (SimilarityQ " +
        "scaladoc): kept deliberately as the ground-truth twin that " +
        "calibrates q_embedding_neardup_lsh's recall; the production " +
        "path is the LSH twin (pinned ~0.2/decade). Output itself is " +
        "the quadratic object — no plan fixes an exact all-pairs ask")
  )

  private case class Pin(fp: String, exp: Double, basis: String)

  private lazy val pins: Map[String, Pin] = {
    val url = getClass.getResource("/sf10_exponent_pins.json")
    assert(url != null, "missing resource sf10_exponent_pins.json — " +
      "run tools/update_pins.py (see scaladoc)")
    val root = new ObjectMapper().readTree(url)
    root.properties().asScala.map { e =>
      val v = e.getValue
      e.getKey -> Pin(v.get("fp").asText(), v.get("exp").asDouble(),
        v.get("basis").asText())
    }.toMap
  }

  test("every catalog query carries a 10x-probe pin at its CURRENT plan fingerprint") {
    val live = FingerprintKit.dumpAll(spark, sfDir,
      sys.env.get("SPARK_GRAFT_GATE_DEBUG"))
    val unpinned = live.keySet -- pins.keySet
    assert(unpinned.isEmpty,
      s"new queries without an sf1->sf10 probe (run the re-pin workflow " +
        s"in the scaladoc): ${unpinned.toSeq.sorted.mkString(", ")}")
    val stale = pins.keySet -- live.keySet
    assert(stale.isEmpty,
      s"pins for queries no longer in the catalog (remove via " +
        s"tools/update_pins.py or hand-edit): ${stale.toSeq.sorted.mkString(", ")}")
    val drifted = live.toSeq.sortBy(_._1).collect {
      case (q, fp) if pins(q).fp != fp => s"$q (pinned ${pins(q).fp}, live $fp)"
    }
    assert(drifted.isEmpty,
      "query plans changed since their last sf1->sf10 probe — re-run the " +
        "probe and tools/update_pins.py --only for:\n  " +
        drifted.mkString("\n  "))
    val broken = live.collect { case (q, fp) if fp.startsWith("error:") => q }
    assert(broken.isEmpty, s"queries failed to build: $broken")
  }

  test("fingerprints are deterministic AND sensitive (the detector cannot rot silently)") {
    import org.apache.spark.sql.functions._
    val base = spark.range(10).toDF("id")
    def fp(df: org.apache.spark.sql.DataFrame) =
      FingerprintKit.fingerprint(df, sfDir)
    // deterministic: same construction → same fingerprint (exprIds
    // advance between builds; the strip must erase them)
    assert(fp(base.filter(col("id") > 3)) == fp(base.filter(col("id") > 3)))
    // sensitive: a changed literal, a changed predicate shape, and a
    // dropped hint must each change the fingerprint
    assert(fp(base.filter(col("id") > 3)) != fp(base.filter(col("id") > 4)))
    assert(fp(base.filter(col("id") > 3)) != fp(base.filter(col("id") >= 3)))
    val other = spark.range(10).toDF("bid")
    val hinted = base.join(broadcast(other), col("id") === col("bid"))
    val unhinted = base.join(other, col("id") === col("bid"))
    assert(fp(hinted) != fp(unhinted),
      "a broadcast() hint must be visible to the fingerprint (r12 PMI precedent)")
  }

  test("every pinned exponent is <= 1.04/decade or carries a named, justified floor") {
    val over = pins.collect {
      case (q, p) if p.exp > maxExponent && !floors.contains(q) =>
        s"$q exp=${p.exp} (${p.basis})"
    }
    assert(over.isEmpty,
      "super-linear scale exponents without a named floor (fix the plan " +
        "or add the floor WITH its argument):\n  " + over.mkString("\n  "))
    val staleFloors = floors.keys.filter(q =>
      pins.get(q).forall(_.exp <= maxExponent))
    assert(staleFloors.isEmpty,
      s"named floors whose pinned exponent no longer exceeds the gate " +
        s"(remove them): ${staleFloors.mkString(", ")}")
  }
}
