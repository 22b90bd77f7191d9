package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical enforcement of the catalog's contracts (QueryDef.scala +
  * the round-1 verdict's "no_oracle queries verified by nothing"
  * critique): naming, determinism (total ORDER BY), and — crucially —
  * that every rows-only query names an existing ground-truth spec
  * class. Adding an unverified query breaks THIS suite, not a future
  * review.
  */
class CatalogContractSpec extends AnyFunSuite {

  /** rows-only query → its ground-truth spec class (must exist). */
  private val rowsOnlySpecs: Map[String, String] = Map(
    // q_doc_fingerprint's output IS the signature — materializing it
    // for a replay would make the oracle read back its own answer, so
    // it stays rows-only with the golden-window spec as ground truth.
    // langid/compress_ratio need kernels DuckDB lacks (char-ngram
    // model, deflate); sketches are approximate by definition.
    "q_doc_langid" -> "graft.LangIdSpec",
    "q_doc_compress_ratio" -> "graft.TextFunctionsSpec",
    "q_doc_fingerprint" -> "graft.FingerprintSpec",
    "q_events_sketch_stats" -> "graft.SketchSpec",
    "q_events_wau_sketch" -> "graft.SketchSpec")

  /** Global single-row aggregates — the only queries exempt from the
    * total-ORDER-BY rule (one row needs no order).
    */
  private val singleRowAggregates = Set("q_out_of_range_counts", "q_food_gaps_geo")

  test("query names are unique, snake_case, and q_-prefixed") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size == names.size)
    names.foreach { n =>
      assert(n.matches("q[0-9]*_?[a-z0-9_]+"), s"bad name: $n")
    }
  }

  test("every oracle query ends in a total ORDER BY (determinism contract)") {
    SparkEntry.catalog.filter(_.oracle.isDefined).foreach { q =>
      val sql = q.oracle.get.toUpperCase
      assert(sql.contains("ORDER BY") || singleRowAggregates.contains(q.name),
        s"${q.name}: oracle lacks ORDER BY and is not a known single-row aggregate")
    }
  }

  test("every rows-only query has an existing ground-truth spec class") {
    val rowsOnly = SparkEntry.catalog.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(rowsOnly == rowsOnlySpecs.keySet,
      s"unmapped rows-only queries: ${rowsOnly.diff(rowsOnlySpecs.keySet)}; " +
        s"stale mappings: ${rowsOnlySpecs.keySet.diff(rowsOnly)}")
    rowsOnlySpecs.foreach { case (query, specClass) =>
      val cls = Class.forName(specClass)
      assert(classOf[org.scalatest.Suite].isAssignableFrom(cls),
        s"$query: $specClass is not a ScalaTest suite")
    }
  }

  test("oracle and Spark column-name agreement is testable (SQL aliases present)") {
    // the driver hash-compares columns sorted BY NAME — a missing alias
    // surfaces as DuckDB's default name (contains '(' or '*')
    SparkEntry.catalog.flatMap(_.oracle).foreach { sql =>
      val selectHead = sql.linesIterator.mkString(" ")
      assert(!selectHead.matches(""".*SELECT [a-z_]+\(.*\)\s+FROM.*"""),
        "unaliased aggregate in oracle SELECT")
    }
  }
}
