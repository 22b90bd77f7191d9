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

  /** rows-only query → its ground-truth spec class (must exist).
    * EMPTY since round 7: the last holdout (q_events_sketch_stats)
    * flipped to hash-verified by replacing Spark's opaque HLL++/GK
    * internals with relational sketches — KMV bottom-k distinct (the
    * q_events_wau_sketch move) + adaptive-histogram percentiles —
    * that DuckDB replays bit-identically. (langid + wau_sketch
    * flipped in round 5; fingerprint + compress_ratio in round 6 via
    * the oracle-aux replay pattern.) SketchSpec still bounds its
    * accuracy vs the exact answers.
    */
  private val rowsOnlySpecs: Map[String, String] = Map.empty

  /** Global single-row aggregates — the only queries exempt from the
    * total-ORDER-BY rule (one row needs no order).
    */
  private val singleRowAggregates = Set("q_out_of_range_counts",
    "q_food_gaps_geo", "q6_forecast_revenue", "q14_promo_revenue",
    "q17_small_qty_revenue", "q19_disjunctive_revenue")

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

  test("no oracle interpolates an uninitialized constant (forward-reference guard)") {
    // Scala object vals initialize in declaration order: an oracle
    // string interpolating a val declared BELOW it silently reads
    // 0/null — this disabled q_doc_fingerprint_neardup's DF cap once
    // ("HAVING COUNT(*) <= 0"). DF caps are never legitimately zero,
    // and aux paths never legitimately contain "null", so both read as
    // init bugs; the interpolated caps/thresholds are additionally
    // pinned to their intended values by name.
    SparkEntry.catalog.foreach { q =>
      q.oracle.foreach { sql =>
        assert(!sql.matches("(?s).*HAVING\\s+COUNT\\(\\*\\)\\s*<=\\s*0\\D.*"),
          s"${q.name}: zero DF cap in oracle — forward-referenced val?")
        assert(!sql.contains("null"),
          s"${q.name}: null-interpolated value in oracle")
      }
    }
    val pins = Map(
      "q_doc_fingerprint_neardup" -> Seq("COUNT(*) <= 100", ">= 3"),
      "q_doc_ngram_jaccard" -> Seq("COUNT(*) <= 1000"),
      "q_doc_minhash_lsh" -> Seq(">= 0.5"),
      "q_doc_curate" -> Seq(">= 5", "< 10", "/ 1000.0"),
      // doc_id boundary: a forward-referenced curateBenchMaxDocId reads
      // 0 and silently widens the corpus to include the bench stand-ins
      // (caught live in round 5 — the pattern guard below now covers it)
      "q_doc_decontam_spans" -> Seq(">= 10", "< 10"),
      "q_doc_contamination" -> Seq(">= 10", "< 10"))
    // generalized zero-boundary guard: the doc_id bench boundary is
    // never legitimately zero in any oracle that filters on it
    SparkEntry.catalog.foreach { q =>
      q.oracle.foreach { sql =>
        assert(!sql.matches("(?s).*doc_id\\s*[<>]=?\\s*0\\D.*"),
          s"${q.name}: zero doc_id boundary in oracle — forward-referenced val?")
      }
    }
    val byName = SparkEntry.catalog.map(q => q.name -> q).toMap
    pins.foreach { case (name, subs) =>
      val sql = byName(name).oracle.get
      subs.foreach(sub => assert(sql.contains(sub),
        s"$name: expected interpolated constant '$sub' missing from oracle"))
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
