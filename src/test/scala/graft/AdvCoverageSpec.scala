package graft

import org.apache.spark.sql.functions._

/** Mutation test of the adversarial gate (round-10 verdict #4).
  *
  * `tools/check_adversarial.sh` proves Spark-vs-DuckDB agreement on a
  * corpus where every data-dependent branch fires — but a PLANTED
  * corpus can rot the same way an allow-list can: if a plant class
  * stops firing (a regex that no longer matches anything, a cap that
  * no longer binds, ties that are no longer ties after a generator
  * edit), the gate keeps passing vacuously, proving agreement on
  * branches that no longer execute. That is exactly how
  * q_doc_pii_stats stayed green-but-wrong for two rounds.
  *
  * Mechanism: regenerate the adversarial corpus AND a "neutralized"
  * twin ([[AdvGenMain.neutralize]]) — same tables, same row counts,
  * same planted keys, bland content. For each plant class, a
  * designated catalog query runs on both corpora; the class "fires"
  * iff the outputs DIVERGE (order-independent xxhash64 fold, the same
  * materialization Bench times). Divergence can only come from the
  * adversarial CONTENT, never from mere row addition — so a dead
  * class reads as hash-equal and this spec goes red.
  *
  * Structural plants (key-relational: the no-orders customer, the
  * no-lineitem order, the memberless nation/region, the 1-event user,
  * the cap-binding cluster WIDTHS) survive a content swap by
  * construction, so they are asserted directly on the adversarial
  * corpus instead.
  *
  * Prepare hooks are deliberately NOT run: they publish oracle-replay
  * artifacts into the shared corpus-keyed aux store, and the neutral
  * twin shares some corpus keys with the real adversarial corpus
  * (SUM(vec_id) is content-independent) — publishing its models would
  * poison the real gate's replay. Every `queries` fn is a pure read
  * (SparkEntry contract), so the Spark side needs no prepare.
  */
class AdvCoverageSpec extends SparkSpecBase {

  private val advDir = "/tmp/graft_advcov"
  private val neuDir = "/tmp/graft_advcov_neutral"

  private lazy val corpora: Unit = {
    AdvGenMain.generate(spark, advDir)
    AdvGenMain.neutralize(spark, advDir, neuDir)
  }

  /** (class description, designated catalog query). One query per
    * plant class from the AdvGenMain construction comment — chosen so
    * its output is a function of the class's CONTENT (counts alone
    * cancel between the twins).
    */
  private val classes: Seq[(String, String)] = Seq(
    "pii regexes (urls incl. whitespace-class boundaries, emails)" -> "q_doc_pii_stats",
    "unicode normalization + langid script classes" -> "q_doc_langid",
    "degenerate doc shapes (empty/1-char/huge/repetition/punct)" -> "q_doc_gopher_rules",
    "null/empty group keys (text/lang/source)" -> "q_doc_corpus_profile",
    "exact-dup triple" -> "q_doc_exact_dedup",
    "near-dup edit chain" -> "q_doc_minhash_lsh",
    "shared paragraphs" -> "q_doc_paragraph_dedup",
    "boilerplate lines" -> "q_doc_boilerplate_lines",
    "150-doc mega-cluster (CLIQUE+STAR cap binds)" -> "q_doc_dup_clusters",
    "benchmark 5-gram contamination" -> "q_doc_contamination",
    "doc sort-key ties (same n_chars / token count)" -> "q_doc_token_budget_select",
    "embedding specials (zero/NaN/Inf/denormal/antipodal)" -> "q_emb_outliers",
    "140-wide embedding cluster (band cap binds)" -> "q_embedding_neardup_lsh",
    "session gaps exactly at/±1us of the 30-min boundary" -> "q_events_sessionize",
    "event value specials (NaN/±Inf/null/-0.0/1e308)" -> "q_events_value_histogram",
    "props JSON branches (empty/malformed/nested/unicode/null)" -> "q_events_json_props",
    "event_type branches (empty/novel/null) + ts ties" -> "q_events_transitions",
    "calendar outliers (1970 epoch, 2030)" -> "q_events_dau",
    "300-event 1 Hz bot burst" -> "q_events_bot_cadence",
    "TPC-H value guards (discount 0/1, negative/sentinel qty)" -> "q1_pricing_summary",
    // q4_order_priority would be vacuous here: its 1993-quarter date
    // window excludes the 2024-dated plants (this spec's first run
    // caught exactly that). q_time_fill groups ALL orders by priority
    // AND its month spine stretches to the planted leap-day bound.
    "TPC-H null group keys (o_orderpriority) + leap-day date" -> "q_time_fill"
  )

  private def outHash(q: String, dir: String): Long =
    Bench.materialize(SparkEntry.queries(q)(spark, dir))

  for ((cls, q) <- classes)
    test(s"fires: $cls [$q]") {
      corpora
      val a = outHash(q, advDir)
      val n = outHash(q, neuDir)
      assert(a != n,
        s"$q produced IDENTICAL output on the adversarial corpus and its " +
          s"neutralized twin — the '$cls' plant class no longer fires " +
          "(dead guard or rotted plant); re-point the class at a sensitive " +
          "query or restore the plant in AdvGenMain")
    }

  test("structural plants present (key-relational classes survive regeneration)") {
    corpora
    def t(name: String) = spark.read.parquet(s"$advDir/$name.parquet")
    // customer with no orders
    assert(t("customer").filter(col("c_custkey") === 1000000L).count() == 1)
    assert(t("orders").filter(col("o_custkey") === 1000000L).count() == 0)
    // order with no lineitems (and a leap-day date in the adv arm)
    assert(t("orders").filter(col("o_orderkey") === 10000000L).count() == 1)
    assert(t("lineitem").filter(col("l_orderkey") === 10000000L).count() == 0)
    // nation with no customers/suppliers; region with no nations
    assert(t("nation").filter(col("n_nationkey") === 99).count() == 1)
    assert(t("customer").filter(col("c_nationkey") === 99).count() == 0)
    assert(t("supplier").filter(col("s_nationkey") === 99).count() == 0)
    assert(t("region").filter(col("r_regionkey") === 9).count() == 1)
    assert(t("nation").filter(col("n_regionkey") === 9).count() == 0)
    // 1-event user and the 300-event bot
    val ev = t("events")
    assert(ev.filter(col("user_id") === 1000001L).count() == 1)
    assert(ev.filter(col("user_id") === 1000002L).count() == 300)
    // cap-binding widths: 150 identical docs (> maxBandBucket = 128),
    // 140 identical embeddings (> the embedding band cap)
    val docs = t("documents").filter(col("doc_id") >= 1000000L)
    val megaWidth = docs.groupBy("text").count()
      .agg(max("count")).head().getLong(0)
    assert(megaWidth == 150L, s"doc mega-cluster width $megaWidth != 150")
    val embWidth = t("embeddings").filter(col("vec_id") >= 1000000L)
      .groupBy("embedding").count().agg(max("count")).head().getLong(0)
    assert(embWidth == 140L, s"embedding cluster width $embWidth != 140")
  }
}
