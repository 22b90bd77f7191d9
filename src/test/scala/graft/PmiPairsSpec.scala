package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_doc_pmi_pairs: exact window pair counts, unigram
  * counts, and lift on planted documents — including the raw-position
  * window contract (an empty token consumes a window slot but never
  * pairs) and the unordered-pair canonicalization.
  */
class PmiPairsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Planted corpus, window = 4 (anchor + next 3 raw positions),
    * min count lowered is NOT possible (threshold is 5), so the pair
    * ("x","y") is planted exactly 5 times and a decoy ("x","z") 4
    * times — the decoy must be suppressed.
    *
    * doc 1..5: "x y"            → 5 × pair (x,y); tokens x,y each ×5
    * doc 6..9: "x z"            → 4 × pair (x,z) — below threshold
    * doc 10:   "a  \t b"        → tokenizer splits runs: pair (a,b)
    * doc 11:   "q w e r t"      → q pairs with w,e,r (NOT t: distance 4)
    */
  private lazy val dir: String = {
    val rows =
      (1 to 5).map(i => (i.toLong, "x y")) ++
        (6 to 9).map(i => (i.toLong, "x z")) ++
        Seq((10L, "a  \t b"), (11L, "q w e r t"))
    val d = java.nio.file.Files.createTempDirectory("pmi_fix").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("planted pairs: threshold, counts, and exact lift") {
    val out = SparkEntry.queries("q_doc_pmi_pairs")(spark, dir).collect()
    // only (x,y) survives n_ab >= 5
    assert(out.length == 1, out.mkString("; "))
    val r = out.head
    assert((r.getString(0), r.getString(1)) == ("x", "y"))
    assert(r.getLong(2) == 5L) // n_ab
    assert(r.getLong(3) == 9L) // n_a: x appears in docs 1-9
    assert(r.getLong(4) == 5L) // n_b
    // T = 25 tokens (5*2 + 4*2 + 2 + 5), P = total window pairs:
    // 5 + 4 + 1 + (3+2+1+... doc 11: q->w,e,r; w->e,r,t; e->r,t; r->t = 9)
    val T = 25.0
    val P = (5 + 4 + 1 + 9).toDouble
    val lift = 5.0 * T * T / (P * 9.0 * 5.0)
    assert(r.getDouble(5) == lift, s"${r.getDouble(5)} vs $lift")
  }

  test("identical tokens never pair, even when adjacent") {
    val d = java.nio.file.Files.createTempDirectory("pmi_fix2").toString
    Seq((1L, "m m")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("q_doc_pmi_pairs")(spark, d).collect()
    assert(out.isEmpty, "identical-token pairs must be excluded")
  }

  test("corpus run: canonical pair order, positive counts, lift consistency") {
    val rows = SparkEntry.queries("q_doc_pmi_pairs")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "pairs must be canonicalized w1 <= w2")
      assert(r.getLong(2) >= 5L)
      assert(r.getLong(2) <= 3 * math.min(r.getLong(3), r.getLong(4)),
        "pair count bounded by window x the RARER side's unigram count " +
          "(each occurrence of either token pairs with at most 3 others)")
      assert(r.getDouble(5) > 0.0)
    }
    // ordering: lift desc, then pair asc
    val keys = rows.map(r => (-r.getDouble(5), r.getString(0), r.getString(1)))
    assert(keys.toSeq == keys.sortBy(identity).toSeq)
  }

  test("plan: pairs generate inside the scan — no positional self-join, top-50 is TakeOrdered") {
    val df = SparkEntry.queries("q_doc_pmi_pairs")(spark, sfDir)
    df.collect() // finalize the adaptive plan from measured sizes
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p)
    assert(!p.contains("SortMergeJoin"),
      s"positional self-join leaked into the engine plan (oracle-only shape), " +
        s"or AQE failed to promote a gate-SF unigram lookup:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
    // No broadcast() hint on the unigram joins (a mega-vocabulary
    // would hit the 8 GB broadcast limit): AQE must promote them to
    // broadcast from the MEASURED size at gate SF
    assert(p.contains("BroadcastHashJoin"),
      "AQE must promote the small unigram lookups to broadcast")
  }
}
