package graft

import graft.queries.PipelineQ

/** Forces EVERY stage of the extended curate flagship to fire on one
  * planted fixture — quality gate, normalization-induced dedup,
  * benchmark decontamination, split assignment, per-split shard
  * packing — so a stage silently becoming a no-op breaks this suite,
  * not a future review. (The sf catalog gate proves end-to-end
  * equality with the oracle; this proves each stage has observable
  * effect.)
  */
class CurateStagesSpec extends SparkSpecBase {

  import spark.implicits._

  // bench stand-ins are doc_id < curateBenchMaxDocId (= 10)
  private val benchText = "alpha beta gamma delta epsilon zeta eta theta"

  private def fixture() = {
    val docs = (Seq(
      // 0-1: benchmark stand-ins (corpus members, never decontam-dropped)
      (0L, s"$benchText zero one two"),
      (1L, s"$benchText three four five"),
      // 20/21: equal AFTER normalization (messy whitespace) -> dedup
      (20L, "unusual unique words here stay clean"),
      (21L, " unusual  unique  words here stay clean "),
      // 22: too short -> quality-dropped
      (22L, "too short here"),
      // 23: punctuation bomb -> quality-dropped
      (23L, "a !!! ??? ;;; ::: ,,, ... !!!"),
      // 24: shares a bench 5-gram -> decontamination-dropped
      (24L, s"prefix words $benchText suffix words")) ++
      // 30-49: clean survivors, enough ids to hit multiple splits
      (30L to 49L).map(i =>
        (i, s"clean document number $i with enough distinct tokens")))
      .map { case (id, t) => (id, t, "en", "t", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("curate_stages").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("every curate stage fires: quality, dedup, decontam, split, per-split packing") {
    val dir = fixture()
    val out = SparkEntry.queries("q_doc_curate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ids = out.map(_._1).toSet

    // quality gate fired
    assert(!ids.contains(22L) && !ids.contains(23L), "quality gate did not drop 22/23")
    // dedup fired: normalization-equal pair collapses to min doc_id
    assert(ids.contains(20L) && !ids.contains(21L), "dedup did not collapse 20/21")
    // decontamination fired: 24 shares a bench 5-gram
    assert(!ids.contains(24L), "decontamination did not drop 24")
    // bench stand-ins are corpus members, not decontam targets
    assert(ids.contains(0L) && ids.contains(1L), "bench stand-ins were dropped")
    // clean survivors all present
    assert((30L to 49L).forall(ids.contains), "clean survivors missing")

    // split assignment is the stable md5 cut (same as q_doc_split)
    val splits = SparkEntry.queries("q_doc_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, split, _, _) =>
      assert(splits(id) == split, s"doc $id split $split != q_doc_split ${splits(id)}")
    }
    assert(out.map(_._2).distinct.length > 1,
      "fixture ids all landed in one split; packing-per-split untested")

    // per-split packing: within each split, shard_id is the exclusive
    // prefix sum over doc_id order — recomputed here independently
    out.groupBy(_._2).foreach { case (split, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, _, n, shard) =>
        val expected = cum / PipelineQ.shardTokenBudget
        assert(shard == expected,
          s"doc $id in $split: shard $shard != expected $expected")
        cum += n
      }
    }
  }

  test("per-split packing restarts shard ids at 0 in every split") {
    val dir = fixture()
    val out = SparkEntry.queries("q_doc_curate")(spark, dir)
      .collect().map(r => (r.getString(1), r.getLong(3)))
    out.groupBy(_._1).foreach { case (split, rows) =>
      assert(rows.map(_._2).min == 0L, s"split $split does not start at shard 0")
    }
  }
}
