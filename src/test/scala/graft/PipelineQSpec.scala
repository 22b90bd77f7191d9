package graft

import org.apache.spark.sql.functions._

import graft.queries.PipelineQ

/** Hand-pinned semantics for the training-pipeline operators: duplicate
  * clustering (connected components), token-budget shard packing,
  * deterministic stratified sampling, unicode normalization. The oracle
  * queries grade them on the real corpus; these pin the boundary rules
  * on constructed inputs.
  */
class PipelineQSpec extends SparkSpecBase {
  import spark.implicits._

  test("connectedComponents: two components + a chain resolve to min labels") {
    // component A: clique-ish {1,2,3}; component B: chain 10-11-12-13
    val edges = Seq((2L, 1L), (2L, 3L), (11L, 10L), (12L, 11L), (13L, 12L))
      .toDF("doc_a", "doc_b")
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L)
    // both the hybrid local path (default threshold) and the forced
    // distributed contraction must produce the same labels
    for (threshold <- Seq(1L << 18, 0L)) {
      val comp = PipelineQ.connectedComponents(edges, localThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(comp == expected, s"localThreshold=$threshold")
    }
  }

  test("connectedComponents: a 256-diameter path converges in O(log n) rounds") {
    // star contraction must label a path graph far inside the round cap
    // (label propagation needs diameter=256 iterations here and would
    // either throw or silently mislabel under any small fixed cap)
    val n = 256
    val edges = (0 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val comp = PipelineQ.connectedComponents(edges, maxRounds = 12,
      localThreshold = 0L).collect()
    assert(comp.length == n + 1)
    assert(comp.forall(_.getLong(1) == 0L))
  }

  test("connectedComponents matches driver-side union-find on random graphs") {
    val rng = new scala.util.Random(20260812)
    for (trial <- 1 to 5) {
      val nNodes = 20 + rng.nextInt(40)
      val nEdges = rng.nextInt(60)
      val ids = (0 until nNodes).map(_ => rng.nextInt(1000).toLong).distinct
      val edges = (0 until nEdges).map { _ =>
        (ids(rng.nextInt(ids.length)), ids(rng.nextInt(ids.length)))
      }.filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // driver-side union-find ground truth
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val members = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expected = members.groupBy(find).flatMap { case (_, ms) =>
          val label = ms.min; ms.map(_ -> label)
        }.toMap
        // force the distributed contraction: the local path IS this
        // union-find, so grading it against itself would be vacuous
        val got = PipelineQ.connectedComponents(edges.toDF("a", "b"),
            localThreshold = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"trial $trial: $edges")
      }
    }
  }

  test("q_doc_dup_clusters labels every paired doc with component min + size") {
    val out = SparkEntry.queries("q_doc_dup_clusters")(spark, sfDir).collect()
    assert(out.nonEmpty, "expected near-dup clusters in the fixture corpus")
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.map(_.getLong(0)).min == cid, "cluster id must be the min member")
      assert(rows.forall(_.getLong(2) == rows.length), "cluster_size must match")
      assert(rows.length >= 2, "singletons must not appear")
    }
  }

  test("q_doc_dup_stats rolls the component table up by source, consistent with dup_clusters") {
    val stats = SparkEntry.queries("q_doc_dup_stats")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    val clusters = SparkEntry.queries("q_doc_dup_clusters")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val srcOf = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // every source appears; totals cover the corpus
    assert(stats.values.map(_._1).sum == srcOf.size)
    // dup_docs and max_cluster recompute from the cluster table
    val bySrc = clusters.keys.groupBy(srcOf)
    stats.foreach { case (src, (n, dup, frac, maxc)) =>
      val expected = bySrc.get(src).map(_.size.toLong).getOrElse(0L)
      assert(dup == expected, s"$src dup_docs $dup != $expected")
      val expMax = bySrc.get(src).map(_.map(clusters).max).getOrElse(0L)
      assert(maxc == expMax, s"$src max_cluster $maxc != $expMax")
      assert(math.abs(frac - dup.toDouble / n) < 1e-15)
    }
  }

  test("shard packing: docs fill a shard until the budget, oversized docs get their own") {
    val out = SparkEntry.queries("q_doc_shard_pack")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exclusive-prefix-sum invariant, recomputed sequentially
    var cum = 0L
    out.sortBy(_._1).foreach { case (id, n, shard) =>
      assert(shard == cum / PipelineQ.shardTokenBudget,
        s"doc $id: shard $shard != floor($cum/${PipelineQ.shardTokenBudget})")
      cum += n
    }
    // shards are contiguous in doc_id order and start at 0
    val shardIds = out.sortBy(_._1).map(_._3)
    assert(shardIds.head == 0L)
    assert(shardIds.sliding(2).forall(w => w.length < 2 || w(1) == w(0) || w(1) == w(0) + 1))
  }

  test("sequence spans tile the concatenated token stream exactly") {
    val L = PipelineQ.seqLen
    val out = SparkEntry.queries("q_doc_seq_spans")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // recompute the packed-sequence geometry sequentially: doc i owns
    // token positions [cum, cum+n), sequence s owns [s*L, (s+1)*L)
    var cum = 0L
    out.foreach { case (id, n, first, last, nSeqs) =>
      assert(first == cum / L, s"doc $id first_seq")
      assert(last == (cum + n - 1) / L, s"doc $id last_seq")
      assert(nSeqs == last - first + 1, s"doc $id n_seqs")
      cum += n
    }
    // consecutive docs abut: the next doc starts in the sequence the
    // previous one ended in, or the one right after (never a gap)
    out.sliding(2).foreach {
      case Array((_, _, _, lastA, _), (_, _, firstB, _, _)) =>
        assert(firstB == lastA || firstB == lastA + 1)
      case _ => ()
    }
    assert(out.head._3 == 0L, "the stream starts at sequence 0")
  }

  test("stratified sample is deterministic and near the target per-language rates") {
    val q = SparkEntry.queries("q_doc_stratified_sample")
    val once = q(spark, sfDir).collect().map(_.getLong(0)).toSeq
    val again = q(spark, sfDir).collect().map(_.getLong(0)).toSeq
    assert(once == again, "hash-based sampling must be run-stable")
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = q(spark, sfDir).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = kept("en").toDouble / docs("en")
    assert(enRate > 0.3 && enRate < 0.7, s"en rate $enRate far from 0.5")
    docs.keys.filter(_ != "en").foreach { l =>
      val r = kept.getOrElse(l, 0L).toDouble / docs(l)
      assert(r < 0.45, s"$l rate $r far above 0.2")
    }
  }

  test("curate pipeline: normalization-induced dups dedup, quality gate drops, shards pack") {
    // constructed corpus where every stage has to fire:
    //   1/2: equal AFTER normalization (composed vs decomposed é + messy
    //        whitespace) → dedup keeps doc 1 only
    //   3:   too short (< 5 tokens) → quality-dropped
    //   4:   punctuation-bomb (ratio > 0.3) → quality-dropped
    //   5-7: clean 6-token docs → survive, pack into shards
    val docs = Seq(
      (1L, "café one two three four five", "en", "t", 0L),
      (2L, " cafe\u0301  one	two  three four five ", "en", "t", 0L), // decomposed e+accent
      (3L, "too short here", "en", "t", 0L),
      (4L, "a !!! ??? ;;; ::: ,,, ... !!!", "en", "t", 0L),
      (5L, "alpha beta gamma delta epsilon zeta", "en", "t", 0L),
      (6L, "eta theta iota kappa lambda mu", "en", "t", 0L),
      (7L, "nu xi omicron pi rho sigma", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("curate_fix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // output: (doc_id, split, n_tokens, shard_id)
    val out = SparkEntry.queries("q_doc_curate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 5L, 6L, 7L),
      s"expected docs {1,5,6,7} to survive, got ${out.toSeq}")
    assert(out.forall(_._3 == 6L)) // all survivors are 6-token docs
    // budget=1000 → each split's 6-24 tokens fit in that split's shard 0
    assert(out.forall(_._4 == 0L))
    // all fixture ids are < curateBenchMaxDocId (bench stand-ins are
    // corpus members) — decontamination must not drop any of them;
    // CurateStagesSpec plants real contamination
  }

  test("bloom decontamination equals the exact sweep on a contamination-heavy corpus") {
    // the real testdata has almost no benchmark overlap, so the oracle
    // gate barely exercises the bloom path's FP-removal; this fixture
    // plants heavy contamination and verifies bloom ≡ exact
    val bench = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = (0L until 10L).map(i => (i, s"$bench filler$i one two three")) ++ Seq(
      (20L, s"prefix words $bench suffix words here"), // contains a bench 5-gram
      (21L, "alpha beta gamma delta epsilon wholly different tail"), // exact 5-gram hit
      (22L, "beta gamma delta epsilon zeta another contaminated doc"), // shifted 5-gram hit
      (23L, "completely clean document with no overlapping grams at all"),
      (24L, "alpha beta gamma clean because only a three gram matches"))
    val df = docs.map { case (id, t) => (id, t, "en", "t", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("contam_fix").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val exact = SparkEntry.queries("q_doc_contamination")(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    val bloom = SparkEntry.queries("q_doc_contamination_bloom")(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(exact == Seq(20L, 21L, 22L), s"exact sweep wrong: $exact")
    assert(bloom == exact, s"bloom path diverged: $bloom vs $exact")
  }

  test("nfcNormalize: decomposed accents compose; controls strip; whitespace collapses") {
    val decomposed = "cafe\u0301  \t down\u0007 town\n" // e + combining acute, BEL control
    val out = Seq((1L, decomposed)).toDF("doc_id", "text")
      .select(trim(regexp_replace(
        regexp_replace(PipelineQ.nfcNormalize(col("text")), "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
        "\\s+", " ")).as("norm_text"))
      .head().getString(0)
    assert(out == "caf\u00e9 down town") // composed e-acute, controls gone, single spaces, trimmed
  }

  test("equal-after-normalization strings hash equal (the dedup motivation)") {
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    assert(composed != decomposed)
    val hashes = Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text")
      .select(md5(PipelineQ.nfcNormalize(col("text")).cast("binary")))
      .collect().map(_.getString(0))
    assert(hashes(0) == hashes(1))
  }

  test("chunking: overlapping windows tile the doc and the tail is covered") {
    // 130 tokens, L=50, stride=40 -> chunks [1,50], [41,90], [81,130]
    val words = (1 to 130).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words, "en", "t", 0L), (2L, "tiny doc", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("chunk_fix").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_doc_chunk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(d1.map(_._3).toSeq == Seq(50L, 50L, 50L))
    assert(d1(0)._4.startsWith("w1 ") && d1(0)._4.endsWith(" w50"))
    assert(d1(1)._4.startsWith("w41 ") && d1(1)._4.endsWith(" w90"))
    assert(d1(2)._4.startsWith("w81 ") && d1(2)._4.endsWith(" w130"))
    // short doc stays whole
    val d2 = out.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0L, 2L, "tiny doc")))
  }

  test("chunking boundary cases: exactly L, L+1, and an exact stride multiple") {
    def doc(id: Long, n: Int) =
      (id, (1 to n).map(i => s"t$i").mkString(" "), "en", "t", 0L)
    // L=50, stride=40: n=50 -> 1 chunk; n=51 -> 2 (second covers 41..51);
    // n=90 -> 2 (covers to 90, no empty third chunk despite 2*40 < 90)
    val docs = Seq(doc(1, 50), doc(2, 51), doc(3, 90))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("chunk_edge").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_doc_chunk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    assert(out(1L).length == 1 && out(1L).head._3 == 50L)
    assert(out(2L).map(_._2).sorted.toSeq == Seq(0L, 1L))
    assert(out(2L).find(_._2 == 1L).get._4.endsWith(" t51"))
    assert(out(3L).map(_._2).sorted.toSeq == Seq(0L, 1L))
    assert(out(3L).find(_._2 == 1L).get._3 == 50L) // tokens 41..90
    assert(out(3L).find(_._2 == 1L).get._4.endsWith(" t90"))
  }

  test("despan removes every token covered by a corpus-duplicated 5-gram, both occurrences") {
    import graft.functions.TextFunctions.{shingles, tokens}
    // doc 1 and doc 2 share the exact 5-gram "alpha beta gamma delta epsilon";
    // doc 3 is clean; doc 4 is entirely one duplicated span (dup of doc 5)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon one two three four five six"),
      (2L, "zero alpha beta gamma delta epsilon tail words here"),
      (3L, "completely unique document with enough distinct tokens present"),
      (4L, "same same same same same"),
      (5L, "same same same same same")).toDF("doc_id", "text")
    val spans = docs
      .select(col("doc_id"), tokens(col("text")).as("tok"))
      .filter(size(col("tok")) >= PipelineQ.dupSpanN)
      .select(col("doc_id"),
        posexplode(shingles(col("tok"), PipelineQ.dupSpanN)).as(Seq("pos", "span")))
    val out = PipelineQ.despanFromSpans(docs, spans)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: first 5 tokens cut, 6 survive
    assert(out(1L) == (("one two three four five six", 6L, 5L)))
    // doc 2: positions 1..5 cut, "zero" and the tail survive
    assert(out(2L) == (("zero tail words here", 4L, 5L)))
    // doc 3: untouched
    assert(out(3L)._3 == 0L && out(3L)._1.startsWith("completely unique"))
    // docs 4/5: fully covered -> empty rebuild, all 5 tokens removed
    assert(out(4L) == (("", 0L, 5L)))
    assert(out(5L) == (("", 0L, 5L)))
  }

  test("paragraph dedup keeps exactly the first occurrence of each block") {
    def block(p: String): String = (1 to PipelineQ.paraK).map(i => s"$p$i").mkString(" ")
    val (a, b, c, dd, f) = (block("a"), block("b"), block("c"), block("d"), block("f"))
    val e4 = "e1 e2 e3 e4" // trailing partial block — dedups like any other
    val docs = Seq(
      (1L, s"$a $b"),   // first occurrences of A and B
      (2L, s"$b $c"),   // B is a dup of (1,1); C unique
      (3L, s"$a $a"),   // both blocks dup doc 1's A -> fully removed
      (4L, s"$dd $e4"), // first occurrences incl. the partial block
      (5L, s"$dd $e4"), // exact re-occurrence of doc 4 -> fully removed
      (6L, s"$f $f")    // within-doc dup: (6,0) kept, (6,1) cut
    ).toDF("doc_id", "text")
    val out = PipelineQ.paragraphDedup(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((s"$a $b", 2L, 0L)))
    assert(out(2L) == ((c, 2L, 1L)))
    assert(out(3L) == (("", 2L, 2L)))
    assert(out(4L) == ((s"$dd $e4", 2L, 0L)))
    assert(out(5L) == (("", 2L, 2L)))
    assert(out(6L) == ((f, 2L, 1L)))
  }

  test("global shuffle is a seed-deterministic permutation in md5 order") {
    // non-contiguous ids: the permutation must not depend on density
    val ids = Seq(0L, 7L, 13L, 64L, 999L, 1000000L, 31L, 2L, 500L, 77L)
    val docs = ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = PipelineQ.globalShuffle(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // pos is exactly 0..n-1, in output order
    assert(out.map(_._3).toSeq == ids.indices.map(_.toLong))
    // order matches an independently computed md5 sort
    def key(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:${PipelineQ.shuffleSeed}".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val expected = ids.sortBy(i => (key(i), i))
    assert(out.map(_._1).toSeq == expected)
    assert(out.forall { case (id, sk, _, _) => sk == key(id) })
    // positional sharding
    assert(out.forall { case (_, _, p, sh) =>
      sh == p / PipelineQ.shuffleDocsPerShard })
    // rerun is identical (seed-deterministic)
    val again = PipelineQ.globalShuffle(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq == out.toSeq)
  }

  test("split leakage counts grams and docs shared from train into held-out splits") {
    // classify ids with the SAME md5 cut the engine uses, then plant:
    // one val doc that is exactly a train 5-gram (leaked), one val doc
    // of unique tokens (clean), one test doc that is a train 5-gram
    def split(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      if (h < "e6666666") "train" else if (h < "f3333333") "val" else "test"
    }
    val pool = (10L to 400L).toSeq
    val trainId = pool.find(split(_) == "train").get
    val Seq(valA, valB) = pool.filter(split(_) == "val").take(2)
    val testId = pool.find(split(_) == "test").get
    val docs = Seq(
      (trainId, "alpha beta gamma delta epsilon zeta eta theta"),
      (valA, "alpha beta gamma delta epsilon"), // its one gram is in train
      (valB, "uniq1 uniq2 uniq3 uniq4 uniq5"),  // no gram in train
      (testId, "delta epsilon zeta eta theta")  // its one gram is in train
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("leak").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_split_leakage")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("val") == ((1L, 1L, 2L, 0.5)))
    assert(out("test") == ((1L, 1L, 1L, 1.0)))
  }
}
