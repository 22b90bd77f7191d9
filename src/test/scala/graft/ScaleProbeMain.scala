package graft

import org.apache.spark.sql.functions._

import graft.queries.PipelineQ

/** Manual scale probe (not a CI test — run with `Test/runMain
  * graft.ScaleProbeMain`): measures the round-3 operators at sizes the
  * fixture corpus cannot reach. Results are recorded in BENCH_NOTES.md;
  * methodology mirrors Bench (materialize-everything timing).
  */
object ScaleProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // --- connected components: adversarial 100k-diameter path ---------
    val path = spark.range(100000)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    time("cc_path_100k(diameter=1e5)") {
      val comp = PipelineQ.connectedComponents(path, localThreshold = 0L)
      val bad = comp.filter(col("comp") =!= 0L).count()
      require(bad == 0, s"$bad mislabeled")
    }

    // --- connected components: 50k-node random graph (clustered) ------
    val rand = spark.range(200000)
      .select((pmod(hash(col("id")), lit(50000))).cast("long").as("a"),
        (pmod(hash(col("id") * 7 + 1), lit(50000))).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    time("cc_random_50k_nodes_200k_edges") {
      val comp = PipelineQ.connectedComponents(rand, localThreshold = 0L)
      require(comp.count() > 0)
    }

    // --- curation + contamination on a 10x-amplified corpus -----------
    val sfDir = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val bigDir = java.nio.file.Files.createTempDirectory("probe10x").toString
    val n = docs.count()
    // 10 copies, distinct ids, identical text → 90% exact-dup corpus
    docs.crossJoin(spark.range(10).select(col("id").as("copy")))
      .select((col("doc_id") + col("copy") * n * 10).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$bigDir/documents.parquet")

    val curated = time(s"curate_10x(${n * 10} docs)") {
      SparkEntry.queries("q_doc_curate")(spark, bigDir).count()
    }
    println(s"PROBE curate_10x kept $curated of ${n * 10} (dedup must collapse copies)")

    time(s"contamination_exact_10x") {
      SparkEntry.queries("q_doc_contamination")(spark, bigDir).count()
    }
    time(s"contamination_bloom_10x") {
      SparkEntry.queries("q_doc_contamination_bloom")(spark, bigDir).count()
    }

    // --- round-3 late additions at 10x: prefix-sum family + scoring ----
    // (seq spans and surprisal are linear scans + bounded shuffles; the
    // probe checks the wall time scales like the corpus, not worse)
    time(s"seq_spans_10x(${n * 10} docs)") {
      SparkEntry.queries("q_doc_seq_spans")(spark, bigDir).count()
    }
    time(s"unigram_surprisal_10x(${n * 10} docs)") {
      SparkEntry.queries("q_doc_unigram_surprisal")(spark, bigDir).count()
    }
    time(s"snapshot_diff_10x(${n * 10} docs)") {
      SparkEntry.queries("q_doc_snapshot_diff")(spark, bigDir).count()
    }

    // --- native signature kernels vs their legacy UDFs at 10x ----------
    // (both paths still exist, so the speedup is measurable directly;
    // materialize via aggregate so neither result is driver-collected)
    {
      import graft.functions.TextFunctions._
      graft.expressions.MinhashSig.ensureRegistered(spark)
      graft.expressions.Simhash64.ensureRegistered(spark)
      val sh = spark.read.parquet(s"$bigDir/documents.parquet")
        .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"),
          tokens(col("text")).as("tok"))
      sh.cache().count()
      // bit_xor materialization: signature values sit near Long.MaxValue
      // and an ANSI sum() overflows. Each variant runs twice interleaved
      // and reports the MIN, so first-touch/JIT warm-up cannot bias the
      // comparison toward whichever path runs second.
      def minOf2(label: String)(f: => Unit): Unit = {
        def once(): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        once() // warm-up
        println(f"PROBE $label: ${math.min(once(), once())}%.2f s (min of 2 warm)")
      }
      minOf2("minhash_udf_10x") {
        sh.select(element_at(minhashSig(col("sh")), 1).as("v"))
          .agg(expr("bit_xor(v)")).head()
      }
      minOf2("minhash_native_10x") {
        sh.select(element_at(fastMinhashSig(col("sh")), 1).as("v"))
          .agg(expr("bit_xor(v)")).head()
      }
      minOf2("simhash_udf_10x") {
        sh.select(simhash64(col("tok")).as("v")).agg(expr("bit_xor(v)")).head()
      }
      minOf2("simhash_native_10x") {
        sh.select(fastSimhash64(col("tok")).as("v")).agg(expr("bit_xor(v)")).head()
      }
      sh.unpersist()
    }

    // --- round-5 span operators + PQ at 10x ----------------------------
    time(s"despan_10x(${n * 10} docs)") {
      SparkEntry.queries("q_doc_despan")(spark, bigDir).count()
    }
    time(s"decontam_spans_10x") {
      SparkEntry.queries("q_doc_decontam_spans")(spark, bigDir).count()
    }
    time(s"truncate_pack_10x") {
      SparkEntry.queries("q_doc_truncate_pack")(spark, bigDir).count()
    }

    // --- round-5 continuation: dedup / order / audit / model at 10x ----
    // (paragraph dedup on the 90%-dup corpus exercises the min-struct
    // keep-first path under maximal duplication; the others check
    // linear scaling of the two-phase position, the gram join, and the
    // train-once-score-distributed model)
    time(s"paragraph_dedup_10x(${n * 10} docs)") {
      SparkEntry.queries("q_doc_paragraph_dedup")(spark, bigDir).count()
    }
    time("global_shuffle_10x") {
      SparkEntry.queries("q_doc_global_shuffle")(spark, bigDir).count()
    }
    time("split_leakage_10x") {
      SparkEntry.queries("q_split_leakage")(spark, bigDir).count()
    }
    time("quality_model_10x(train+score)") {
      SparkEntry.queries("q_doc_quality_model")(spark, bigDir).count()
    }

    // --- round-5 coda: importance / LM / retrieval at 10x --------------
    // (dsir and lm_perplexity are train-once-score-distributed like the
    // quality model; bm25's scored rows grow with query-term matches —
    // on the 10x corpus postings are 10x but the query set is fixed)
    time("dsir_10x(train+score)") {
      SparkEntry.queries("q_doc_dsir")(spark, bigDir).count()
    }
    time("lm_perplexity_10x(train+score)") {
      SparkEntry.queries("q_doc_lm_perplexity")(spark, bigDir).count()
    }
    time("bm25_10x(idf+retrieve)") {
      SparkEntry.queries("q_doc_bm25")(spark, bigDir).count()
    }

    // --- distributed k-means at the SemDeDup paper regime --------------
    // k=20k is 5x past singleNodeKCap: the whole train must run as
    // DataFrame jobs (k-means|| init + Lloyd), no driver clustering
    {
      import graft.functions.IvfFunctions
      val mkVec = udf { id: Long =>
        val rng = new scala.util.Random(id * 6364136223846793005L + 11)
        // 20k planted modes, 6 points each: mode center + small jitter
        val gr = new scala.util.Random((id / 6) * 2654435761L + 3)
        Array.fill(64)((gr.nextGaussian() * 10 + rng.nextGaussian() * 0.05).toFloat).toSeq
      }
      val corpus = spark.range(120000)
        .select(col("id").as("vec_id"), mkVec(col("id")).as("embedding"))
        .select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
        .repartition(32).cache()
      corpus.count()
      val centroids = time("kmeans_lloyd_k20000(n=120k,d=64)") {
        IvfFunctions.trainCentroidsLloyd(corpus, "embedding", 20000,
          seed = 42, maxIter = 3)
      }
      require(centroids.length == 20000, s"got ${centroids.length} centroids")
      time("kmeans_assign_k20000") {
        val bc = IvfFunctions.broadcastCentroids(corpus, centroids)
        val lists = corpus.withColumn("cid",
          IvfFunctions.assignUdf(bc)(col("embedding")))
          .groupBy("cid").count().agg(max("count")).head().getLong(0)
        bc.destroy()
        println(s"PROBE kmeans_k20000 largest inverted list: $lists rows")
      }
      corpus.unpersist()
    }

    // --- hierarchical IVF past the flat 65536 cap ----------------------
    // k=80,000 addressable lists from two ~283-row codebooks: train
    // (two Lloyd runs) + composite assignment + probed retrieval, all
    // the same broadcast-scan/equi-join shapes as flat IVF — the
    // configuration a flat codebook cannot broadcast-afford at 100 TB
    {
      import graft.functions.HierarchicalIvf
      val mkVec = udf { id: Long =>
        val gr = new scala.util.Random((id / 2) * 2654435761L + 7)
        val rng = new scala.util.Random(id * 6364136223846793005L + 13)
        Array.fill(64)((gr.nextGaussian() * 10 + rng.nextGaussian() * 0.02).toFloat).toSeq
      }
      // 80k planted modes, 2 points each (160k vectors)
      val corpus = spark.range(160000)
        .select(col("id").as("vec_id"), mkVec(col("id")).as("embedding"))
        .select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
        .repartition(32).cache()
      corpus.count()
      val cb = time("hier_ivf_train_k80000(n=160k,d=64)") {
        HierarchicalIvf.train(corpus, "embedding", 80000L, seed = 42, maxIter = 3)
      }
      require(cb.capacity >= 80000L, s"capacity ${cb.capacity}")
      time("hier_ivf_assign_k80000") {
        val (bcS, bcR) = HierarchicalIvf.broadcast2(corpus, cb)
        val stats = corpus.withColumn("cid",
            HierarchicalIvf.assignUdf(bcS, bcR)(col("embedding")))
          .groupBy("cid").count()
          .agg(count(lit(1)), max("count")).head()
        bcS.destroy(); bcR.destroy()
        println(s"PROBE hier_ivf_k80000 distinct lists: ${stats.getLong(0)}, " +
          s"largest: ${stats.getLong(1)} rows " +
          s"(k1=${cb.superC.length}, k2=${cb.residC.length})")
      }
      time("hier_ivf_query_k80000(100 queries)") {
        val n = HierarchicalIvf.annTopK(corpus,
          corpus.filter(col("vec_id") % 2 === 0 && col("vec_id") < 200),
          cb, nProbeSuper = 4, nProbeResid = 4, topK = 2).count()
        println(s"PROBE hier_ivf_query rows: $n")
      }
      corpus.unpersist()
    }

    // --- incremental dedup against the persistent bucketed index ------
    val big = spark.read.parquet(s"$bigDir/documents.parquet")
    spark.sql("DROP TABLE IF EXISTS probe_corpus_hashes")
    time(s"hash_index_build_10x(${n * 10} docs)") {
      graft.sink.HashIndex.build(big.filter(col("doc_id") % 3 =!= 0),
        "probe_corpus_hashes")
    }
    time("hash_index_dedup_10x_batch") {
      graft.sink.HashIndex.dedupAgainst(spark, "probe_corpus_hashes",
        big.filter(col("doc_id") % 3 === 0)).count()
    }
    spark.sql("DROP TABLE IF EXISTS probe_corpus_hashes")

    // --- round-5 continuation 2: sketch / mixture / langid / PCA -------
    // (cms is two scans + a 16k-cell collect; temperature mix is one
    // count-per-source pass + a filtered scan; relational langid is the
    // quality-model plan class; pca is one partial-accumulation pass +
    // a literal-broadcast projection — all should track corpus size)
    time(s"cms_topgrams_10x(${n * 10} docs)") {
      SparkEntry.queries("q_doc_cms_topgrams")(spark, bigDir).count()
    }
    time("temperature_mix_10x") {
      SparkEntry.queries("q_doc_temperature_mix")(spark, bigDir).count()
    }
    time("langid_relational_10x") {
      SparkEntry.queries("q_doc_langid")(spark, bigDir).count()
    }
    // 10x embeddings: exact copies with distinct ids (covariance pass
    // and outlier scan cost are content-independent)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val nEmb = emb.count()
    emb.crossJoin(spark.range(10).select(col("id").as("copy")))
      .select((col("vec_id") + col("copy") * nEmb * 10).as("vec_id"),
        col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$bigDir/embeddings.parquet")
    time(s"pca_fit_project_10x(${nEmb * 10} vecs)") {
      SparkEntry.queries("q_emb_pca")(spark, bigDir).count()
    }
    time("emb_outliers_10x") {
      SparkEntry.queries("q_emb_outliers")(spark, bigDir).count()
    }

    // --- round-5 continuation 3: graph ops + gopher -------------------
    // The 10x embedding corpus is exact copies, so every band bucket
    // holds all 10 twins of each member: candidate pairs grow ~100x
    // while the corpus grows 10x — the WORST-case duplicate-heavy
    // regime for the keys-only self-join (a dedup pipeline's actual
    // input). Topic clusters then run CC over near-clique edges.
    time(s"knn_graph_10x(${nEmb * 10} vecs, duplicate-heavy)") {
      SparkEntry.queries("q_emb_knn_graph")(spark, bigDir).count()
    }
    time("topic_clusters_10x") {
      SparkEntry.queries("q_emb_topic_clusters")(spark, bigDir).count()
    }
    time("hard_negatives_10x") {
      SparkEntry.queries("q_emb_hard_negatives")(spark, bigDir).count()
    }
    time(s"gopher_rules_10x(${n * 10} docs)") {
      SparkEntry.queries("q_doc_gopher_rules")(spark, bigDir).count()
    }

    // --- round-6: mixing + diversity ---------------------------------
    // epoch_mix explodes copies (row-count amplification on rare
    // sources); doremi rides the surprisal frame; diversity's exact
    // distinct counts are the probed worst case (10x token stream, 10x
    // duplicated grams — the regime where production swaps in HLL).
    time("epoch_mix_10x") {
      SparkEntry.queries("q_doc_epoch_mix")(spark, bigDir).count()
    }
    time("doremi_weights_10x") {
      SparkEntry.queries("q_doc_doremi_weights")(spark, bigDir).count()
    }
    time("ngram_diversity_10x") {
      SparkEntry.queries("q_doc_ngram_diversity")(spark, bigDir).count()
    }

    // --- round-6 continuation: dedup-adjacent + selection ops ---------
    // softdedup on the 90%-dup corpus is the op's DESIGN case (every
    // cluster size 10 → weight 0.1). editdist rides the same
    // duplicate-heavy band-collision worst case as knn_graph_10x, with
    // the per-pair cost capped by the 256-char prefix DP. unimax and
    // token-budget are scan + tiny-table ops and must scale linearly.
    time(s"softdedup_10x(${n * 10} docs, 90% dups)") {
      SparkEntry.queries("q_doc_softdedup")(spark, bigDir).count()
    }
    time("editdist_neardup_10x(duplicate-heavy candidates)") {
      SparkEntry.queries("q_doc_editdist_neardup")(spark, bigDir).count()
    }
    time("unimax_mix_10x") {
      SparkEntry.queries("q_doc_unimax_mix")(spark, bigDir).count()
    }
    time("token_budget_select_10x") {
      SparkEntry.queries("q_doc_token_budget_select")(spark, bigDir).count()
    }
    time(s"prune_prototypes_10x(${nEmb * 10} vecs)") {
      SparkEntry.queries("q_emb_prune_prototypes")(spark, bigDir).count()
    }
    // debounce at 10x users: replicate events with disjoint user ids —
    // key cardinality grows 10x, per-key history stays constant (the
    // window op's scaling axis)
    locally {
      val events = graft.sources.Tables.events(spark, sfDir)
      val nu = events.agg(max("user_id")).head.getLong(0) + 1
      events.crossJoin(spark.range(10).select(col("id").as("copy")))
        .select((col("event_id") * 10 + col("copy")).as("event_id"), col("ts"),
          (col("user_id") + col("copy") * nu).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .write.mode("overwrite").parquet(s"$bigDir/events.parquet")
      time("debounce_10x(10x users)") {
        SparkEntry.queries("q_events_debounce")(spark, bigDir).count()
      }
    }

    // --- round-6 session 3: triage matrices + containment + dhash -----
    // source_overlap on the 10x corpus: the distinct (shingle, source)
    // stream grows 10x but collapses back to the base cardinality (the
    // copies repeat (g, source) keys) — probes the distinct, the combo
    // expansion is #sources-bounded by construction. source_kl counts
    // scale 10x with identical output. containment rides the SAME
    // duplicate-heavy candidate blowup as editdist (disclosed O(Σ
    // bucket²) family) but pays only a filter over the memoized pair
    // stats. dhash pairs stay linear: fixture clusters are fixed at 4
    // docs regardless of corpus size (amplified ids land in new
    // scenes).
    time("source_overlap_10x") {
      SparkEntry.queries("q_doc_source_overlap")(spark, bigDir).count()
    }
    time("source_kl_10x") {
      SparkEntry.queries("q_doc_source_kl")(spark, bigDir).count()
    }
    time("containment_10x(duplicate-heavy candidates)") {
      SparkEntry.queries("q_doc_containment")(spark, bigDir).count()
    }
    time(s"dhash_neardup_10x(${n * 10} images)") {
      SparkEntry.queries("q_media_dhash_neardup")(spark, bigDir).count()
    }

    // paths at 10x events (10x users from the debounce amplification
    // above): per-user window state is constant, the path-count key
    // space is |types|³-bounded. class separation at 10x embeddings:
    // the only corpus-sized stage is the explode+broadcast-join scan.
    time("event_paths_10x(10x users)") {
      SparkEntry.queries("q_events_paths")(spark, bigDir).count()
    }
    time(s"class_separation_10x(${nEmb * 10} vecs)") {
      SparkEntry.queries("q_emb_class_separation")(spark, bigDir).count()
    }

    // pagerank on the 10x duplicate-heavy corpus: the near-dup edge
    // table rides the same O(Σ bucket²) candidate hazard as the rest
    // of the family (pipeline ordering is the mitigation), but the
    // POWER ITERATION itself is linear in edges — this probes that the
    // 5 rounds stay edge-bounded once the pair table exists.
    time("pagerank_10x(duplicate-heavy edges)") {
      SparkEntry.queries("q_doc_pagerank")(spark, bigDir).count()
    }

    // --- round-6 session 3: graph + layout + warehouse additions ------
    // triangles on the duplicate-heavy kNN graph: every band bucket is
    // a 10-twin near-clique, the densest-triangle regime (the hub
    // hazard made concrete) — but the enumeration rides the memoized
    // anchor-bounded edge table, so the pair space is Σ deg² over
    // degrees ≤ 2·knnK, not bucket². scd2/watermark/rfm at 10x users
    // (events amplified above): per-user window state constant, output
    // users-sized. zorder + skip stats at 10x lineitem: the bounds and
    // counts passes scan 2x, the adaptive prefix widens one notch, the
    // rank stays bucket-partitioned; novelty's first-carrier aggregate
    // sees a 10x gram stream collapsing to base cardinality; basket
    // pairs grow with Σ basket² (baskets unchanged → linear).
    time(s"knn_triangles_10x(${nEmb * 10} vecs, near-clique buckets)") {
      SparkEntry.queries("q_emb_knn_triangles")(spark, bigDir).count()
    }
    time("scd2_10x(10x users)") {
      SparkEntry.queries("q_events_scd2")(spark, bigDir).count()
    }
    time("watermark_advisor_10x(10x users)") {
      SparkEntry.queries("q_events_watermark_advisor")(spark, bigDir).count()
    }
    time("rfm_10x(10x users)") {
      SparkEntry.queries("q_events_rfm")(spark, bigDir).count()
    }
    locally {
      val li = graft.sources.Tables.lineitem(spark, sfDir)
      val nli = li.agg(max("l_orderkey")).head.getLong(0) + 1
      li.crossJoin(spark.range(10).select(col("id").as("copy")))
        .select((col("l_orderkey") + col("copy") * nli).as("l_orderkey"),
          col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax"), col("l_returnflag"), col("l_linestatus"),
          col("l_shipdate"))
        .write.mode("overwrite").parquet(s"$bigDir/lineitem.parquet")
      time(s"zorder_10x(${nli * 10} order keys)") {
        SparkEntry.queries("q_layout_zorder")(spark, bigDir).count()
      }
      time("skip_stats_10x") {
        SparkEntry.queries("q_layout_skip_stats")(spark, bigDir).count()
      }
      time("market_basket_10x(baskets unchanged)") {
        SparkEntry.queries("q_market_basket")(spark, bigDir).count()
      }
      // round-8 continuation: the layout family's other legs at 10x —
      // hilbert shares the rank machinery (same two scans + window),
      // compare reads both memoized manifests, bloom explodes 3 bit
      // positions per row then joins keys-only. All ride the memoized
      // layout-rows frame, so the marginal probes price the SHARED
      // build once (hilbert) and the per-leg deltas after it.
      time(s"layout_hilbert_10x(${nli * 10} order keys)") {
        SparkEntry.queries("q_layout_hilbert")(spark, bigDir).count()
      }
      time("layout_compare_10x") {
        SparkEntry.queries("q_layout_compare")(spark, bigDir).count()
      }
      time("layout_bloom_10x") {
        SparkEntry.queries("q_layout_bloom_stats")(spark, bigDir).count()
      }
    }
    // round-8 continuation: BFS over the duplicate-heavy kNN graph
    // (twin buckets make dense frontiers — the stress case for the
    // anti-join against reached), and the three event mechanisms at
    // 10x users (grid and state sizes key-domain-bounded, so these
    // must scale with the scan, not the state)
    time(s"knn_hops_10x(${nEmb * 10} vecs, duplicate-heavy)") {
      SparkEntry.queries("q_emb_knn_hops")(spark, bigDir).count()
    }
    time("incremental_agg_10x(10x users)") {
      SparkEntry.queries("q_events_incremental_agg")(spark, bigDir).count()
    }
    time("ses_10x(10x users)") {
      SparkEntry.queries("q_events_ses")(spark, bigDir).count()
    }
    time("dp_counts_10x(10x users)") {
      SparkEntry.queries("q_events_dp_counts")(spark, bigDir).count()
    }
    time(s"novelty_curve_10x(${n * 10} docs, 90% dups)") {
      SparkEntry.queries("q_doc_novelty_curve")(spark, bigDir).count()
    }
    time(s"audio_features_10x(${n * 10} wavs)") {
      SparkEntry.queries("q_multimodal_audio_features")(spark, bigDir).count()
    }

    spark.stop()
  }
}
