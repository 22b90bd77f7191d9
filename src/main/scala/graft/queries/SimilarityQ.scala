package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.sources.Tables
import graft.functions.VectorFunctions._

/** Similarity search over `embeddings` (64-dim float vectors).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against the full vector table; one pass, no shuffle on the big
  * side, TakeOrderedAndProject-style per-query top-k via window.
  *
  * Scale path: random-hyperplane LSH buckets prune candidates before the
  * exact rerank (q_ann_lsh); at 100 TB the bucketed join replaces the
  * per-query full scan, and the bucket table can be bucketed/partitioned
  * by bucket id for co-located joins.
  *
  * Oracle determinism: cosine is a *sequential left fold in IEEE
  * double* in both engines — Spark's native fast_cosine expression
  * (graft.expressions.CosineSimilarity, codegen; bit-identical to the
  * declarative aggregate/zip_with form) and DuckDB `list_reduce` — so
  * scores are bit-identical and hash-comparable.
  */
object SimilarityQ {

  private val nQueries = 5
  private val topK = 10

  // ---------------------------------------------------------------
  // Centroid materialization for oracle replay (the BPE word-token
  // pattern, OracleAux): k-means centroids are not re-derivable in
  // ANSI SQL, but once the engine writes the EXACT centroid table it
  // retrieved with, every downstream step — nearest-centroid
  // assignment, probe ranking, within-cluster cosine, anti-join — is
  // plain arithmetic DuckDB replays bit-identically (sequential
  // double folds, same operand order as the UDF loops).
  // ---------------------------------------------------------------

  private[graft] val ivfAuxDir = s"${OracleAux.root}/ivf_centroids"
  private[graft] val semdedupAuxDir = s"${OracleAux.root}/semdedup_centroids"

  /** Corpus fingerprint the oracle recomputes from the base table, so
    * stale aux writes for a different scale factor never match.
    */
  private def corpusKey(emb: DataFrame): Long =
    emb.agg(sum("vec_id")).head.getLong(0)

  /** Materialize (cid, c: array<double>, corpus_key) — k rows. */
  private def writeCentroids(emb: DataFrame, centroids: Array[Array[Double]],
                             dir: String): Unit = {
    val s = emb.sparkSession
    import s.implicits._
    val key = corpusKey(emb)
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq, key) }.toSeq
      .toDF("cid", "c", "corpus_key")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/k$key")
  }

  /** Squared-L2 distance in DuckDB, matching IvfFunctions.l2sq's
    * sequential double fold (float widened to double per element,
    * d*d accumulated left-to-right).
    */
  private def oracleL2sq(v: String, c: String): String =
    s"""list_reduce(list_transform(range(1, 65),
       |    i -> (CAST($v[i] AS DOUBLE) - $c[i]) * (CAST($v[i] AS DOUBLE) - $c[i])),
       |  (x, y) -> x + y)""".stripMargin

  /** Shared oracle CTE prefix: centroid table → per-vector distances.
    * `rel` filters which vectors get distances (always the full corpus
    * here). Assignment/probe CTEs then rank over `dist`.
    */
  private def centroidDistCte(auxDir: String): String =
    s"""WITH cents AS (
       |  SELECT cid, c FROM read_parquet('$auxDir/*/*.parquet')
       |  WHERE corpus_key = (SELECT SUM(vec_id) FROM embeddings)),
       |dist AS (
       |  SELECT e.vec_id, ct.cid,
       |    ${oracleL2sq("e.embedding", "ct.c")} AS d
       |  FROM embeddings e CROSS JOIN cents ct)""".stripMargin

  /** Shared ANN epilogue: per-query top-k by (score desc, id asc) —
    * one definition so the three retrieval paths rank identically.
    */
  private def topKPerQuery(scored: DataFrame): DataFrame =
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
      .orderBy(col("query_id").asc, col("rank").asc)

  /** Per-dimension corpus min/max — the stats pass shared by the
    * quantization query (joins it distributively) and the quantized
    * ANN path (collects its 64 rows for a literal-array transform).
    */
  /** Per-dim (min, max) over the all-finite vectors — the quantizer's
    * index domain (one NaN/Inf component would poison the range and
    * every code derived from it; [[IvfFunctions.finiteVec]] twin).
    */
  private def dimStats(emb: DataFrame): DataFrame =
    emb.filter(graft.functions.IvfFunctions.finiteVec(col("embedding")))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim").agg(min("x").as("mn"), max("x").as("mx"))

  private def oracleCosine(a: String, b: String): String =
    s"""(list_reduce(list_transform(range(1, 65),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)
       |  / NULLIF(
       |    sqrt(list_reduce(list_transform(range(1, 65),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), (x, y) -> x + y))
       |    * sqrt(list_reduce(list_transform(range(1, 65),
       |      i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)), 0))""".stripMargin

  /** Brute-force cosine top-k for a fixed query set (vec_id < nQueries). */
  val qAnnBruteForce: Q = Q.sql(
    "q_ann_bruteforce",
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
       |    ${oracleCosine("q.embedding", "v.embedding")} AS score
       |  FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
       |  WHERE q.vec_id < $nQueries),
       |ranked AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, score
       |FROM ranked WHERE rank <= $topK
       |ORDER BY query_id ASC, rank ASC""".stripMargin) { (s, d) =>
    graft.expressions.CosineSimilarity.ensureRegistered(s)
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.join(broadcast(queries), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        fastCosine(col("q_emb"), col("embedding")).as("score"))
    topKPerQuery(scored)
  }

  /** [[oracleCosine]] over the first `dims` components only. */
  private def oracleCosineDims(a: String, b: String, dims: Int): String =
    s"""(list_reduce(list_transform(range(1, ${dims + 1}),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)
       |  / NULLIF(
       |    sqrt(list_reduce(list_transform(range(1, ${dims + 1}),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), (x, y) -> x + y))
       |    * sqrt(list_reduce(list_transform(range(1, ${dims + 1}),
       |      i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)), 0))""".stripMargin

  private val matryoshkaDims = 16

  /** MATRYOSHKA TRUNCATION AUDIT (Kusupati et al. NeurIPS 2022) — does
    * retrieval survive cutting the embedding to its first 16 of 64
    * dims? Per query: the top-1 neighbor under the FULL cosine, the
    * top-1 under the TRUNCATED cosine, where the truncated pick ranks
    * in the full ordering, and an agreement flag. A 4× cheaper index
    * (and 4× smaller broadcast) is free wherever this table reads
    * agree=true / full_rank≈1; where it doesn't, truncation costs
    * recall and the audit says exactly how much. (Our synthetic
    * embeddings are NOT Matryoshka-trained, so disagreement is the
    * expected finding — the audit's value is measuring, not assuming.)
    *
    * Scale shape: identical to q_ann_bruteforce (queries broadcast,
    * one corpus scan scoring both metrics in the same projection, two
    * ranks from one exchange); the audit is run on a query SAMPLE by
    * construction, never corpus×corpus.
    */
  val qEmbMatryoshka: Q = Q.sql(
    "q_emb_matryoshka",
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
       |    ${oracleCosine("q.embedding", "v.embedding")} AS score_full,
       |    ${oracleCosineDims("q.embedding", "v.embedding", matryoshkaDims)} AS score_trunc
       |  FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
       |  WHERE q.vec_id < $nQueries),
       |ranked AS (
       |  SELECT query_id, neighbor_id, score_full, score_trunc,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score_full DESC, neighbor_id ASC) AS rank_full,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score_trunc DESC, neighbor_id ASC) AS rank_trunc
       |  FROM scored),
       |t1 AS (
       |  SELECT query_id, neighbor_id AS trunc_top1,
       |    score_trunc AS trunc_score,
       |    CAST(rank_full AS INT) AS full_rank_of_trunc
       |  FROM ranked WHERE rank_trunc = 1),
       |f1 AS (
       |  SELECT query_id, neighbor_id AS full_top1, score_full AS full_score
       |  FROM ranked WHERE rank_full = 1)
       |SELECT f1.query_id, f1.full_top1, f1.full_score, t1.trunc_top1,
       |  t1.trunc_score, t1.full_rank_of_trunc,
       |  (t1.trunc_top1 = f1.full_top1) AS agree
       |FROM f1 JOIN t1 ON f1.query_id = t1.query_id
       |ORDER BY f1.query_id ASC""".stripMargin) { (s, d) =>
    graft.expressions.CosineSimilarity.ensureRegistered(s)
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.join(broadcast(queries), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        fastCosine(col("q_emb"), col("embedding")).as("score_full"),
        fastCosine(slice(col("q_emb"), 1, matryoshkaDims),
          slice(col("embedding"), 1, matryoshkaDims)).as("score_trunc"))
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("score_full").desc, col("neighbor_id").asc)
    val wt = Window.partitionBy(col("query_id"))
      .orderBy(col("score_trunc").desc, col("neighbor_id").asc)
    val ranked = scored
      .withColumn("rank_full", row_number().over(wf))
      .withColumn("rank_trunc", row_number().over(wt))
    val t1 = ranked.filter(col("rank_trunc") === 1)
      .select(col("query_id"), col("neighbor_id").as("trunc_top1"),
        col("score_trunc").as("trunc_score"),
        col("rank_full").as("full_rank_of_trunc"))
    val f1 = ranked.filter(col("rank_full") === 1)
      .select(col("query_id"), col("neighbor_id").as("full_top1"),
        col("score_full").as("full_score"))
    f1.join(t1, Seq("query_id"))
      .select(col("query_id"), col("full_top1"), col("full_score"),
        col("trunc_top1"), col("trunc_score"), col("full_rank_of_trunc"),
        (col("trunc_top1") === col("full_top1")).as("agree"))
      .orderBy(col("query_id").asc)
  }

  private[graft] val annLshAuxDir = s"${OracleAux.root}/ann_lsh_keys"

  /** Memoized (embedding, exploded band-key) frame — one band-key pass
    * per session per corpus, shared by q_ann_lsh and q_emb_knn_graph;
    * PURE (the oracle-replay publish is [[prepareAnnLshKeys]]).
    */
  private def annLshKeyedFrame(s: SparkSession, d: String): DataFrame = {
    graft.expressions.CosineSimilarity.ensureRegistered(s)
    graft.expressions.LshBandKeys.ensureRegistered(s)
    SharedFrames.frame(s, s"ann_lsh_keys:$d") {
      Tables.embeddings(s, d)
        .withColumn("bk", explode(fastLshBandKeys(col("embedding"))))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }
  }

  /** Prepare hook shared by q_ann_lsh and q_emb_knn_graph: publish the
    * (vec_id, bk) band-key table both oracles replay.
    */
  private def prepareAnnLshKeys(s: SparkSession, d: String): Unit =
    OracleAux.prepareOnce(s, annLshAuxDir, d) {
      OracleAux.write(annLshKeyedFrame(s, d).select(col("vec_id"), col("bk")),
        annLshAuxDir, corpusKey(Tables.embeddings(s, d)), singleFile = false)
    }

  /** LSH-banded ANN: banded hyperplane keys generate candidates, exact
    * cosine reranks. ORACLE REPLAY: the engine materializes its
    * exploded (vec_id, bk) band-key table (kernel spec-pinned by
    * LshBandKeysFastSpec bit-identity); DuckDB replays the candidate
    * equi-join, dedup, the exact-cosine rerank, and the top-k ranking.
    * AnnRecallSpec additionally measures recall against
    * q_ann_bruteforce.
    */
  val qAnnLsh: Q = Q.sql(
    "q_ann_lsh",
    s"""WITH keyed AS (
       |  SELECT vec_id, bk FROM read_parquet('$annLshAuxDir/*/*.parquet')
       |  WHERE corpus_key = (SELECT SUM(vec_id) FROM embeddings)),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, v.vec_id AS neighbor_id
       |  FROM keyed q JOIN keyed v ON q.bk = v.bk
       |  WHERE q.vec_id < $nQueries AND v.vec_id <> q.vec_id),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${oracleCosine("qe.embedding", "ve.embedding")} AS score
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ve ON ve.vec_id = c.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, score
       |FROM ranked WHERE rank <= $topK
       |ORDER BY query_id ASC, rank ASC""".stripMargin) { (s, d) =>
    val emb = annLshKeyedFrame(s, d)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("bk"))
    val cand = emb.join(broadcast(queries), Seq("bk"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("q_emb"), col("embedding"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("score", fastCosine(col("q_emb"), col("embedding")))
    topKPerQuery(cand)
  }.preparedBy(prepareAnnLshKeys)

  private[graft] val knnK = 5

  /** MEGA-BUCKET GUARD for the band-key self-join family — the band
    * analogue of [[TextQ.maxShingleDf]]: a duplicate-heavy corpus
    * collapses many near-identical vectors into ONE band bucket, and
    * an uncapped self-join is O(Σ bucket²) (the knn_graph_10x probe
    * measured 527 s at 10 exact copies/doc — BENCH_NOTES). The
    * NEIGHBOR side of the candidate join keeps only each bucket's
    * [[maxBandBucket]] lowest vec_ids (a deterministic, engine-
    * portable choice), bounding the pair space at bucket × cap —
    * linear, not quadratic, in bucket size. Anchors are NEVER capped,
    * so every vector still receives candidates; in a mega bucket the
    * members are near-identical by construction, so any cap-sized
    * subset supplies equally-good neighbors. Buckets below the cap
    * (every non-pathological corpus) are byte-identical to the
    * uncapped join. Truncation is a disclosed loss: the engine logs
    * the over-cap bucket count and excluded-member count whenever the
    * cap binds (SCALING.md §6).
    */
  private[graft] val maxBandBucket = 128

  /** One-row disclosed-loss audit of a band-key table against
    * [[maxBandBucket]]; logs only when the cap binds. MEMOIZED per
    * session × audit-site × corpus (the `what` string must embed the
    * corpus dir): the audit is one extra aggregation pass over the
    * band table, and charging it to every materialization of a query
    * (Bench runs each body twice) doubles the disclosure cost for a
    * cap that on clean corpora never binds. One run per session is
    * exactly as informative — the corpus under a dir is immutable for
    * the session (the SharedFrames contract).
    */
  private[queries] def logBucketCapLoss(keys: DataFrame, bucketCols: Seq[String],
                                        what: String,
                                        lossDesc: String =
                                          "excluded from the capped join side")
      : Unit =
    SharedFrames.value(keys.sparkSession, s"bucket_cap_loss:$what") {
      val over = keys.groupBy(bucketCols.map(col): _*)
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > maxBandBucket)
        .agg(count(lit(1)).as("buckets"),
          sum(col("n") - maxBandBucket).as("dropped"))
        .head()
      if (!over.isNullAt(1) && over.getLong(1) > 0L)
        System.err.println(s"[graft] $what: ${over.getLong(0)} band bucket(s) " +
          s"over $maxBandBucket members; ${over.getLong(1)} member row(s) " +
          s"$lossDesc (disclosed loss)")
      java.lang.Boolean.TRUE
    }

  /** Shared oracle CTE chain replaying the kNN graph from the
    * materialized band keys: candidate join (neighbor side capped at
    * [[maxBandBucket]] per bucket, mirroring the engine), pair dedup,
    * exact-cosine rerank, ranking — consumed by q_emb_knn_graph,
    * q_emb_topic_clusters, and (with a label twist)
    * q_emb_hard_negatives.
    */
  private def knnRankedCte: String =
    s"""keyed AS (
       |  SELECT vec_id, bk FROM read_parquet('$annLshAuxDir/*/*.parquet')
       |  WHERE corpus_key = (SELECT SUM(vec_id) FROM embeddings)),
       |kept AS (
       |  SELECT vec_id, bk FROM (
       |    SELECT vec_id, bk,
       |      ROW_NUMBER() OVER (PARTITION BY bk ORDER BY vec_id ASC) AS bpos
       |    FROM keyed) WHERE bpos <= $maxBandBucket),
       |cand AS (
       |  SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id
       |  FROM keyed a JOIN kept b ON a.bk = b.bk
       |  WHERE a.vec_id <> b.vec_id),
       |scored AS (
       |  SELECT c.vec_id, c.neighbor_id,
       |    ${oracleCosine("ea.embedding", "eb.embedding")} AS score
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.vec_id
       |  JOIN embeddings eb ON eb.vec_id = c.neighbor_id),
       |ranked AS (
       |  SELECT vec_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, neighbor_id ASC) AS rank
       |  FROM scored)""".stripMargin

  private[graft] val hardNegK = 3

  /** Memoized ranked candidate-edge table — ONE candidate self-join +
    * exact-cosine rerank + one WindowExec pass per session per corpus
    * serves the whole graph family. Two ranks come out of the same
    * window (identical partition/order spec, so Spark evaluates both in
    * a single sort): `rank` = row_number over ALL of an anchor's
    * candidate neighbors (q_emb_knn_graph, q_emb_topic_clusters), and
    * `xrank` = running count of CROSS-LABEL neighbors in the same
    * (score desc, neighbor_id asc) order — which for a cross-label row
    * equals its row_number within the cross-label subset, i.e. the
    * hard-negative rank (q_emb_hard_negatives). Only rows any consumer
    * can keep survive into the checkpoint (≤ knnK + hardNegK per
    * anchor), so the memo stays anchor-bounded, never pair-bounded.
    *
    * Before this was shared, q_emb_hard_negatives re-ran the full
    * candidate+rerank pass on every materialization: 28.2 s of a
    * 133 s sf1 catalog for a query whose steady-state work is a filter.
    */
  private def rankedPairsFrame(s: SparkSession, d: String): DataFrame =
    SharedFrames.frame(s, s"knn_ranked_pairs:$d") {
      val keyed = annLshKeyedFrame(s, d)
        .select(col("vec_id"), col("bk"), col("label"), col("embedding"))
      logBucketCapLoss(keyed.select(col("vec_id"), col("bk")), Seq("bk"),
        s"knn ranked pairs:$d")
      buildRankedPairs(keyed).localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }

  /** The ranked-pairs derivation over a (vec_id, bk, label, embedding)
    * band-key table — package-private so PlanAuditSpec can pin the
    * shape the memoizing checkpoint above would hide.
    */
  private[graft] def buildRankedPairs(keyed: DataFrame): DataFrame = {
      // mega-bucket guard: neighbor side capped per bucket (see
      // [[maxBandBucket]]) — pair space bucket × cap, never bucket²
      val wB = Window.partitionBy(col("bk")).orderBy(col("vec_id").asc)
      val kept = keyed
        .withColumn("__bpos", row_number().over(wB))
        .filter(col("__bpos") <= maxBandBucket)
        .select(col("vec_id").as("neighbor_id"), col("bk"),
          col("label").as("n_label"), col("embedding").as("n_emb"))
      // Score INSIDE the bucket join: both join sides are keys-table-
      // sized (vectors × bands) and carry their embeddings, so the
      // pair-sized join output is projected to narrow (ids, labels,
      // score) tuples in the SAME stage — the arrays never enter a
      // pair-sized shuffle. (The previous shape deduped bare id pairs
      // first and re-joined embeddings onto the pair table twice; at
      // sf10 those two sort-merge joins sorted ~4e8 array-carrying
      // rows and overflowed local disk with >60 GB of spill.) Cosine
      // is recomputed per band duplicate — a cheap codegen'd kernel —
      // to buy the narrow shuffle.
      val scored = keyed.join(kept, Seq("bk"))
        .filter(col("vec_id") =!= col("neighbor_id"))
        .select(col("vec_id"), col("neighbor_id"), col("label"),
          col("n_label"),
          fastCosine(col("embedding"), col("n_emb")).as("score"))
      // Cross-band dedup FOLDED INTO the ranking window: every
      // duplicate of a pair carries identical sort keys (cosine is a
      // pure function of the two vectors, so same neighbor_id ⇒ same
      // score), which makes duplicates ADJACENT under (score desc,
      // neighbor_id asc) within an anchor's partition. A lag() marks
      // the first occurrence and both ranks count firsts only — exact
      // row_number-over-distinct-pairs semantics with ONE exchange
      // (hash by vec_id) instead of two. The previous shape paid a
      // full-width pair shuffle for a groupBy(vec_id, neighbor_id)
      // dedup whose map-side combine never fired (a pair's duplicates
      // come from different bands, hence different bucket partitions),
      // then a second exchange for this window: at sf10 that was two
      // ~1.5e8-row shuffles where one suffices.
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("score").desc, col("neighbor_id").asc)
      val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val xlabel = col("label") =!= col("n_label")
      val isFirst = lag(col("neighbor_id"), 1).over(w).isNull ||
        lag(col("neighbor_id"), 1).over(w) =!= col("neighbor_id")
      scored
        .withColumn("__first", isFirst)
        .withColumn("rank",
          sum(when(col("__first"), 1).otherwise(0)).over(running).cast(IntegerType))
        .withColumn("xrank",
          sum(when(col("__first") && xlabel, 1).otherwise(0)).over(running))
        .filter(col("__first") &&
          (col("rank") <= knnK || (xlabel && col("xrank") <= hardNegK)))
        .drop("__first")
  }

  /** kNN-graph edge table (vec_id, neighbor_id, rank, score) over the
    * shared [[rankedPairsFrame]] — checkpointed in its own right so
    * consumers (the CC loop re-reads its edge input per contraction
    * round) scan a materialized table, not a filter plan.
    */
  private def knnGraphFrame(s: SparkSession, d: String): DataFrame =
    SharedFrames.frame(s, s"knn_graph:$d") {
      rankedPairsFrame(s, d)
        .filter(col("rank") <= knnK)
        .select(col("vec_id"), col("neighbor_id"), col("rank"), col("score"))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }

  /** Approximate kNN GRAPH — every corpus vector's top-5 neighbors
    * among its LSH band-collision candidates (directed edges; vectors
    * whose buckets hold no other member are isolated and absent). The
    * kNN graph is the substrate for graph-based corpus curation:
    * SemDeDup-style cluster dedup, connected-component topic discovery,
    * and diversity-aware sampling all consume it, so it ships as a
    * first-class artifact rather than a per-query byproduct.
    *
    * Scale shape: unlike the fixed-query ANN paths this is a SELF-join
    * — both sides corpus-sized — so candidates are generated from the
    * keys-only (vec_id, bk) table (embeddings re-joined only for the
    * rerank of surviving pairs) and the pair space is O(sum bucket^2),
    * never all-pairs. The band-key frame, its aux write, and the
    * memoized checkpoint are shared with q_ann_lsh — one kernel pass
    * serves both. ORACLE REPLAY: DuckDB reads the materialized band
    * keys (kernel spec-pinned by LshBandKeysFastSpec) and replays the
    * candidate join, dedup, exact-cosine rerank, and ranking;
    * KnnGraphSpec grades recall and pins graph invariants.
    */
  val qEmbKnnGraph: Q = Q.sql(
    "q_emb_knn_graph",
    s"""WITH $knnRankedCte
       |SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank, score
       |FROM ranked WHERE rank <= $knnK
       |ORDER BY vec_id ASC, rank ASC""".stripMargin) { (s, d) =>
    knnGraphFrame(s, d)
      .orderBy(col("vec_id").asc, col("rank").asc)
  }.preparedBy(prepareAnnLshKeys)

  /** Topic-cluster threshold: a kNN edge survives into the component
    * graph only at cosine ≥ this (99th-pct corpus cosine ≈ 0.29, so
    * the graph keeps the strongest tail, not the noise floor).
    */
  private val topicTau = 0.25

  /** Semantic TOPIC CLUSTERS — connected components over the kNN
    * graph's strong edges (score ≥ [[topicTau]]), labeled by component
    * min vec_id with member counts: the corpus-discovery operator that
    * turns the kNN artifact into browsable topics (and the first stage
    * of cluster-level curation decisions — cap a topic, drop a topic,
    * rebalance across topics). Vectors with no qualifying edge are
    * absent by construction (singletons are not topics).
    *
    * Scale shape: edge generation reuses the memoized kNN frame (one
    * candidate+rerank pass per session); components run the same
    * large-star/small-star O(log n) contraction as the near-dup
    * clusters ([[PipelineQ.connectedComponents]]) — keys-only shuffles,
    * hybrid driver union-find under 2^18 edges. ORACLE REPLAY: DuckDB
    * replays the kNN ranking from the band-key table, then a recursive
    * min-label reach computes the identical components.
    */
  val qEmbTopicClusters: Q = Q.sql(
    "q_emb_topic_clusters",
    s"""WITH RECURSIVE $knnRankedCte,
       |knn AS (
       |  SELECT vec_id, neighbor_id FROM ranked
       |  WHERE rank <= $knnK AND score >= $topicTau),
       |edges AS (
       |  SELECT vec_id AS src, neighbor_id AS dst FROM knn
       |  UNION SELECT neighbor_id, vec_id FROM knn),
       |reach AS (
       |  SELECT DISTINCT src AS vec_id, src AS r FROM edges
       |  UNION
       |  SELECT w.vec_id, e.dst FROM reach w JOIN edges e ON w.r = e.src),
       |comp AS (SELECT vec_id, MIN(r) AS cluster_id FROM reach GROUP BY vec_id)
       |SELECT c.vec_id, c.cluster_id, CAST(s.n AS BIGINT) AS cluster_size
       |FROM comp c
       |JOIN (SELECT cluster_id, COUNT(*) AS n FROM comp GROUP BY cluster_id) s
       |  ON c.cluster_id = s.cluster_id
       |ORDER BY vec_id ASC""".stripMargin) { (s, d) =>
    val edges = knnGraphFrame(s, d)
      .filter(col("score") >= topicTau)
      .select(col("vec_id"), col("neighbor_id"))
    val comp = PipelineQ.connectedComponents(edges)
      .toDF("vec_id", "cluster_id")
    val sizes = comp.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "cluster_id")
      .select(col("vec_id"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("vec_id").asc)
  }.preparedBy(prepareAnnLshKeys)

  /** BFS HOP DISTANCE over the kNN graph — min hops (≤ 4) from the
    * benchmark seed set (vec_id < 5, the corpus's standing query
    * vectors) to every reachable vector: the semantic-radius operator
    * behind "how far is this example from the eval set" triage, and
    * the unweighted-SSSP primitive the component/label-prop family
    * doesn't expose (components say WHETHER connected, hops say HOW
    * CLOSE).
    *
    * Scale shape: Pregel-style frontier expansion over the memoized
    * kNN edge table — each of the 4 rounds is one keys-only join +
    * distinct + anti-join against the reached set, with a
    * localCheckpoint truncating plan lineage per round (the iterative
    * DataFrame idiom; at 100 TB each round is one bounded shuffle and
    * the frontier shrinks as the graph saturates). Depth is FIXED at
    * 4, so the loop is 4 declarative plans, not a driver-side
    * convergence test. ORACLE REPLAY: DuckDB recursive CTE walks the
    * same edges carrying (node, hops), deduped by UNION, min-hop per
    * node — BFS is deterministic, so the hash gate is exact.
    */
  val qEmbKnnHops: Q = Q.sql(
    "q_emb_knn_hops",
    s"""WITH RECURSIVE $knnRankedCte,
       |knn AS (SELECT vec_id, neighbor_id FROM ranked WHERE rank <= $knnK),
       |edges AS (
       |  SELECT vec_id AS src, neighbor_id AS dst FROM knn
       |  UNION SELECT neighbor_id, vec_id FROM knn),
       |walk AS (
       |  SELECT DISTINCT src AS v, 0 AS hops FROM edges WHERE src < 5
       |  UNION
       |  SELECT e.dst AS v, w.hops + 1 AS hops
       |  FROM walk w JOIN edges e ON w.v = e.src WHERE w.hops < 4)
       |SELECT v AS vec_id, CAST(MIN(hops) AS INT) AS hops
       |FROM walk GROUP BY v
       |ORDER BY vec_id ASC""".stripMargin) { (s, d) =>
    val edges = SharedFrames.frame(s, s"knn_undirected_edges:$d") {
      val knn = knnGraphFrame(s, d).select(col("vec_id"), col("neighbor_id"))
      knn.select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
        .unionByName(knn
          .select(col("neighbor_id").as("src"), col("vec_id").as("dst")))
        .distinct()
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }
    var reached = edges.filter(col("src") < 5)
      .select(col("src").as("v")).distinct()
      .withColumn("hops", lit(0))
    var frontier = reached
    for (h <- 1 to 4) {
      frontier = frontier.join(edges, frontier("v") === edges("src"))
        .select(col("dst").as("v")).distinct()
        .join(reached, Seq("v"), "left_anti")
        .withColumn("hops", lit(h))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      reached = reached.unionByName(frontier).localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }
    reached
      .select(col("v").as("vec_id"), col("hops").cast(IntegerType).as("hops"))
      .orderBy(col("vec_id").asc)
  }.preparedBy(prepareAnnLshKeys)

  /** HARD-NEGATIVE MINING for retrieval/metric training (the standard
    * contrastive-training data op: for each anchor, the most similar
    * vectors of a DIFFERENT label are the negatives that actually move
    * the loss — random negatives are too easy). Top-[[hardNegK]]
    * cross-label neighbors per anchor among its LSH band collisions,
    * exact-cosine ranked.
    *
    * Scale shape: rides the shared [[rankedPairsFrame]] — the label
    * filter applies to candidate PAIRS (labels ride the keyed frame,
    * so no extra join), and the cross-label rank (`xrank`) comes out
    * of the same single window pass that ranks the kNN graph, so this
    * query's own work is a filter over the memoized edge table.
    * ORACLE REPLAY: band-key table + the embeddings' own labels.
    */
  val qEmbHardNegatives: Q = Q.sql(
    "q_emb_hard_negatives",
    s"""WITH keyed AS (
       |  SELECT k.vec_id, k.bk, e.label
       |  FROM read_parquet('$annLshAuxDir/*/*.parquet') k
       |  JOIN embeddings e ON e.vec_id = k.vec_id
       |  WHERE k.corpus_key = (SELECT SUM(vec_id) FROM embeddings)),
       |kept AS (
       |  SELECT vec_id, bk, label FROM (
       |    SELECT vec_id, bk, label,
       |      ROW_NUMBER() OVER (PARTITION BY bk ORDER BY vec_id ASC) AS bpos
       |    FROM keyed) WHERE bpos <= $maxBandBucket),
       |cand AS (
       |  SELECT DISTINCT a.vec_id, b.vec_id AS neighbor_id
       |  FROM keyed a JOIN kept b ON a.bk = b.bk
       |  WHERE a.vec_id <> b.vec_id AND a.label <> b.label),
       |scored AS (
       |  SELECT c.vec_id, c.neighbor_id,
       |    ${oracleCosine("ea.embedding", "eb.embedding")} AS score
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.vec_id
       |  JOIN embeddings eb ON eb.vec_id = c.neighbor_id),
       |ranked AS (
       |  SELECT vec_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank, score
       |FROM ranked WHERE rank <= $hardNegK
       |ORDER BY vec_id ASC, rank ASC""".stripMargin) { (s, d) =>
    rankedPairsFrame(s, d)
      .filter(col("label") =!= col("n_label") && col("xrank") <= hardNegK)
      .select(col("vec_id"), col("neighbor_id"),
        col("xrank").cast(IntegerType).as("rank"), col("score"))
      .orderBy(col("vec_id").asc, col("rank").asc)
  }.preparedBy(prepareAnnLshKeys)

  /** Embedding-cosine near-dup pairs over a deterministic sample of
    * left anchors (every 20th vector) — the ORACLE-GATED form runs the
    * exact sampled all-pairs semantics the SQL expresses, with a 0.40
    * threshold chosen so the gate is NON-vacuous on the testdata (3/2/50
    * matching pairs at sf0.001/0.01/0.1; max pairwise cosine ≈0.48).
    * Running the approximate LSH path against an exact oracle would
    * only pass while both sides are empty — recall loss would read as
    * an oracle mismatch, so the production LSH path is the separate
    * rows-only [[qEmbeddingNearDupLsh]], recall-graded by
    * EmbeddingNearDupSpec on planted near-dups.
    */
  val qEmbeddingNearDup: Q = Q.sql(
    "q_embedding_neardup",
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ${oracleCosine("a.embedding", "b.embedding")} AS cos_sim
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE a.vec_id % 20 = 0
       |  AND ${oracleCosine("a.embedding", "b.embedding")} >= 0.40
       |ORDER BY vec_a ASC, vec_b ASC""".stripMargin) { (s, d) =>
    embeddingNearDupExact(Tables.embeddings(s, d), 0.40)
  }

  private[graft] val neardupLshAuxDir = s"${OracleAux.root}/neardup_lsh_keys"

  /** Production near-dup path: LSH band keys generate candidate pairs
    * via a plain equi-join (keys only — embeddings re-joined once for
    * the exact rerank); at 100 TB the bucketed join replaces the
    * all-pairs scan. Approximate-by-construction (a true pair colliding
    * in no band is missed) — which is exactly why the ORACLE REPLAYS
    * the engine's materialized (vec_id, bk) table rather than an exact
    * pair set: recall is EmbeddingNearDupSpec's job, while the oracle
    * hash-verifies everything downstream of the (spec-pinned) band
    * keys — anchor selection, candidate join, dedup, rerank, threshold.
    */
  val qEmbeddingNearDupLsh: Q = Q.sql(
    "q_embedding_neardup_lsh",
    s"""WITH keyed AS (
       |  SELECT vec_id, bk FROM read_parquet('$neardupLshAuxDir/*/*.parquet')
       |  WHERE corpus_key = (SELECT SUM(vec_id) FROM embeddings)),
       |kept AS (
       |  SELECT vec_id, bk FROM (
       |    SELECT vec_id, bk,
       |      ROW_NUMBER() OVER (PARTITION BY bk ORDER BY vec_id ASC) AS bpos
       |    FROM keyed) WHERE bpos <= $maxBandBucket),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, v.vec_id AS vec_b
       |  FROM keyed a JOIN kept v ON a.bk = v.bk
       |  WHERE a.vec_id % 20 = 0 AND a.vec_id < v.vec_id),
       |scored AS (
       |  SELECT c.vec_a, c.vec_b,
       |    ${oracleCosine("ea.embedding", "eb.embedding")} AS cos_sim
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.vec_a
       |  JOIN embeddings eb ON eb.vec_id = c.vec_b)
       |SELECT vec_a, vec_b, cos_sim FROM scored
       |WHERE cos_sim >= 0.55
       |ORDER BY vec_a ASC, vec_b ASC""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val keys = neardupBandKeys(s, d)
    logBucketCapLoss(keys, Seq("bk"), s"embedding neardup lsh:$d")
    embeddingNearDupLshFromKeys(keys, emb, 0.55)
  }.preparedBy(prepareNeardupKeys)

  /** Benchmark size / threshold for embedding-space decontamination:
    * vec_id < 25 stands in for an eval benchmark's embedded examples
    * (mirrors q_doc_contamination's doc_id < 10 convention); τ = 0.40
    * is non-vacuous on the testdata at every gate SF (6/7/24 matching
    * pairs at sf0.001/0.01/0.1).
    */
  private[graft] val embDecontamBench = 25
  private[graft] val embDecontamTau = 0.40

  /** SEMANTIC decontamination (the embedding-space sibling of
    * q_doc_contamination's n-gram sweep): a corpus vector whose cosine
    * to ANY benchmark embedding reaches τ is reported for removal,
    * with the closest benchmark item as evidence (ties → lowest
    * bench_id). N-gram overlap misses paraphrased or translated eval
    * leakage; embedding similarity is the standard second sweep
    * (e.g. phi-family "decontamination by embedding similarity").
    *
    * Scale shape: the benchmark side is thousands of rows at worst —
    * it BROADCASTS, the corpus scans once with no shuffle, and the
    * argmax window runs only over the filtered (contaminated) rows,
    * not the corpus. 100 TB cost = one read of the embedding column.
    */
  val qEmbDecontam: Q = Q.sql(
    "q_emb_decontam",
    s"""WITH scored AS (
       |  SELECT c.vec_id, b.vec_id AS bench_id,
       |    ${oracleCosine("c.embedding", "b.embedding")} AS cos_sim
       |  FROM embeddings c JOIN embeddings b ON b.vec_id < $embDecontamBench
       |  WHERE c.vec_id >= $embDecontamBench),
       |hits AS (
       |  SELECT vec_id, bench_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cos_sim DESC, bench_id ASC) AS rn
       |  FROM scored WHERE cos_sim >= $embDecontamTau)
       |SELECT vec_id, bench_id, cos_sim
       |FROM hits WHERE rn = 1
       |ORDER BY vec_id ASC""".stripMargin) { (s, d) =>
    graft.expressions.CosineSimilarity.ensureRegistered(s)
    val emb = Tables.embeddings(s, d)
    val bench = emb.filter(col("vec_id") < embDecontamBench)
      .select(col("vec_id").as("bench_id"), col("embedding").as("b_emb"))
    val hits = emb.filter(col("vec_id") >= embDecontamBench)
      .join(broadcast(bench))
      .select(col("vec_id"), col("bench_id"),
        fastCosine(col("embedding"), col("b_emb")).as("cos_sim"))
      .filter(col("cos_sim") >= embDecontamTau)
    hits.withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("cos_sim").desc, col("bench_id").asc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("bench_id"), col("cos_sim"))
      .orderBy(col("vec_id").asc)
  }

  /** CLUSTER-BALANCED sampling — topic rebalancing in embedding space
    * (the semantic sibling of q_doc_mix_balance's per-source rates):
    * vectors assign to the memoized corpus centroids, over-represented
    * clusters down-sample to the fair per-cluster share with the SAME
    * deterministic md5 cut as the stratified sampler, so the rebalanced
    * subset is reproducible and order-independent. The pre-training
    * counter to topic collapse: a corpus dominated by one semantic
    * cluster (SEO boilerplate, code license headers) stops dominating
    * the sample.
    *
    * Scale shape: assignment fuses into the scan (broadcast centroids);
    * the rate table is k rows crossed with one total — broadcast back;
    * the corpus filters in place. No shuffle except the output sort.
    */
  val qEmbClusterBalance: Q = Q.sql(
    "q_emb_cluster_balance",
    s"""${centroidDistCte(ivfAuxDir)},
       |assigned AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM dist) WHERE rn = 1),
       |stats AS (
       |  SELECT cid, CAST(COUNT(*) AS DOUBLE) AS cnt FROM assigned GROUP BY cid),
       |tot AS (
       |  SELECT CAST(SUM(cnt) AS DOUBLE) AS total,
       |         CAST(COUNT(*) AS DOUBLE) AS k FROM stats),
       |rates AS (
       |  SELECT cid, LEAST(1.0, (total / k) / cnt) AS rate
       |  FROM stats CROSS JOIN tot)
       |SELECT a.vec_id, a.cid
       |FROM assigned a JOIN rates r USING (cid)
       |WHERE r.rate >= 1.0
       |   OR substring(md5(CAST(a.vec_id AS VARCHAR)), 1, 8) <
       |      lpad(lower(to_hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT))), 8, '0')
       |ORDER BY vec_id ASC""".stripMargin) { (s, d) =>
    clusterBalance(assignedWithDist(s, d).select(col("vec_id"), col("cid")))
  }.preparedBy(prepareCentroids(ivfAuxDir))

  /** Memoized (vec_id, cid, cdist) nearest-centroid assignment over
    * the corpus — ONE O(n·k·d) argmin scan per (session, corpus),
    * checkpointed, shared by q_emb_cluster_balance (which only needs
    * the cid) and q_emb_prune_prototypes (which ranks on the
    * distance). The single-pass assignWithDistUdf means adding the
    * distance consumer cost nothing over the old cid-only frame.
    */
  private def assignedWithDist(s: org.apache.spark.sql.SparkSession,
                               d: String): DataFrame =
    SharedFrames.frame(s, s"ivf_assigned:$d") {
      import graft.functions.IvfFunctions
      val emb = Tables.embeddings(s, d)
      val centroids = corpusCentroids(s, d, emb)
      val bc = IvfFunctions.broadcastCentroids(emb, centroids)
      emb.withColumn("__a", IvfFunctions.assignWithDistUdf(bc)(col("embedding")))
        .select(col("vec_id"), col("__a._1").as("cid"), col("__a._2").as("cdist"))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }

  /** PROTOTYPICALITY pruning (Sorscher et al., NeurIPS 2022 "Beyond
    * neural scaling laws"): when data is abundant, dropping the
    * EASIEST examples beats random pruning — and the self-supervised
    * prototypicality metric is exactly the distance to the example's
    * k-means centroid. Keep the hard half of every cluster: rank
    * within cluster by squared-L2 distance to the assigned centroid
    * DESCENDING and keep ceil(cluster/2) (ceil so singleton clusters
    * survive — a topic with one document is not "easy", it's rare).
    *
    * HASH-VERIFIED including the distance column: both engines run
    * the identical ascending-dimension (v−c)² fold on identical
    * operands, so the doubles replay bit-exactly (same argument as
    * the ANN cosine scores).
    *
    * Scale shape: assignment fuses into the scan (broadcast
    * centroids, memoized frame shared with cluster balance); the
    * rank/count windows shuffle (vec_id, cid, cdist) triples only —
    * 20 bytes/row, never the vectors. Cluster sizes are bounded by
    * the adaptive-k trainer (k ≈ n/125), so per-cluster sorts stay
    * flat as the corpus grows.
    */
  val qEmbPrunePrototypes: Q = Q.sql(
    "q_emb_prune_prototypes",
    s"""${centroidDistCte(ivfAuxDir)},
       |assigned AS (
       |  SELECT vec_id, cid, d AS cdist FROM (
       |    SELECT vec_id, cid, d,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM dist) WHERE rn = 1),
       |ranked AS (
       |  SELECT vec_id, cid, cdist,
       |    ROW_NUMBER() OVER (PARTITION BY cid
       |      ORDER BY cdist DESC, vec_id ASC) AS rk,
       |    COUNT(*) OVER (PARTITION BY cid) AS cnt
       |  FROM assigned)
       |SELECT vec_id, cid, cdist FROM ranked
       |WHERE rk * 2 <= cnt + 1
       |ORDER BY vec_id ASC""".stripMargin,
    doc = "ORACLE REPLAY: engine-trained k-means centroids (kernel " +
      "pinned by DistributedKMeansSpec); DuckDB replays assignment, " +
      "hardness ranking, and the keep-half cut.") { (s, d) =>
    assignedWithDist(s, d)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cid"))
          .orderBy(col("cdist").desc, col("vec_id").asc)))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("cid"))))
      .filter(col("rk") * 2 <= col("cnt") + 1)
      .select(col("vec_id"), col("cid"), col("cdist"))
      .orderBy(col("vec_id").asc)
  }.preparedBy(prepareCentroids(ivfAuxDir))

  /** The rate-table rebalance over any (vec_id, cid) assignment —
    * factored so the spec can feed hand-built skewed assignments and
    * compute the exact expected md5-cut survivor set.
    */
  def clusterBalance(assigned: DataFrame): DataFrame = {
    val stats = assigned.groupBy("cid")
      .agg(count(lit(1)).cast(DoubleType).as("cnt"))
    val tot = stats.agg(sum("cnt").as("total"),
      count(lit(1)).cast(DoubleType).as("k"))
    val rates = stats.crossJoin(broadcast(tot))
      .select(col("cid"),
        least(lit(1.0), (col("total") / col("k")) / col("cnt")).as("rate"))
    assigned.join(broadcast(rates), "cid")
      .filter(col("rate") >= 1.0 ||
        substring(md5(col("vec_id").cast(StringType)), 1, 8) <
          lpad(lower(hex(floor(col("rate") * lit(4294967296.0)).cast(LongType))),
            8, "0"))
      .select(col("vec_id"), col("cid"))
      .orderBy(col("vec_id").asc)
  }

  /** The 8-band × 8-plane LSH key table over the corpus embeddings —
    * memoized checkpoint shared by q_embedding_neardup_lsh AND
    * q_emb_semdedup_lsh (one band-key pass per session per corpus);
    * PURE (the oracle-replay publish is [[prepareNeardupKeys]]).
    */
  private def neardupBandKeys(s: org.apache.spark.sql.SparkSession,
                              d: String): DataFrame = {
    graft.expressions.LshBandKeys.ensureRegistered(s)
    SharedFrames.frame(s, s"neardup_lsh_keys:$d") {
      Tables.embeddings(s, d).select(col("vec_id"),
        explode(fastLshBandKeys(col("embedding"), bands = 8, rowsPerBand = 8)).as("bk"))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }
  }

  /** Prepare hook shared by q_embedding_neardup_lsh and
    * q_emb_semdedup_lsh: publish the 8×8 band-key table.
    */
  private def prepareNeardupKeys(s: org.apache.spark.sql.SparkSession,
                                 d: String): Unit =
    OracleAux.prepareOnce(s, neardupLshAuxDir, d) {
      OracleAux.write(neardupBandKeys(s, d), neardupLshAuxDir,
        corpusKey(Tables.embeddings(s, d)), singleFile = false)
    }

  /** LSH-candidate + exact-rerank near-dup over any (vec_id, embedding)
    * frame; factored out so specs can run it on planted fixtures.
    */
  def embeddingNearDupLsh(emb: DataFrame, threshold: Double): DataFrame =
    embeddingNearDupLshFromKeys(
      emb.select(col("vec_id"),
        explode(fastLshBandKeys(col("embedding"), bands = 8, rowsPerBand = 8)).as("bk")),
      emb, threshold)

  /** The candidate-join + rerank stage over a precomputed (vec_id, bk)
    * band-key frame — split out so the catalog entry shares one cached
    * band-key pass between the aux write and the join.
    */
  def embeddingNearDupLshFromKeys(keyed: DataFrame, emb: DataFrame,
                                  threshold: Double): DataFrame = {
    graft.expressions.CosineSimilarity.ensureRegistered(emb.sparkSession)
    graft.expressions.LshBandKeys.ensureRegistered(emb.sparkSession)
    // near-dup banding: 8 bands × 8 planes — high-cosine pairs still
    // collide w.h.p. while random pairs land in 1-of-256 buckets/band
    val anchors = keyed.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("vec_a"), col("bk"))
    // mega-bucket guard (see [[maxBandBucket]]): the NON-anchor side
    // keeps each bucket's cap lowest vec_ids, bounding a duplicate-
    // heavy bucket's pair space at bucket/20 × cap instead of
    // bucket²/20 — the same O(bucket²) pathology the kNN family and
    // editdist neardup already guard. Anchors stay uncapped, so every
    // sampled anchor still receives candidates; sub-cap buckets are
    // byte-identical to the uncapped join.
    val wB = Window.partitionBy(col("bk")).orderBy(col("vec_id").asc)
    val kept = keyed
      .withColumn("__bpos", row_number().over(wB))
      .filter(col("__bpos") <= maxBandBucket)
      .drop("__bpos")
    val pairs = kept.join(anchors, Seq("bk"))
      .filter(col("vec_a") < col("vec_id"))
      .select(col("vec_a"), col("vec_id").as("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    val vecs = emb.select(col("vec_id"), col("embedding"))
    pairs
      .join(vecs.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")),
        Seq("vec_a"))
      .join(vecs.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")),
        Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        fastCosine(col("emb_a"), col("emb_b")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("vec_a").asc, col("vec_b").asc)
  }

  /** Exact all-pairs near-dup (the test oracle for the LSH path; O(N²),
    * small-SF/spec use only).
    */
  def embeddingNearDupExact(emb: DataFrame, threshold: Double): DataFrame = {
    graft.expressions.CosineSimilarity.ensureRegistered(emb.sparkSession)
    val anchors = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    emb.join(broadcast(anchors), col("vec_a") < col("vec_id"))
      .select(col("vec_a"), col("vec_id").as("vec_b"),
        fastCosine(col("emb_a"), col("embedding")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("vec_a").asc, col("vec_b").asc)
  }

  /** Cluster count growing with corpus size, for both the IVF coarse
    * quantizer and SemDeDup: ~125 vectors per cluster keeps the
    * within-cluster pair space O(Σ s_c²) linear in N (the SemDeDup
    * scale premise — the paper runs k=50k on LAION) and the probed
    * IVF fraction constant. Floored at 16 (the correctness-gate SFs:
    * sf0.01 and sf0.1 both resolve to 16, so gate results are
    * unchanged), capped at 65536: past
    * [[graft.functions.IvfFunctions.singleNodeKCap]] training switches
    * to the distributed Lloyd's loop (assign = broadcast centroids
    * into the scan, update = groupBy(cid) mean), so the SemDeDup paper
    * regime of k=50k trains as DataFrame jobs; the remaining cap only
    * bounds the centroid broadcast (64k × 64 dims ≈ 33 MB). Oracle-safe
    * by construction: the replay reads whatever centroid table the
    * engine wrote, never a literal k.
    */
  private def adaptiveK(n: Long): Int =
    math.max(16L, math.min(65536L, n / 125L)).toInt

  private val ivfNProbe = 6

  /** IVF-indexed ANN (k-means coarse quantizer + probed inverted
    * lists + exact rerank) — the second scale path beside the LSH
    * banding. HASH-VERIFIED: the engine materializes its trained
    * centroids (OracleAux) and DuckDB replays assignment, probe
    * ranking, candidate join, and the exact-cosine rerank; IvfAnnSpec
    * additionally measures recall against q_ann_bruteforce and pins
    * the k-means kernel on planted clusters.
    */
  /** The shared IVF oracle: replayed centroid table → assignment →
    * probe ranking → candidate join → exact-cosine rerank → top-k.
    * Used verbatim by q_ann_ivf (in-session index) AND
    * q_ann_ivf_persistent (materialized index): both engine paths are
    * deterministic functions of the same centroids, so one SQL gates
    * both — what differs (and what the second query verifies) is that
    * the persistent path reads assignment from the stored index.
    */
  private def ivfAnnOracleSql: String =
    s"""${centroidDistCte(ivfAuxDir)},
       |assigned AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM dist) WHERE rn = 1),
       |probed AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM dist WHERE vec_id < $nQueries) WHERE rn <= $ivfNProbe),
       |cand AS (
       |  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
       |  FROM probed p JOIN assigned a ON p.cid = a.cid
       |  WHERE a.vec_id <> p.query_id),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${oracleCosine("q.embedding", "v.embedding")} AS score
       |  FROM cand c
       |  JOIN embeddings q ON q.vec_id = c.query_id
       |  JOIN embeddings v ON v.vec_id = c.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, score
       |FROM ranked WHERE rank <= $topK
       |ORDER BY query_id ASC, rank ASC""".stripMargin

  val qAnnIvf: Q = Q.sql(
    "q_ann_ivf",
    ivfAnnOracleSql) { (s, d) =>
    import graft.functions.IvfFunctions
    val emb = Tables.embeddings(s, d)
    val centroids = corpusCentroids(s, d, emb)
    IvfFunctions.annTopKWith(
      emb, emb.filter(col("vec_id") < nQueries),
      centroids, nProbe = ivfNProbe, topK = topK)
  }.preparedBy(prepareCentroids(ivfAuxDir))

  /** The adaptive-k seed-42 coarse quantizer both q_ann_ivf and
    * q_emb_semdedup train — identical calls, so the centroid table is
    * memoized per (session, corpus). PURE — each query's aux dir gets
    * its replay copy from [[prepareCentroids]].
    */
  private def corpusCentroids(s: org.apache.spark.sql.SparkSession, d: String,
                              emb: DataFrame): Array[Array[Double]] =
    SharedFrames.value(s, s"corpus_centroids:$d") {
      val k = adaptiveK(emb.count())
      graft.functions.IvfFunctions.trainCentroids(emb, "embedding", k, seed = 42)
    }

  /** Prepare hook family: publish the shared centroid table to a
    * query's aux dir (ivf_centroids serves q_ann_ivf / q_ann_ivfpq /
    * q_emb_cluster_balance; semdedup_centroids serves both SemDeDup
    * variants) — training happens once, each DIR publishes once.
    */
  private def prepareCentroids(auxDir: String)(
      s: org.apache.spark.sql.SparkSession, d: String): Unit =
    OracleAux.prepareOnce(s, auxDir, d) {
      val emb = Tables.embeddings(s, d)
      writeCentroids(emb, corpusCentroids(s, d, emb), auxDir)
    }

  /** Build-once memo for the PERSISTENT IVF index
    * ([[graft.sink.VectorIndex]]): one warehouse table pair per
    * (session, corpus), named by the corpus fingerprint so a stale
    * table from another scale factor never answers. Invoked from the
    * prepare hook, so the timed/verified query is a pure index READ.
    */
  private def persistentIvfTable(s: org.apache.spark.sql.SparkSession,
                                 d: String): String =
    SharedFrames.value(s, s"vector_index_table:$d") {
      val emb = Tables.embeddings(s, d)
      val table = s"graft_vecidx_${corpusKey(emb)}"
      // PERSISTENT means reuse: if the name (which embeds the corpus
      // fingerprint) already resolves, the index from an earlier
      // session/build answers as-is — rebuilding would also clobber
      // the files under any OTHER session whose catalog cache still
      // points at them (a newSession() test harness hit exactly that).
      // refreshTable drops this session's stale listing if someone
      // else built it after we first read. Reuse is GUARDED (r13
      // ADVICE, tightened r14): the NAME is vec_id-only, so a
      // regenerated corpus with the same id set would alias it — the
      // build-time content signature must match the current corpus
      // (VectorIndex.signatureMatches: one hash-scan, COMPLETE — the
      // earlier quantizer compare only saw content drift that
      // perturbed the hash-cut training sample, and paid a k-means
      // retrain on every reuse just to run the compare).
      if (s.catalog.tableExists(table) &&
          s.catalog.tableExists(s"${table}_centroids")) {
        s.catalog.refreshTable(table)
        s.catalog.refreshTable(s"${table}_centroids")
        if (!graft.sink.VectorIndex.signatureMatches(s, table, emb))
          graft.sink.VectorIndex.build(emb, table, corpusCentroids(s, d, emb))
      } else {
        graft.sink.VectorIndex.build(emb, table, corpusCentroids(s, d, emb))
      }
      table
    }

  /** PERSISTENT-INDEX ANN — the deployment shape of [[qAnnIvf]]: the
    * coarse quantizer and the cid-bucketed inverted lists are
    * MATERIALIZED warehouse tables ([[graft.sink.VectorIndex]], the
    * embedding twin of the text side's HashIndex/BandIndex), and this
    * query is the SEARCH path: load the k-row centroid table, probe,
    * read ONLY the probed buckets (cid IN (…) → bucket pruning at the
    * scan; the index side never shuffles), exact-rerank. No k-means,
    * no corpus assignment, no corpus scan — the work a 100 TB ANN
    * service actually does per query batch once its index exists.
    * Index build runs in the prepare hook (once per session+corpus);
    * VectorIndexSpec proves search-vs-in-session result identity, the
    * pruned zero-Exchange index read, and append/rebuild equivalence.
    * Same oracle as q_ann_ivf: both paths are deterministic functions
    * of the same replayed centroid table.
    */
  val qAnnIvfPersistent: Q = Q.sql(
    "q_ann_ivf_persistent",
    ivfAnnOracleSql,
    doc = "ORACLE REPLAY: engine-published centroid table; DuckDB " +
      "replays assignment, probe ranking, candidate join, and the " +
      "exact-cosine rerank — the engine side answers from the " +
      "materialized VectorIndex tables, never retraining.") { (s, d) =>
    val table = persistentIvfTable(s, d)
    val queries = Tables.embeddings(s, d).filter(col("vec_id") < nQueries)
    graft.sink.VectorIndex.search(s, table, queries,
      nProbe = ivfNProbe, topK = topK)
  }.preparedBy { (s, d) =>
    prepareCentroids(ivfAuxDir)(s, d)
    persistentIvfTable(s, d)
    ()
  }

  /** Int8 scalar quantization of the embedding column — the memory
    * lever that makes vector search shippable at 100 TB: per-dimension
    * corpus min/max, each float mapped to floor((x−mn)·255/(mx−mn)) in
    * [0,255], shrinking the resident index 4× (float32 → uint8) at a
    * reconstruction error bounded by (mx−mn)/255 per dimension.
    *
    * Scale shape: the stats pass is one shuffle keyed by dimension
    * index (64 keys, partial agg first) producing a 64-row table that
    * broadcasts back onto the stream — the corpus quantizes in the
    * scan stage.
    *
    * Oracle determinism: min/max are exact float comparisons; the
    * quantization expression is evaluated in IEEE double with the same
    * operand order in both engines ((x−mn)·255 then ÷(mx−mn)), and
    * floor of identical doubles is identical — no transcendentals, no
    * accumulation order.
    */
  val qEmbQuantize: Q = Q.sql(
    "q_emb_quantize",
    """WITH e AS (
      |  SELECT vec_id, CAST(i AS INT) - 1 AS dim,
      |    embedding[CAST(i AS INT)] AS x
      |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
      |  WHERE len(list_filter(embedding, v -> NOT isfinite(v))) = 0),
      |st AS (
      |  SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY dim)
      |SELECT e.vec_id, e.dim,
      |  CASE WHEN st.mx = st.mn THEN CAST(0 AS BIGINT)
      |       ELSE CAST(least(255.0, floor(
      |         (CAST(e.x AS DOUBLE) - CAST(st.mn AS DOUBLE)) * 255.0
      |           / (CAST(st.mx AS DOUBLE) - CAST(st.mn AS DOUBLE)))) AS BIGINT)
      |  END AS code
      |FROM e JOIN st USING (dim)
      |ORDER BY vec_id ASC, dim ASC""".stripMargin) { (s, d) =>
    val exploded = Tables.embeddings(s, d)
      .filter(graft.functions.IvfFunctions.finiteVec(col("embedding")))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
    exploded.join(broadcast(dimStats(Tables.embeddings(s, d))), "dim")
      .select(col("vec_id"), col("dim"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(255.0), floor(
            (col("x").cast(DoubleType) - col("mn").cast(DoubleType)) * 255.0
              / (col("mx").cast(DoubleType) - col("mn").cast(DoubleType))))
            .cast(LongType))
          .as("code"))
      .orderBy(col("vec_id").asc, col("dim").asc)
  }

  /** ANN over the int8-quantized index (asymmetric distance: float
    * queries against dequantized bucket-midpoint corpus vectors) —
    * what a memory-resident quantized index actually retrieves. The
    * quantize→dequantize round trip happens per element inside one
    * `transform` over the scan (no code table materialized, no extra
    * shuffle); the per-dim (mn, bucket-width) vectors are a 64-scalar
    * driver collect, the same size class as the shard-pack bucket sums.
    *
    * HASH-VERIFIED with a pure-SQL oracle (no aux table): the per-dim
    * stats are MIN/MAX (exact float comparisons DuckDB re-derives),
    * and the dequantization replays the engine's exact operand order
    * and types — (x−mn) in FLOAT, widened to DOUBLE for ·255/rng,
    * floor, midpoint reconstruction in DOUBLE, final round-to-FLOAT —
    * so dequantized vectors and cosine scores are bit-identical.
    * AnnRecallSpec still measures recall@10 against the exact
    * brute-force path.
    */
  val qAnnQuantized: Q = Q.sql(
    "q_ann_quantized",
    s"""WITH e AS (
       |  SELECT vec_id, CAST(i AS INT) AS dim1,
       |    embedding[CAST(i AS INT)] AS x
       |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
       |  WHERE len(list_filter(embedding, v -> NOT isfinite(v))) = 0),
       |st AS (
       |  SELECT dim1, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY dim1),
       |st2 AS (
       |  SELECT dim1, mn,
       |    CASE WHEN mx > mn THEN mx - mn ELSE CAST(1.0 AS REAL) END AS rng
       |  FROM st),
       |deq AS (
       |  SELECT e.vec_id, e.dim1,
       |    CAST(CAST(st2.mn AS DOUBLE)
       |      + (floor(least(255.0,
       |           CAST(e.x - st2.mn AS DOUBLE) * 255.0
       |             / CAST(st2.rng AS DOUBLE))) + 0.5)
       |        * CAST(st2.rng AS DOUBLE) / 255.0 AS REAL) AS xh
       |  FROM e JOIN st2 USING (dim1)),
       |corpus AS (
       |  SELECT vec_id, list(xh ORDER BY dim1 ASC) AS xhat
       |  FROM deq GROUP BY vec_id),
       |scored AS (
       |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
       |    ${oracleCosine("q.embedding", "v.xhat")} AS score
       |  FROM embeddings q JOIN corpus v ON q.vec_id <> v.vec_id
       |  WHERE q.vec_id < $nQueries),
       |ranked AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, score
       |FROM ranked WHERE rank <= $topK
       |ORDER BY query_id ASC, rank ASC""".stripMargin) { (s, d) =>
    graft.expressions.CosineSimilarity.ensureRegistered(s)
    val emb = Tables.embeddings(s, d)
    val stats = dimStats(emb)
      .collect().map(r => (r.getInt(0), r.getFloat(1), r.getFloat(2)))
      .sortBy(_._1)
    val mnArr = stats.map(_._2)
    val rangeArr = stats.map { case (_, mn, mx) => if (mx > mn) mx - mn else 1.0f }
    val mnCol = array(mnArr.map(lit(_)).toIndexedSeq: _*)
    val rangeCol = array(rangeArr.map(lit(_)).toIndexedSeq: _*)
    val dequant = transform(col("embedding"), (x, i) => {
      val mn = element_at(mnCol, i + 1)
      val range = element_at(rangeCol, i + 1)
      val code = floor(least(lit(255.0), (x - mn) * 255.0 / range))
      (mn + (code + 0.5) * range / 255.0).cast(FloatType)
    })
    val corpus = emb.filter(graft.functions.IvfFunctions.finiteVec(col("embedding")))
      .select(col("vec_id"), dequant.as("xhat"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        fastCosine(col("q_emb"), col("xhat")).as("score"))
    topKPerQuery(scored)
  }

  // -------------------------------------------------------------------
  // SemDeDup — semantic deduplication via k-means + within-cluster
  // cosine (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  // web-scale through semantic deduplication")
  // -------------------------------------------------------------------

  /** SemDeDup over any (vec_id, embedding) frame: cluster with the IVF
    * coarse quantizer, then inside each cluster drop every vector that
    * has cosine > `tau` with an earlier-ranked cluster member — rank is
    * (distance to centroid DESC, vec_id ASC), the paper's
    * keep-the-example-farthest-from-the-centroid rule. Matches the
    * released pseudo-code: the pairwise test is against ALL
    * earlier-ranked members (upper-triangular max-sim), not just
    * surviving ones, which is what makes every drop decision
    * independent and the whole pass two joins instead of a sequential
    * greedy sweep.
    *
    * Scale shape: this is the point of SemDeDup — clustering first cuts
    * the pair space from O(N²) to O(Σ s_c²); k grows with the corpus so
    * cluster sizes stay bounded (the paper runs k=50k on LAION), the
    * pair join is an equi-join on the int cluster id, and the drop set
    * is an anti-join. Centroids ride a TorrentBroadcast.
    */
  def semDedup(emb: DataFrame, k: Int, tau: Double, seed: Long = 42): DataFrame =
    semDedupWith(emb,
      graft.functions.IvfFunctions.trainCentroids(emb, "embedding", k, seed), tau)

  /** [[semDedup]] with a pre-trained centroid table (see
    * [[graft.functions.IvfFunctions.annTopKWith]] for why: the catalog
    * entry materializes exactly these centroids for the oracle replay).
    */
  def semDedupWith(emb: DataFrame, centroidRows: Array[Array[Double]],
                   tau: Double): DataFrame = {
    import graft.functions.IvfFunctions
    graft.expressions.CosineSimilarity.ensureRegistered(emb.sparkSession)
    val centroids = IvfFunctions.broadcastCentroids(emb, centroidRows)
    val assigned = emb
      .withColumn("__a", IvfFunctions.assignWithDistUdf(centroids)(col("embedding")))
      .select(col("vec_id"), col("embedding"),
        col("__a._1").as("cid"), col("__a._2").as("cdist"))
    val ranked = assigned
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cid"))
          .orderBy(col("cdist").desc, col("vec_id").asc)))
      // checkpoint, not cache: the self-join reads both sides from the
      // materialized blocks, nothing registers in the CacheManager, and
      // the ContextCleaner frees the blocks once the caller drops the
      // result (the old .cache() was never unpersisted — round-4 watch
      // item)
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val dropped = ranked.as("a")
      .join(ranked.as("b"),
        col("a.cid") === col("b.cid") && col("a.rk") < col("b.rk"))
      .filter(fastCosine(col("a.embedding"), col("b.embedding")) > tau)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    ranked.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cid"))
      .orderBy(col("vec_id").asc)
  }

  private val semDedupTau = 0.95

  /** Catalog entry: SemDeDup survivors over the embeddings table.
    * HASH-VERIFIED via the materialized-centroid replay: DuckDB
    * re-runs assignment (argmin L2), the farthest-from-centroid
    * ranking, the upper-triangular within-cluster cosine test, and
    * the anti-join, all from the engine-written centroid parquet.
    * SemDedupSpec remains the kernel ground truth — planted duplicate
    * groups collapse to exactly one survivor, isolated vectors all
    * survive.
    */
  val qEmbSemDedup: Q = Q.sql(
    "q_emb_semdedup",
    s"""${centroidDistCte(semdedupAuxDir)},
       |assigned AS (
       |  SELECT vec_id, cid, d AS cdist FROM (
       |    SELECT vec_id, cid, d,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM dist) WHERE rn = 1),
       |ranked AS (
       |  SELECT a.vec_id, a.cid, e.embedding,
       |    ROW_NUMBER() OVER (PARTITION BY a.cid
       |      ORDER BY a.cdist DESC, a.vec_id ASC) AS rk
       |  FROM assigned a JOIN embeddings e USING (vec_id)),
       |dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM ranked a JOIN ranked b ON a.cid = b.cid AND a.rk < b.rk
       |  WHERE ${oracleCosine("a.embedding", "b.embedding")} > $semDedupTau)
       |SELECT vec_id, cid FROM ranked
       |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
       |ORDER BY vec_id ASC""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    semDedupWith(emb, corpusCentroids(s, d, emb), semDedupTau)
  }.preparedBy(prepareCentroids(semdedupAuxDir))

  /** SemDeDup with LSH-bucketed within-cluster candidates — the shape
    * that survives cluster growth past the adaptive-k cap. Exact
    * SemDeDup's pair join is O(s_c²) per cluster, which is fine while
    * k ≈ N/125 keeps s_c bounded, but the k cap (65536, the centroid-
    * broadcast bound) binds at ~8M vectors and beyond it clusters grow
    * with the corpus again. Here a within-cluster pair is a candidate
    * only if it ALSO collides in one of 8 × 8-plane hyperplane bands —
    * the pair space becomes O(Σ bucket²) over (cid, band-key) buckets,
    * and near-dup-sized buckets stay near-dup-sized at any cluster
    * size. Approximate by construction: a cosine-0.95 pair collides in
    * ≥1 band with p ≈ 0.99 ((1−(1−(1−θ/π)^8)^8 at θ=arccos 0.95), and
    * EXACT duplicates collide in every band, so planted-group collapse
    * is loss-free (SemDedupSpec proves bucketed == exact on planted
    * fixtures). The exact q_emb_semdedup remains the gate sibling.
    */
  def semDedupLshWith(emb: DataFrame, centroidRows: Array[Array[Double]],
                      tau: Double, keyed: DataFrame): DataFrame = {
    import graft.functions.IvfFunctions
    graft.expressions.CosineSimilarity.ensureRegistered(emb.sparkSession)
    val centroids = IvfFunctions.broadcastCentroids(emb, centroidRows)
    val ranked = emb
      .withColumn("__a", IvfFunctions.assignWithDistUdf(centroids)(col("embedding")))
      .select(col("vec_id"),
        col("__a._1").as("cid"), col("__a._2").as("cdist"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cid"))
          .orderBy(col("cdist").desc, col("vec_id").asc)))
      .select(col("vec_id"), col("cid"), col("rk"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    // keys-only candidate join on (cid, band key); embeddings re-join
    // once per deduped pair for the exact rerank
    val rkeys = ranked.join(keyed, "vec_id")
    val cand = rkeys.as("a")
      .join(rkeys.as("b"),
        col("a.cid") === col("b.cid") && col("a.bk") === col("b.bk") &&
          col("a.rk") < col("b.rk"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .dropDuplicates("va", "vb")
    val vecs = emb.select(col("vec_id"), col("embedding"))
    val dropped = cand
      .join(vecs.select(col("vec_id").as("va"), col("embedding").as("ea")), Seq("va"))
      .join(vecs.select(col("vec_id").as("vb"), col("embedding").as("eb")), Seq("vb"))
      .filter(fastCosine(col("ea"), col("eb")) > tau)
      .select(col("vb").as("vec_id"))
      .distinct()
    ranked.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cid"))
      .orderBy(col("vec_id").asc)
  }

  /** Catalog entry: bucketed SemDeDup survivors. HASH-VERIFIED by
    * replaying BOTH materialized kernels — the semdedup centroid table
    * (assignment + farthest-from-centroid ranking) and the 8×8 band-key
    * table q_embedding_neardup_lsh also uses (candidate generation) —
    * DuckDB re-runs the (cid, bk) candidate join, the exact-cosine
    * rerank, and the anti-join.
    */
  val qEmbSemDedupLsh: Q = Q.sql(
    "q_emb_semdedup_lsh",
    s"""${centroidDistCte(semdedupAuxDir)},
       |assigned AS (
       |  SELECT vec_id, cid, d AS cdist FROM (
       |    SELECT vec_id, cid, d,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM dist) WHERE rn = 1),
       |ranked AS (
       |  SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY cid
       |      ORDER BY cdist DESC, vec_id ASC) AS rk
       |  FROM assigned),
       |keyed AS (
       |  SELECT vec_id, bk FROM read_parquet('$neardupLshAuxDir/*/*.parquet')
       |  WHERE corpus_key = (SELECT SUM(vec_id) FROM embeddings)),
       |rkeys AS (
       |  SELECT r.vec_id, r.cid, r.rk, k.bk FROM ranked r JOIN keyed k USING (vec_id)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
       |  FROM rkeys a JOIN rkeys b
       |    ON a.cid = b.cid AND a.bk = b.bk AND a.rk < b.rk),
       |dropped AS (
       |  SELECT DISTINCT c.vb AS vec_id
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.va
       |  JOIN embeddings eb ON eb.vec_id = c.vb
       |  WHERE ${oracleCosine("ea.embedding", "eb.embedding")} > $semDedupTau)
       |SELECT vec_id, cid FROM ranked
       |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
       |ORDER BY vec_id ASC""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    semDedupLshWith(emb, corpusCentroids(s, d, emb),
      semDedupTau, neardupBandKeys(s, d))
  }.preparedBy { (s, d) =>
    prepareCentroids(semdedupAuxDir)(s, d)
    prepareNeardupKeys(s, d)
  }

  // -------------------------------------------------------------------
  // Product-quantized ANN (Jégou et al. 2011) — the 32× memory lever
  // -------------------------------------------------------------------

  private[graft] val pqAuxDir = s"${OracleAux.root}/pq_codebooks"
  private val pqCandidates = 64

  /** Memoized raw-vector PQ codebooks; PURE — the oracle-replay
    * publish is the q_ann_pq prepare hook.
    */
  private def pqCodebooks(s: org.apache.spark.sql.SparkSession, d: String,
                          emb: DataFrame): Array[Array[Array[Double]]] =
    SharedFrames.value(s, s"pq_codebooks:$d") {
      graft.functions.PqFunctions.trainCodebooks(emb, "embedding")
    }

  /** Materialize (sub, code, c: array<double>, corpus_key) — m×k rows. */
  private def writePqCodebooks(emb: DataFrame,
                               cb: Array[Array[Array[Double]]],
                               dir: String = pqAuxDir): Unit = {
    val s = emb.sparkSession
    import s.implicits._
    val key = corpusKey(emb)
    cb.zipWithIndex.flatMap { case (codes, j) =>
      codes.zipWithIndex.map { case (c, i) => (j, i, c.toSeq, key) }
    }.toSeq.toDF("sub", "code", "c", "corpus_key")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/k$key")
  }

  /** PQ-indexed ANN: per-subspace codebooks (8 × 16 codes) compress
    * each 256 B float32 vector to 8 B of codes; the ADC scan ranks the
    * WHOLE corpus reading codes only, and the top-[[pqCandidates]] cut
    * reranks with exact cosine. This is the resident-index answer at
    * 100 TB: the scan reads 32× fewer bytes than the raw embeddings
    * and never shuffles them — only (query_id, neighbor_id) survive
    * the cut.
    *
    * HASH-VERIFIED: the engine materializes its trained codebook table
    * (OracleAux) and DuckDB replays encoding (per-subspace argmin,
    * distance ASC / code ASC), the per-query ADC tables, the
    * j-ascending ADC fold, the candidate cut (adc ASC, vec_id ASC),
    * and the exact-cosine rerank — every fold in the same fixed operand
    * order as the Scala loops, so distances are bit-identical. PqSpec
    * grades recall against q_ann_bruteforce and pins the encode/ADC
    * kernels on planted data.
    */
  val qAnnPq: Q = Q.sql(
    "q_ann_pq",
    s"""WITH cb AS (
       |  SELECT sub, code, c FROM read_parquet('$pqAuxDir/*/*.parquet')
       |  WHERE corpus_key = (SELECT SUM(vec_id) FROM embeddings)),
       |encd AS (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT e.vec_id, cb.sub, cb.code,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.sub ORDER BY
       |        list_reduce(list_transform(range(1, 9),
       |          i -> (CAST(e.embedding[cb.sub * 8 + i] AS DOUBLE) - cb.c[i])
       |             * (CAST(e.embedding[cb.sub * 8 + i] AS DOUBLE) - cb.c[i])),
       |          (x, y) -> x + y) ASC, cb.code ASC) AS rn
       |    FROM embeddings e CROSS JOIN cb) WHERE rn = 1),
       |codes AS (
       |  SELECT vec_id, list(code ORDER BY sub ASC) AS cs FROM encd GROUP BY vec_id),
       |qd AS (
       |  SELECT q.vec_id AS query_id, cb.sub, cb.code,
       |    list_reduce(list_transform(range(1, 9),
       |      i -> (CAST(q.embedding[cb.sub * 8 + i] AS DOUBLE) - cb.c[i])
       |         * (CAST(q.embedding[cb.sub * 8 + i] AS DOUBLE) - cb.c[i])),
       |      (x, y) -> x + y) AS dist
       |  FROM embeddings q CROSS JOIN cb WHERE q.vec_id < $nQueries),
       |qtab AS (
       |  SELECT query_id, list(dl ORDER BY sub ASC) AS tabs FROM (
       |    SELECT query_id, sub, list(dist ORDER BY code ASC) AS dl
       |    FROM qd GROUP BY query_id, sub) GROUP BY query_id),
       |adc AS (
       |  SELECT t.query_id, c.vec_id AS neighbor_id,
       |    list_reduce(list_transform(range(1, 9),
       |      j -> t.tabs[j][c.cs[j] + 1]), (x, y) -> x + y) AS adc
       |  FROM codes c CROSS JOIN qtab t WHERE c.vec_id <> t.query_id),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY adc ASC, neighbor_id ASC) AS crank
       |    FROM adc) WHERE crank <= $pqCandidates),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${oracleCosine("qe.embedding", "ve.embedding")} AS score
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ve ON ve.vec_id = c.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, score
       |FROM ranked WHERE rank <= $topK
       |ORDER BY query_id ASC, rank ASC""".stripMargin) { (s, d) =>
    import graft.functions.PqFunctions
    graft.expressions.CosineSimilarity.ensureRegistered(s)
    val emb = Tables.embeddings(s, d)
    val cb = pqCodebooks(s, d, emb)
    // memoized checkpoint: one encode pass per session per corpus
    val codes = SharedFrames.frame(s, s"pq_codes:$d") {
      val bcCb = PqFunctions.broadcastCodebooks(emb, cb)
      emb.select(col("vec_id"),
        PqFunctions.encodeUdf(bcCb)(col("embedding")).as("cs"))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }
    val qs = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val bcTabs = s.sparkContext.broadcast(
      qs.map { case (id, v) => id -> PqFunctions.adcTables(v, cb) }.toMap)
    import s.implicits._
    val queryIds = qs.map(_._1).toSeq.toDF("query_id")
    val cand = codes.crossJoin(broadcast(queryIds))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("adc",
        PqFunctions.adcUdf(bcTabs)(col("query_id"), col("cs")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adc").asc, col("vec_id").asc)))
      .filter(col("crank") <= pqCandidates)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val vecs = emb.select(col("vec_id"), col("embedding"))
    val scored = cand
      .join(vecs.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
        Seq("query_id"))
      .join(vecs.select(col("vec_id").as("neighbor_id"), col("embedding")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        fastCosine(col("q_emb"), col("embedding")).as("score"))
    topKPerQuery(scored)
  }.preparedBy { (s, d) =>
    OracleAux.prepareOnce(s, pqAuxDir, d) {
      val emb = Tables.embeddings(s, d)
      writePqCodebooks(emb, pqCodebooks(s, d, emb))
    }
  }

  // -------------------------------------------------------------------
  // IVF-PQ (the FAISS IndexIVFPQ composition) — coarse quantizer +
  // product-quantized RESIDUALS + per-list ADC scan
  // -------------------------------------------------------------------

  private[graft] val ivfpqCbAuxDir = s"${OracleAux.root}/ivfpq_codebooks"

  /** Memoized (vec_id, cid, r) assign + residual pass — one per
    * session per corpus, shared by the codebook trainer and the
    * encode pass.
    */
  private def ivfpqResidFrame(s: org.apache.spark.sql.SparkSession,
                              d: String): DataFrame = {
    import graft.functions.IvfFunctions
    val emb = Tables.embeddings(s, d)
    val bcC = IvfFunctions.broadcastCentroids(emb, corpusCentroids(s, d, emb))
    SharedFrames.frame(s, s"ivfpq_resid:$d") {
      emb.withColumn("cid", IvfFunctions.assignUdf(bcC)(col("embedding")))
        .withColumn("r", IvfFunctions.residualUdf(bcC)(col("embedding"), col("cid")))
        .select(col("vec_id"), col("cid"), col("r"))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }
  }

  /** Memoized residual PQ codebooks; PURE — the oracle-replay publish
    * is the q_ann_ivfpq prepare hook.
    */
  private def ivfpqCodebooks(s: org.apache.spark.sql.SparkSession,
                             d: String): Array[Array[Array[Double]]] =
    SharedFrames.value(s, s"ivfpq_codebooks:$d") {
      graft.functions.PqFunctions.trainCodebooks(ivfpqResidFrame(s, d), "r")
    }

  /** The shared IVF-PQ oracle: replayed centroids + residual
    * codebooks → assignment, residual encode, per-probed-list ADC
    * tables, the j-ascending ADC fold, candidate cut, exact rerank.
    * Used verbatim by q_ann_ivfpq (in-session) AND
    * q_ann_ivfpq_persistent (materialized coded index): both engine
    * paths are deterministic functions of the same two replayed
    * kernel tables.
    */
  private def ivfpqAnnOracleSql: String =
    ivfpqAnnOracleSqlFor(s"vec_id < $nQueries")

  /** [[ivfpqAnnOracleSql]] parametrized over the query-set predicate —
    * the corpus-batch twin (q_ann_ivfpq_batch) replays the identical
    * kernels over a modulo-cut query set that SCALES with the corpus.
    */
  private def ivfpqAnnOracleSqlFor(queryPred: String): String =
    s"""${centroidDistCte(ivfAuxDir)},
       |assigned AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM dist) WHERE rn = 1),
       |resid AS (
       |  SELECT e.vec_id, a.cid,
       |    list_transform(range(1, 65),
       |      i -> CAST(CAST(e.embedding[i] AS DOUBLE) - ct.c[i] AS FLOAT)) AS r
       |  FROM embeddings e
       |  JOIN assigned a ON a.vec_id = e.vec_id
       |  JOIN cents ct ON ct.cid = a.cid),
       |cb AS (
       |  SELECT sub, code, c FROM read_parquet('$ivfpqCbAuxDir/*/*.parquet')
       |  WHERE corpus_key = (SELECT SUM(vec_id) FROM embeddings)),
       |encd AS (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT r.vec_id, cb.sub, cb.code,
       |      ROW_NUMBER() OVER (PARTITION BY r.vec_id, cb.sub ORDER BY
       |        list_reduce(list_transform(range(1, 9),
       |          i -> (CAST(r.r[cb.sub * 8 + i] AS DOUBLE) - cb.c[i])
       |             * (CAST(r.r[cb.sub * 8 + i] AS DOUBLE) - cb.c[i])),
       |          (x, y) -> x + y) ASC, cb.code ASC) AS rn
       |    FROM resid r CROSS JOIN cb) WHERE rn = 1),
       |lists AS (
       |  SELECT e.vec_id, a.cid, e.cs FROM (
       |    SELECT vec_id, list(code ORDER BY sub ASC) AS cs
       |    FROM encd GROUP BY vec_id) e
       |  JOIN assigned a ON a.vec_id = e.vec_id),
       |probed AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM dist WHERE $queryPred) WHERE rn <= $ivfNProbe),
       |qresid AS (
       |  SELECT p.query_id, p.cid,
       |    list_transform(range(1, 65),
       |      i -> CAST(CAST(q.embedding[i] AS DOUBLE) - ct.c[i] AS FLOAT)) AS qr
       |  FROM probed p
       |  JOIN embeddings q ON q.vec_id = p.query_id
       |  JOIN cents ct ON ct.cid = p.cid),
       |qd AS (
       |  SELECT qr.query_id, qr.cid, cb.sub, cb.code,
       |    list_reduce(list_transform(range(1, 9),
       |      i -> (CAST(qr.qr[cb.sub * 8 + i] AS DOUBLE) - cb.c[i])
       |         * (CAST(qr.qr[cb.sub * 8 + i] AS DOUBLE) - cb.c[i])),
       |      (x, y) -> x + y) AS dist
       |  FROM qresid qr CROSS JOIN cb),
       |qtab AS (
       |  SELECT query_id, cid, list(dl ORDER BY sub ASC) AS tabs FROM (
       |    SELECT query_id, cid, sub, list(dist ORDER BY code ASC) AS dl
       |    FROM qd GROUP BY query_id, cid, sub) GROUP BY query_id, cid),
       |adc AS (
       |  SELECT t.query_id, l.vec_id AS neighbor_id,
       |    list_reduce(list_transform(range(1, 9),
       |      j -> t.tabs[j][l.cs[j] + 1]), (x, y) -> x + y) AS adc
       |  FROM lists l JOIN qtab t ON t.cid = l.cid
       |  WHERE l.vec_id <> t.query_id),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY adc ASC, neighbor_id ASC) AS crank
       |    FROM adc) WHERE crank <= $pqCandidates),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${oracleCosine("qe.embedding", "ve.embedding")} AS score
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ve ON ve.vec_id = c.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, score
       |FROM ranked WHERE rank <= $topK
       |ORDER BY query_id ASC, rank ASC""".stripMargin

  /** IVF-PQ ANN — the composition every production vector index ships
    * (FAISS IndexIVFPQ, Jégou 2011 §IV): the coarse k-means quantizer
    * partitions the corpus into inverted lists (same memoized centroid
    * table as q_ann_ivf), each vector stores only the PQ codes of its
    * RESIDUAL x − c(x) (residual energy ≪ vector energy, so the same
    * 8 B of codes quantize far finer than raw-vector PQ), and a query
    * scans only its nProbe probed lists with a PER-LIST ADC table
    * (the query residual differs per probed centroid). Exact-cosine
    * rerank of the top-candidates cut, as in the other ANN paths.
    *
    * At 100 TB this is THE resident shape: lists partition the index
    * (probe = partition pruning), the scan reads 8 B codes instead of
    * 256 B floats, and nothing but (query, neighbor) pairs survives.
    *
    * HASH-VERIFIED by double replay: the engine materializes BOTH
    * trained kernels (coarse centroids → ivf_centroids aux, shared
    * with q_ann_ivf; residual codebooks → ivfpq_codebooks aux) and
    * DuckDB replays assignment, float residuals (one double subtract +
    * one float rounding per element), per-subspace argmin encode, the
    * per-(query, list) ADC tables, the j-ascending fold, candidate
    * cut, and exact rerank — all fixed-order arithmetic.
    */
  val qAnnIvfPq: Q = Q.sql(
    "q_ann_ivfpq",
    ivfpqAnnOracleSql) { (s, d) =>
    import graft.functions.{IvfFunctions, PqFunctions}
    graft.expressions.CosineSimilarity.ensureRegistered(s)
    val emb = Tables.embeddings(s, d)
    val centroids = corpusCentroids(s, d, emb)
    val bcC = IvfFunctions.broadcastCentroids(emb, centroids)
    val resid = ivfpqResidFrame(s, d)
    val cb = ivfpqCodebooks(s, d)
    val bcCb = PqFunctions.broadcastCodebooks(emb, cb)
    val lists = SharedFrames.frame(s, s"ivfpq_codes:$d") {
      resid.select(col("vec_id"), col("cid"),
        PqFunctions.encodeUdf(bcCb)(col("r")).as("cs"))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }
    val queries = emb.filter(col("vec_id") < nQueries)
    // probed (query, list) pairs via the SAME probe kernel as q_ann_ivf,
    // then per-pair ADC tables on the query residual (driver-scale:
    // nQueries × nProbe entries)
    val probedPairs = queries.select(col("vec_id").as("query_id"),
        explode(IvfFunctions.probeUdf(bcC, ivfNProbe)(col("embedding"))).as("cid"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val qVecs = queries.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def qResidual(q: Array[Float], cid: Int): Array[Float] = {
      val c = centroids(cid)
      Array.tabulate(q.length)(i => (q(i).toDouble - c(i)).toFloat)
    }
    val bcTabs = s.sparkContext.broadcast(
      probedPairs.map { case (qid, cid) =>
        (qid, cid) -> PqFunctions.adcTables(qResidual(qVecs(qid), cid), cb)
      }.toMap)
    import s.implicits._
    val probedDf = probedPairs.toSeq.toDF("query_id", "cid")
    val cand = lists.join(broadcast(probedDf), Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("adc",
        PqFunctions.adcByListUdf(bcTabs)(col("query_id"), col("cid"), col("cs")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adc").asc, col("vec_id").asc)))
      .filter(col("crank") <= pqCandidates)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val vecs = emb.select(col("vec_id"), col("embedding"))
    val scored = cand
      .join(vecs.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
        Seq("query_id"))
      .join(vecs.select(col("vec_id").as("neighbor_id"), col("embedding")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        fastCosine(col("q_emb"), col("embedding")).as("score"))
    topKPerQuery(scored)
  }.preparedBy { (s, d) =>
    prepareCentroids(ivfAuxDir)(s, d)
    OracleAux.prepareOnce(s, ivfpqCbAuxDir, d) {
      writePqCodebooks(Tables.embeddings(s, d), ivfpqCodebooks(s, d),
        ivfpqCbAuxDir)
    }
  }

  /** Build-once memo for the PERSISTENT coded IVF-PQ index — the
    * [[persistentIvfTable]] pattern over THREE tables (coded lists,
    * centroids, residual codebooks), name keyed by the corpus
    * fingerprint, reuse-don't-rebuild when the tables already resolve.
    */
  private def persistentIvfPqTable(s: org.apache.spark.sql.SparkSession,
                                   d: String): String =
    SharedFrames.value(s, s"vector_index_pq_table:$d") {
      val emb = Tables.embeddings(s, d)
      val table = s"graft_vecidx_pq_${corpusKey(emb)}"
      val parts = Seq("", "_centroids", "_codebooks").map(table + _)
      // same stale-reuse guard as [[persistentIvfTable]] (r14): the
      // build-time content signature must match the current corpus —
      // complete and one hash-scan, vs retraining both quantizers
      // every session only to compare their sample-bounded kernels
      val staleOrAbsent = !parts.forall(s.catalog.tableExists) || {
        parts.foreach(s.catalog.refreshTable)
        !graft.sink.VectorIndex.signatureMatches(s, table, emb)
      }
      if (staleOrAbsent) graft.sink.VectorIndex.buildCoded(emb, table,
        corpusCentroids(s, d, emb), ivfpqCodebooks(s, d))
      table
    }

  /** PERSISTENT CODED-INDEX ANN — the [[qAnnIvfPersistent]] idea at
    * the layout a 100 TB deployment actually keeps resident: the
    * materialized inverted lists hold 8 PQ codes per vector (32 B of
    * list row, not a 256 B float vector), next to the centroid and
    * codebook tables ([[graft.sink.VectorIndex.buildCoded]]). The
    * timed query is the pure search path: load the two kernel tables,
    * probe, ADC-scan ONLY the probed buckets reading codes only, cut
    * to [[pqCandidates]] per query, and fetch just the survivors'
    * float vectors from the corpus store for the exact-cosine rerank —
    * no training, no corpus assignment, no full-width corpus scan.
    * appendCoded grows it batch-over-batch without retraining either
    * quantizer (VectorIndexSpec pins grown == same-kernel rebuild).
    * Same oracle as q_ann_ivfpq: both paths are deterministic
    * functions of the same two replayed kernel tables.
    */
  val qAnnIvfPqPersistent: Q = Q.sql(
    "q_ann_ivfpq_persistent",
    ivfpqAnnOracleSql,
    doc = "ORACLE REPLAY: engine-published centroid + codebook tables; " +
      "DuckDB replays assignment, residual encode, per-list ADC, " +
      "candidate cut, and exact rerank — the engine side answers from " +
      "the materialized coded VectorIndex, never retraining.") { (s, d) =>
    val table = persistentIvfPqTable(s, d)
    val emb = Tables.embeddings(s, d)
    graft.sink.VectorIndex.searchCoded(s, table,
      emb.filter(col("vec_id") < nQueries), emb,
      nProbe = ivfNProbe, pqCandidates = pqCandidates, topK = topK)
  }.preparedBy { (s, d) =>
    prepareCentroids(ivfAuxDir)(s, d)
    OracleAux.prepareOnce(s, ivfpqCbAuxDir, d) {
      writePqCodebooks(Tables.embeddings(s, d), ivfpqCodebooks(s, d),
        ivfpqCbAuxDir)
    }
    persistentIvfPqTable(s, d)
    ()
  }

  /** CORPUS-BATCH retrieval over the persistent coded index — the
    * kNN-graph-over-index shape a 100 TB deployment actually runs
    * (r13 verdict #2): the query set is a deterministic modulo cut of
    * the CORPUS (vec_id % 16 = 0 — 1/16th of every scale factor, so
    * the batch grows with the data and could never collect to a
    * driver), searched against the same materialized IVF-PQ tables as
    * [[qAnnIvfPqPersistent]]. Executor-side ADC
    * ([[graft.functions.PqFunctions.adcTableUdf]]) computes each
    * (query, probed-list) table inside the scan from the broadcast
    * kernels; `broadcastProbe = false` leaves the candidate join
    * unhinted, so a genuinely large probe side shuffles TO the index's
    * bucket layout (the index itself still never re-hashes) while AQE
    * may broadcast a runtime-small one. Scale shape: with adaptive k ∝
    * corpus, list length stays ~constant, so candidate pairs grow
    * LINEARLY with the corpus — the 10× probe pins it.
    */
  val qAnnIvfPqBatch: Q = Q.sql(
    "q_ann_ivfpq_batch",
    ivfpqAnnOracleSqlFor("vec_id % 16 = 0"),
    doc = "ORACLE REPLAY: same centroid + codebook replay as " +
      "q_ann_ivfpq, over the corpus-scaled modulo-cut query batch — " +
      "the engine side answers from the materialized coded index with " +
      "executor-side ADC, never collecting the query set.") { (s, d) =>
    val table = persistentIvfPqTable(s, d)
    val emb = Tables.embeddings(s, d)
    graft.sink.VectorIndex.searchCoded(s, table,
      emb.filter(col("vec_id") % 16 === 0), emb,
      nProbe = ivfNProbe, pqCandidates = pqCandidates, topK = topK,
      broadcastProbe = false)
  }.preparedBy { (s, d) =>
    prepareCentroids(ivfAuxDir)(s, d)
    OracleAux.prepareOnce(s, ivfpqCbAuxDir, d) {
      writePqCodebooks(Tables.embeddings(s, d), ivfpqCodebooks(s, d),
        ivfpqCbAuxDir)
    }
    persistentIvfPqTable(s, d)
    ()
  }

  private[graft] val pcaAuxDir = s"${OracleAux.root}/pca_model"

  /** Memoized PCA fit; PURE — [[preparePca]] publishes one row per
    * kept component (axis, duplicated mean, eigenvalue, trace), all
    * DOUBLE — binary64 round-trips parquet exactly, so DuckDB replays
    * the projection arithmetic bit-identically (same pattern as the
    * IVF centroid and PQ codebook replays).
    */
  private def pcaModel(s: org.apache.spark.sql.SparkSession,
                       d: String): graft.functions.Pca.Model =
    SharedFrames.value(s, s"pca_model:$d") {
      graft.functions.Pca.fit(Tables.embeddings(s, d))
    }

  /** Prepare hook shared by q_emb_pca and q_emb_outliers. */
  private def preparePca(s: org.apache.spark.sql.SparkSession,
                         d: String): Unit =
    OracleAux.prepareOnce(s, pcaAuxDir, d) {
      val emb = Tables.embeddings(s, d)
      val m = pcaModel(s, d)
      import s.implicits._
      val df = m.components.zipWithIndex.map { case (w, i) =>
        (i, w.toSeq, m.mean.toSeq, m.eigenvalues(i), m.totalVariance)
      }.toSeq.toDF("comp", "w", "mu", "eigval", "total_var")
      OracleAux.write(df, pcaAuxDir, corpusKey(emb))
    }

  /** Distributed PCA projection + whitening ([[graft.functions.Pca]]):
    * each vector's coordinate along the top-8 principal axes of the
    * corpus covariance, and the variance-normalized (whitened) form —
    * the standard preprocessing for embedding dedup/clustering (e.g.
    * SemDeDup §3 normalizes embeddings before clustering) and the
    * diagnostic projection for corpus visualization.
    *
    * ORACLE REPLAY: the model publishes as DOUBLE arrays; coord is an
    * order-pinned left fold over i of (x_i − μ_i)·w_i — engine
    * `aggregate(..., 0D, +)` vs DuckDB `list_reduce(list_prepend(0.0,
    * …))` fold the identical operand sequence, so coords (and the
    * IEEE sqrt/divide whitening) are bit-identical.
    *
    * Scale shape: fitting is one mapPartitions pass (33 KB partials)
    * + a driver-side 64×64 eigensolve; the projection broadcasts the
    * 8-row model and fuses into the scan — no shuffle except the
    * final presentation sort.
    */
  val qEmbPca: Q = Q.sql(
    "q_emb_pca",
    s"""WITH m AS (
       |  SELECT comp, w, mu, eigval
       |  FROM read_parquet('$pcaAuxDir/*/*.parquet')
       |  WHERE corpus_key = (SELECT SUM(vec_id) FROM embeddings)),
       |proj AS (
       |  SELECT e.vec_id, m.comp, m.eigval,
       |    list_reduce(list_prepend(0.0, list_transform(range(1, 65),
       |        i -> (CAST(e.embedding[i] AS DOUBLE) - m.mu[i]) * m.w[i])),
       |      (x, y) -> x + y) AS coord
       |  FROM embeddings e CROSS JOIN m)
       |SELECT vec_id, comp, coord,
       |  CASE WHEN sqrt(eigval) = 0 THEN NULL
       |       ELSE coord / sqrt(eigval) END AS whitened
       |FROM proj
       |ORDER BY vec_id ASC, comp ASC""".stripMargin) { (s, d) =>
    val m = pcaModel(s, d)
    import s.implicits._
    val model = m.components.zipWithIndex.map { case (w, i) =>
      (i, w.toSeq, m.mean.toSeq, m.eigenvalues(i))
    }.toSeq.toDF("comp", "w", "mu", "eigval")
    Tables.embeddings(s, d)
      .crossJoin(broadcast(model))
      .withColumn("coord", expr(
        """aggregate(
          |  transform(sequence(0, 63),
          |    i -> (CAST(embedding[i] AS DOUBLE) - mu[i]) * w[i]),
          |  0D, (acc, x) -> acc + x)""".stripMargin))
      .select(col("vec_id"), col("comp"), col("coord"),
        when(sqrt(col("eigval")) === 0.0, lit(null).cast(DoubleType))
          .otherwise(col("coord") / sqrt(col("eigval"))).as("whitened"))
      .orderBy(col("vec_id").asc, col("comp").asc)
  }.preparedBy(preparePca)

  /** Embedding OUTLIER detection via the fitted PCA model: each
    * vector's Mahalanobis-style score Σ_c whitened_c² over the top-8
    * axes (χ²₈-distributed under a Gaussian corpus) ranks how far it
    * sits from the corpus distribution — the triage list for corrupt
    * embeddings, mislabeled modalities, and off-distribution content
    * before they poison dedup/clustering. Top-100 by (score desc,
    * vec_id asc).
    *
    * ORACLE REPLAY: the whitened coords replay exactly as in
    * [[qEmbPca]]; the per-vector score is an order-pinned fold over
    * comp (engine: foldLeft over the 8 squared terms from lit(0.0);
    * DuckDB: list_reduce over list(wh² ORDER BY comp) prepended with
    * 0.0) — bit-identical, and both engines NULL the degenerate
    * zero-eigenvalue case.
    *
    * Scale shape: the model rides as literals — the whole score
    * computes IN THE SCAN with no join and no shuffle; top-100 lowers
    * to TakeOrderedAndProject.
    */
  val qEmbOutliers: Q = Q.sql(
    "q_emb_outliers",
    s"""WITH m AS (
       |  SELECT comp, w, mu, eigval
       |  FROM read_parquet('$pcaAuxDir/*/*.parquet')
       |  WHERE corpus_key = (SELECT SUM(vec_id) FROM embeddings)),
       |proj AS (
       |  SELECT e.vec_id, e.label, m.comp,
       |    CASE WHEN sqrt(m.eigval) = 0 THEN NULL ELSE
       |      list_reduce(list_prepend(0.0, list_transform(range(1, 65),
       |          i -> (CAST(e.embedding[i] AS DOUBLE) - m.mu[i]) * m.w[i])),
       |        (x, y) -> x + y) / sqrt(m.eigval)
       |    END AS wh
       |  FROM embeddings e CROSS JOIN m),
       |score AS (
       |  SELECT vec_id, label,
       |    list_reduce(list_prepend(0.0, list(wh * wh ORDER BY comp ASC)),
       |      (x, y) -> x + y) AS score
       |  FROM proj GROUP BY vec_id, label)
       |SELECT vec_id, label, score FROM score
       |ORDER BY score DESC, vec_id ASC LIMIT 100""".stripMargin) { (s, d) =>
    val m = pcaModel(s, d)
    val muLit = typedLit(m.mean.toSeq)
    val terms = (0 until graft.functions.Pca.kComponents).map { c =>
      val wLit = typedLit(m.components(c).toSeq)
      val coord = aggregate(
        transform(sequence(lit(0), lit(63)), i =>
          (element_at(col("embedding"), i + 1).cast(DoubleType) -
            element_at(muLit, i + 1)) * element_at(wLit, i + 1)),
        lit(0.0), (acc, x) => acc + x)
      val rootEig = math.sqrt(m.eigenvalues(c))
      val wh =
        if (rootEig == 0.0) lit(null).cast(DoubleType)
        else coord / lit(rootEig)
      wh * wh
    }
    val score = terms.foldLeft(lit(0.0))(_ + _)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), score.as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(100)
  }.preparedBy(preparePca)

  /** One label-propagation round in DuckDB SQL — mirror of the Spark
    * loop body in [[qLabelProp]]: clamped seeds, majority vote over
    * kNN out-neighbors, ties to the smallest label.
    */
  private def lpRoundSql(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT n.vec_id, COALESCE(n.seed, m.maj) AS lab
       |  FROM nodes n LEFT JOIN (
       |    SELECT vec_id, nl AS maj FROM (
       |      SELECT e.vec_id, p.lab AS nl,
       |        row_number() OVER (PARTITION BY e.vec_id
       |          ORDER BY COUNT(*) DESC, p.lab ASC) AS rn
       |      FROM edges e JOIN $prev p ON e.neighbor_id = p.vec_id
       |      WHERE p.lab IS NOT NULL
       |      GROUP BY e.vec_id, p.lab)
       |    WHERE rn = 1) m ON n.vec_id = m.vec_id)""".stripMargin

  /** SEMI-SUPERVISED LABEL PROPAGATION over the kNN graph (Zhu &
    * Ghahramani 2002, clamped-seed majority form): a fifth of the
    * labels are masked (vec_id ≡ 0 mod 5 — the deterministic stand-in
    * for "unlabeled data"), then three rounds of majority vote over
    * each node's kNN out-neighbors fill them back in; seeds stay
    * clamped. The true label rides along, so the result IS the
    * accuracy audit: how well does graph structure recover labels
    * you already know — the go/no-go before trusting propagation to
    * label genuinely new data. Votes are integer counts with ties to
    * the smallest label; no floats anywhere.
    *
    * Scale shape: rides the memoized anchor-bounded kNN edge table
    * (zero candidate-generation work); each round is one keys-only
    * join + count + an anchor-partitioned argmax window over the
    * ≤ knnK·n edge stream — labels move, embeddings never do.
    */
  val qLabelProp: Q = Q.sql(
    "q_emb_label_prop",
    s"""WITH $knnRankedCte,
       |edges AS (
       |  SELECT vec_id, neighbor_id FROM ranked WHERE rank <= $knnK),
       |nodes AS (
       |  SELECT vec_id, label,
       |    CASE WHEN vec_id % 5 <> 0 THEN label END AS seed
       |  FROM embeddings),
       |lp0 AS (SELECT vec_id, seed AS lab FROM nodes),
       |${lpRoundSql("lp0", "lp1")},
       |${lpRoundSql("lp1", "lp2")},
       |${lpRoundSql("lp2", "lp3")}
       |SELECT n.vec_id, n.vec_id % 5 <> 0 AS is_seed,
       |  n.label AS true_label, l.lab AS propagated_label
       |FROM nodes n JOIN lp3 l ON n.vec_id = l.vec_id
       |ORDER BY n.vec_id ASC""".stripMargin) { (s, d) =>
    val edges = knnGraphFrame(s, d)
      .select(col("vec_id"), col("neighbor_id"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val nodes = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        when(col("vec_id") % 5 =!= 0, col("label")).as("seed"))
    var lab = nodes.select(col("vec_id"), col("seed").as("lab"))
    for (_ <- 1 to 3) {
      val wv = Window.partitionBy(col("vec_id"))
        .orderBy(col("c").desc, col("nl").asc)
      val maj = edges
        .join(lab.select(col("vec_id").as("neighbor_id"), col("lab").as("nl")),
          Seq("neighbor_id"))
        .filter(col("nl").isNotNull)
        .groupBy("vec_id", "nl").agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(wv))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("nl").as("maj"))
      lab = nodes.select(col("vec_id"), col("seed"))
        .join(maj, Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("seed"), col("maj")).as("lab"))
    }
    nodes.join(lab, "vec_id")
      .select(col("vec_id"), (col("vec_id") % 5 =!= 0).as("is_seed"),
        col("label").as("true_label"), col("lab").as("propagated_label"))
      .orderBy(col("vec_id").asc)
  }.preparedBy(prepareAnnLshKeys)

  /** CLASS SEPARATION AUDIT — per-label compactness vs nearest-class
    * distance in the int8 CODE space the quantized index actually
    * serves: intra = mean squared code-distance to the label's rounded
    * code-centroid, inter = squared distance to the nearest OTHER
    * class centroid. A label whose nearest_d2 dips under its intra_msd
    * is confusable at retrieval time — the triage that decides whether
    * a labeled slice needs re-embedding or re-labeling before it feeds
    * hard-negative mining. Code space keeps every sum an exact
    * integer (codes 0..255, centroids rounded with (2S+n) div (2n)),
    * so the aggregation is accumulation-order-independent and the
    * DuckDB replay is bit-identical — no aux table, no libm.
    *
    * Scale shape: one posexplode scan joined to the broadcast 64-row
    * dim stats; centroid table is |labels|·64 rows (broadcast back);
    * intra partials map-side combine to |labels| rows; the centroid
    * pairwise join is |labels|²·64 — label cardinality, not corpus.
    */
  val qClassSeparation: Q = Q.sql(
    "q_emb_class_separation",
    """WITH fe AS (
      |  SELECT * FROM embeddings
      |  WHERE len(list_filter(embedding, v -> NOT isfinite(v))) = 0),
      |e AS (
      |  SELECT vec_id, label, CAST(i AS INT) - 1 AS dim,
      |    embedding[CAST(i AS INT)] AS x
      |  FROM fe CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t),
      |st AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY dim),
      |codes AS (
      |  SELECT e.vec_id, e.label, e.dim,
      |    CASE WHEN st.mx = st.mn THEN CAST(0 AS BIGINT)
      |         ELSE CAST(least(255.0, floor(
      |           (CAST(e.x AS DOUBLE) - CAST(st.mn AS DOUBLE)) * 255.0
      |             / (CAST(st.mx AS DOUBLE) - CAST(st.mn AS DOUBLE)))) AS BIGINT)
      |    END AS code
      |  FROM e JOIN st USING (dim)),
      |cent AS (
      |  SELECT label, dim,
      |    (2 * SUM(code) + COUNT(*)) // (2 * COUNT(*)) AS crd
      |  FROM codes GROUP BY label, dim),
      |sizes AS (SELECT label, COUNT(*) AS n FROM fe GROUP BY label),
      |intra AS (
      |  SELECT c.label, SUM((c.code - ct.crd) * (c.code - ct.crd)) AS d2
      |  FROM codes c JOIN cent ct ON c.label = ct.label AND c.dim = ct.dim
      |  GROUP BY c.label),
      |inter AS (
      |  SELECT a.label, b.label AS other_label,
      |    SUM((a.crd - b.crd) * (a.crd - b.crd)) AS cd2
      |  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label <> b.label
      |  GROUP BY a.label, b.label),
      |nearest AS (
      |  SELECT label, other_label, cd2,
      |    ROW_NUMBER() OVER (PARTITION BY label
      |      ORDER BY cd2 ASC, other_label ASC) AS rk
      |  FROM inter)
      |SELECT s.label AS label, CAST(s.n AS BIGINT) AS n,
      |  CAST(i.d2 AS DOUBLE) / s.n AS intra_msd,
      |  nr.other_label AS nearest_label, CAST(nr.cd2 AS BIGINT) AS nearest_d2
      |FROM sizes s
      |JOIN intra i ON s.label = i.label
      |JOIN nearest nr ON s.label = nr.label AND nr.rk = 1
      |ORDER BY s.label ASC""".stripMargin) { (s, d) =>
    // class separation over the QUANTIZED (all-finite) corpus — the
    // same index domain as q_emb_quantize (dimStats filters the same
    // way; a NaN/Inf vector has no code and belongs to no class here)
    val emb = Tables.embeddings(s, d)
      .filter(graft.functions.IvfFunctions.finiteVec(col("embedding")))
    val codes = emb
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .join(broadcast(dimStats(emb)), "dim")
      .select(col("label"), col("dim"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(255.0), floor(
            (col("x").cast(DoubleType) - col("mn").cast(DoubleType)) * 255.0
              / (col("mx").cast(DoubleType) - col("mn").cast(DoubleType))))
            .cast(LongType))
          .as("code"))
    val cent = codes.groupBy("label", "dim")
      .agg(expr("(2 * sum(code) + count(*)) div (2 * count(*))").as("crd"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val sizes = emb.groupBy("label").agg(count(lit(1)).as("n"))
    val intra = codes.join(broadcast(cent), Seq("label", "dim"))
      .select(col("label"),
        ((col("code") - col("crd")) * (col("code") - col("crd"))).as("sq"))
      .groupBy("label").agg(sum("sq").as("d2"))
    // every post-centroid table is |labels|-sized; the checkpointed
    // frames carry no stats, so hint the broadcasts explicitly
    val inter = cent.as("a")
      .join(broadcast(cent.as("b")),
        col("a.dim") === col("b.dim") && col("a.label") =!= col("b.label"))
      .groupBy(col("a.label").as("label"), col("b.label").as("other_label"))
      .agg(sum((col("a.crd") - col("b.crd")) * (col("a.crd") - col("b.crd")))
        .as("cd2"))
    val wN = Window.partitionBy(col("label"))
      .orderBy(col("cd2").asc, col("other_label").asc)
    val nearest = inter.withColumn("rk", row_number().over(wN))
      .filter(col("rk") === 1)
    sizes.join(broadcast(intra), "label").join(broadcast(nearest), "label")
      .select(col("label"), col("n"),
        (col("d2").cast(DoubleType) / col("n")).as("intra_msd"),
        col("other_label").as("nearest_label"), col("cd2").as("nearest_d2"))
      .orderBy(col("label").asc)
  }

  /** LOCAL CLUSTERING COEFFICIENT over the kNN graph — per-vector
    * triangle count, degree, and Watts-Strogatz coefficient
    * 2T/(d(d-1)) on the undirected edge set. This is the manifold-
    * density audit a curation pipeline reads before trusting
    * graph-based ops: high-coefficient regions are tight semantic
    * clumps (SemDeDup/topic clustering will behave), low-coefficient
    * high-degree nodes are hubs stitching unrelated regions together
    * (the failure mode that merges topics and poisons label
    * propagation — exactly the nodes this query surfaces).
    *
    * Scale shape: rides the memoized ranked-edge table (zero extra
    * candidate/rerank work per session); the undirected edge set is
    * anchor-bounded (≤ knnK out-edges per node), so the triangle
    * enumeration — e1(x,y) ⋈ e2(y,z) on the shared middle node, then
    * a (x,z) edge-existence semi-check — is Σ_y deg(y)² pairs, the
    * per-node-degree analogue of the LSH bucket² bound. The known
    * hazard is the in-degree hub (a vector in many nodes' top-5); its
    * pair growth is quadratic in that one node's degree, and the
    * audit's own output is where such hubs become visible. ORACLE
    * REPLAY: DuckDB replays kNN ranking from the band keys, then the
    * identical normalize/join/count chain — all-integer graph ops,
    * with the coefficient one IEEE divide of exact operands.
    */
  val qEmbKnnTriangles: Q = Q.sql(
    "q_emb_knn_triangles",
    s"""WITH $knnRankedCte,
       |knn AS (
       |  SELECT vec_id, neighbor_id FROM ranked WHERE rank <= $knnK),
       |und AS (
       |  SELECT DISTINCT LEAST(vec_id, neighbor_id) AS a,
       |    GREATEST(vec_id, neighbor_id) AS b
       |  FROM knn),
       |tri AS (
       |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM und e1
       |  JOIN und e2 ON e2.a = e1.b
       |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
       |pernode AS (
       |  SELECT x AS node FROM tri
       |  UNION ALL SELECT y FROM tri
       |  UNION ALL SELECT z FROM tri),
       |tcount AS (SELECT node, COUNT(*) AS triangles FROM pernode GROUP BY node),
       |deg AS (
       |  SELECT node, COUNT(*) AS degree FROM (
       |    SELECT a AS node FROM und UNION ALL SELECT b FROM und)
       |  GROUP BY node)
       |SELECT d.node AS vec_id, d.degree,
       |  COALESCE(t.triangles, 0) AS triangles,
       |  CASE WHEN d.degree >= 2
       |    THEN CAST(2 * COALESCE(t.triangles, 0) AS DOUBLE)
       |      / (d.degree * (d.degree - 1))
       |    ELSE 0e0 END AS clustering_coeff
       |FROM deg d LEFT JOIN tcount t ON t.node = d.node
       |ORDER BY vec_id ASC""".stripMargin) { (s, d) =>
    val knn = knnGraphFrame(s, d).select(col("vec_id"), col("neighbor_id"))
    val und = knn.select(
        least(col("vec_id"), col("neighbor_id")).as("a"),
        greatest(col("vec_id"), col("neighbor_id")).as("b"))
      .distinct()
    val tri = und.select(col("a").as("x"), col("b").as("y"))
      .join(und.select(col("a").as("y"), col("b").as("z")), Seq("y"))
      .join(und.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
    val pernode = tri.select(col("x").as("node"))
      .unionAll(tri.select(col("y").as("node")))
      .unionAll(tri.select(col("z").as("node")))
    val tcount = pernode.groupBy("node").agg(count(lit(1)).as("triangles"))
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val t = coalesce(col("triangles"), lit(0L))
    deg.join(tcount, Seq("node"), "left")
      .select(col("node").as("vec_id"), col("degree"), t.as("triangles"),
        when(col("degree") >= 2,
          (lit(2L) * t).cast(DoubleType) /
            (col("degree") * (col("degree") - lit(1L))).cast(DoubleType))
          .otherwise(lit(0.0)).as("clustering_coeff"))
      .orderBy(col("vec_id").asc)
  }.preparedBy(prepareAnnLshKeys)

  /** ANN RECALL CURVE — the evaluation operator for the retrieval
    * family as a first-class query: recall@k (k ∈ 1, 5, 10) of the
    * LSH and IVF arms against the brute-force ground truth over the
    * benchmark query set, as a (method × k) decision table. The
    * recall each approximation buys is THE number that picks an
    * index; AnnRecallSpec measures it as a test bound, this query
    * publishes it as data (and the DuckDB oracle replays all three
    * retrieval paths end-to-end, so even the evaluation itself is
    * hash-verified).
    *
    * Determinism: all three arms share the exact-cosine rerank with
    * (score desc, id asc) tie-break, so top-k sets are identical
    * across engines; matches are integer counts and each recall is
    * one IEEE divide.
    *
    * Scale shape: the arms reuse the catalog queries' own plans
    * (broadcast query side, banded/probed candidates); the
    * evaluation joins are top-k-sized (queries × k rows).
    */
  val qAnnRecall: Q = Q.sql(
    "q_emb_ann_recall",
    s"""${centroidDistCte(ivfAuxDir)},
       |bfs AS (
       |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
       |    ${oracleCosine("q.embedding", "v.embedding")} AS score
       |  FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
       |  WHERE q.vec_id < $nQueries),
       |bfr AS (
       |  SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id ASC) AS bf_rank
       |  FROM bfs),
       |bf AS (SELECT query_id, neighbor_id, bf_rank FROM bfr
       |  WHERE bf_rank <= $topK),
       |keyed AS (
       |  SELECT vec_id, bk FROM read_parquet('$annLshAuxDir/*/*.parquet')
       |  WHERE corpus_key = (SELECT SUM(vec_id) FROM embeddings)),
       |lcand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, v.vec_id AS neighbor_id
       |  FROM keyed q JOIN keyed v ON q.bk = v.bk
       |  WHERE q.vec_id < $nQueries AND v.vec_id <> q.vec_id),
       |lsc AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${oracleCosine("qe.embedding", "ve.embedding")} AS score
       |  FROM lcand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ve ON ve.vec_id = c.neighbor_id),
       |lr AS (
       |  SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id ASC) AS rank
       |  FROM lsc),
       |larm AS (SELECT 'lsh' AS method, query_id, neighbor_id, rank
       |  FROM lr WHERE rank <= $topK),
       |assigned AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM dist) WHERE rn = 1),
       |probed AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM dist WHERE vec_id < $nQueries) WHERE rn <= $ivfNProbe),
       |icand AS (
       |  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
       |  FROM probed p JOIN assigned a ON p.cid = a.cid
       |  WHERE a.vec_id <> p.query_id),
       |isc AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${oracleCosine("q2.embedding", "v2.embedding")} AS score
       |  FROM icand c
       |  JOIN embeddings q2 ON q2.vec_id = c.query_id
       |  JOIN embeddings v2 ON v2.vec_id = c.neighbor_id),
       |ir AS (
       |  SELECT query_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, neighbor_id ASC) AS rank
       |  FROM isc),
       |iarm AS (SELECT 'ivf' AS method, query_id, neighbor_id, rank
       |  FROM ir WHERE rank <= $topK),
       |arms AS (SELECT * FROM larm UNION ALL SELECT * FROM iarm),
       |nq AS (SELECT COUNT(DISTINCT query_id) AS n FROM bf),
       |ks AS (SELECT UNNEST([1, 5, 10]) AS k),
       |methods AS (SELECT UNNEST(['ivf', 'lsh']) AS method),
       |hits AS (
       |  SELECT a.method, ks.k, COUNT(*) AS n_matched
       |  FROM arms a
       |  JOIN bf b ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
       |  CROSS JOIN ks
       |  WHERE a.rank <= ks.k AND b.bf_rank <= ks.k
       |  GROUP BY 1, 2)
       |SELECT m.method, CAST(ks.k AS INT) AS k,
       |  CAST(nq.n AS BIGINT) AS n_queries,
       |  CAST(COALESCE(h.n_matched, 0) AS BIGINT) AS n_matched,
       |  CAST(COALESCE(h.n_matched, 0) AS DOUBLE) / (ks.k * nq.n) AS mean_recall
       |FROM methods m CROSS JOIN ks CROSS JOIN nq
       |LEFT JOIN hits h ON h.method = m.method AND h.k = ks.k
       |ORDER BY m.method ASC, ks.k ASC""".stripMargin) { (s, d) =>
    val bf = qAnnBruteForce.fn(s, d)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("bf_rank"))
    val arms = Seq("ivf" -> qAnnIvf.fn(s, d), "lsh" -> qAnnLsh.fn(s, d))
      .map { case (m, df) =>
        df.select(lit(m).as("method"), col("query_id"), col("neighbor_id"),
          col("rank"))
      }.reduce(_ unionByName _)
    import s.implicits._
    val ks = Seq(1, 5, 10).toDF("k")
    val nq = bf.select("query_id").distinct().count()
    val hits = arms.join(bf, Seq("query_id", "neighbor_id"))
      .crossJoin(broadcast(ks))
      .filter(col("rank") <= col("k") && col("bf_rank") <= col("k"))
      .groupBy("method", "k").agg(count(lit(1)).as("n_matched"))
    Seq("ivf", "lsh").toDF("method").crossJoin(ks)
      .join(hits, Seq("method", "k"), "left")
      .select(col("method"), col("k"), lit(nq).as("n_queries"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        (coalesce(col("n_matched"), lit(0L)).cast(DoubleType)
          / (col("k") * lit(nq)).cast(DoubleType)).as("mean_recall"))
      .orderBy(col("method").asc, col("k").asc)
  }.preparedBy { (s, d) =>
    prepareAnnLshKeys(s, d)
    prepareCentroids(ivfAuxDir)(s, d)
  }

  /** IVF nprobe FRONTIER — the tuning table behind the q_ann_ivf
    * configuration: recall@[[topK]] and mean scanned-corpus fraction
    * for EVERY nprobe in 1..[[ivfNProbe]], from ONE probe pass. The
    * trick making the sweep free: with an exact-cosine rerank, a true
    * top-k neighbor that enters the candidate set always survives to
    * the reported top-k (every candidate outscoring it is itself a
    * true top-k vector of lower rank), so recall@k at probe depth p is
    * exactly the fraction of true top-k edges whose neighbor's
    * assigned centroid sits at probe rank ≤ p — no per-p rerank, just
    * a GROUP BY over probe ranks. Scan fraction is the probed lists'
    * size sum over (n_queries × corpus); both metrics are exact
    * integer ratios (one IEEE divide each).
    *
    * Scale shape: one assignment pass (broadcast centroids into the
    * scan), one nq-row probe ranking, the brute-force ground truth
    * (the allow-listed broadcast idiom, nq = [[nQueries]] anchors),
    * then joins over nq×k rows. The frontier the operator prints is
    * the one number an index deployment tunes first.
    */
  val qIvfFrontier: Q = Q.sql(
    "q_emb_ivf_frontier",
    s"""${centroidDistCte(ivfAuxDir)},
       |assigned AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM dist) WHERE rn = 1),
       |sizes AS (SELECT cid, COUNT(*) AS sz FROM assigned GROUP BY cid),
       |probed AS (
       |  SELECT vec_id AS query_id, cid, rn AS prank FROM (
       |    SELECT vec_id, cid,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
       |    FROM dist WHERE vec_id < $nQueries) WHERE rn <= $ivfNProbe),
       |bfs AS (
       |  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
       |    ${oracleCosine("q.embedding", "v.embedding")} AS score
       |  FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
       |  WHERE q.vec_id < $nQueries),
       |bf AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, neighbor_id ASC) AS bf_rank
       |    FROM bfs) WHERE bf_rank <= $topK),
       |cov AS (
       |  SELECT b.query_id, p.prank
       |  FROM bf b
       |  JOIN assigned a ON a.vec_id = b.neighbor_id
       |  LEFT JOIN probed p ON p.query_id = b.query_id AND p.cid = a.cid),
       |ps AS (SELECT UNNEST(range(1, ${ivfNProbe + 1})) AS nprobe),
       |hits AS (
       |  SELECT ps.nprobe, COUNT(*) AS n_matched
       |  FROM cov CROSS JOIN ps WHERE cov.prank <= ps.nprobe
       |  GROUP BY 1),
       |scans AS (
       |  SELECT ps.nprobe, SUM(s.sz) AS scanned
       |  FROM probed p JOIN sizes s ON p.cid = s.cid
       |  CROSS JOIN ps WHERE p.prank <= ps.nprobe
       |  GROUP BY 1),
       |nq AS (SELECT COUNT(*) AS n FROM embeddings WHERE vec_id < $nQueries),
       |nv AS (SELECT COUNT(*) AS n FROM embeddings)
       |SELECT CAST(ps.nprobe AS INT) AS nprobe,
       |  CAST(nq.n AS BIGINT) AS n_queries,
       |  CAST(COALESCE(h.n_matched, 0) AS BIGINT) AS n_matched,
       |  CAST(COALESCE(h.n_matched, 0) AS DOUBLE)
       |    / CAST($topK * nq.n AS DOUBLE) AS mean_recall,
       |  CAST(COALESCE(sc.scanned, 0) AS DOUBLE)
       |    / CAST(nq.n * nv.n AS DOUBLE) AS mean_scan_frac
       |FROM ps CROSS JOIN nq CROSS JOIN nv
       |LEFT JOIN hits h ON h.nprobe = ps.nprobe
       |LEFT JOIN scans sc ON sc.nprobe = ps.nprobe
       |ORDER BY nprobe ASC""".stripMargin) { (s, d) =>
    import graft.functions.IvfFunctions
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val centroids = IvfFunctions.broadcastCentroids(emb, corpusCentroids(s, d, emb))
    val assigned = emb.select(col("vec_id"),
      IvfFunctions.assignUdf(centroids)(col("embedding")).as("cid"))
    val sizes = assigned.groupBy("cid").agg(count(lit(1)).as("sz"))
    val probed = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        posexplode(IvfFunctions.probeUdf(centroids, ivfNProbe)(col("embedding")))
          .as(Seq("p0", "cid")))
      .select(col("query_id"), (col("p0") + 1).cast(LongType).as("prank"), col("cid"))
    val bf = qAnnBruteForce.fn(s, d).select(col("query_id"), col("neighbor_id"))
    val cov = bf
      .join(assigned.select(col("vec_id").as("neighbor_id"), col("cid")),
        Seq("neighbor_id"))
      .join(probed, Seq("query_id", "cid"), "left")
    // the 1..nprobe fanout explodes FROM the row (a covered edge at
    // prank p counts toward every depth ≥ p) — a ×nprobe Generate on
    // nq×k-row tables, never a join
    val ps = (1 to ivfNProbe).toDF("nprobe")
    val depths = explode(sequence(col("prank").cast(IntegerType),
      lit(ivfNProbe))).as("nprobe")
    val hits = cov.filter(col("prank").isNotNull)
      .select(depths)
      .groupBy("nprobe").agg(count(lit(1)).as("n_matched"))
    val scans = probed.join(sizes, Seq("cid"))
      .select(col("sz"), depths)
      .groupBy("nprobe").agg(sum("sz").as("scanned"))
    // the totals fold in as broadcast 1-row aggregates (the market-
    // basket idiom): no driver-side action, the whole query stays one
    // lazy plan — PlanDumpMain and the lint can construct it without
    // executing two corpus scans
    val nq = emb.filter(col("vec_id") < nQueries)
      .agg(count(lit(1)).as("nq"))
    val nv = emb.agg(count(lit(1)).as("nv"))
    ps
      .join(hits, Seq("nprobe"), "left")
      .join(scans, Seq("nprobe"), "left")
      .crossJoin(broadcast(nq))
      .crossJoin(broadcast(nv))
      .select(col("nprobe"), col("nq").as("n_queries"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        (coalesce(col("n_matched"), lit(0L)).cast(DoubleType)
          / (lit(topK) * col("nq")).cast(DoubleType)).as("mean_recall"),
        (coalesce(col("scanned"), lit(0L)).cast(DoubleType)
          / (col("nq") * col("nv")).cast(DoubleType)).as("mean_scan_frac"))
      .orderBy(col("nprobe").asc)
  }.preparedBy(prepareCentroids(ivfAuxDir))

  val all: Seq[Q] = Seq(qAnnBruteForce, qAnnLsh, qAnnIvf, qAnnIvfPersistent,
    qEmbeddingNearDup,
    qEmbeddingNearDupLsh, qEmbQuantize, qAnnQuantized, qEmbSemDedup,
    qEmbSemDedupLsh, qAnnPq, qEmbDecontam, qAnnIvfPq, qAnnIvfPqPersistent, qAnnIvfPqBatch,
    qEmbClusterBalance,
    qEmbPca, qEmbOutliers, qEmbKnnGraph, qEmbTopicClusters, qEmbHardNegatives,
    qEmbPrunePrototypes, qClassSeparation, qLabelProp, qEmbKnnTriangles,
    qEmbMatryoshka, qEmbKnnHops, qAnnRecall, qIvfFrontier)
}
