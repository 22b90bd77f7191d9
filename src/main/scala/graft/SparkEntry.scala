package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, BpeQ, EventsQ, GeoQ, JoinsQ, MultimodalQ, OlapQ, PipelineQ, Q, Relational, SimilarityQ, TextQ, TransformQ}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's verifiable query surface: every operator family from
  * SURVEY.md §2 plus the training-data extensions (dedup, similarity,
  * text analysis), each as a (SparkSession, sfDir) => DataFrame with —
  * where ANSI-SQL-expressible — a DuckDB oracle over the same parquet.
  */
object SparkEntry {

  /** The full query catalog. Names must be unique — a collision would
    * silently shadow a query (and its oracle) in the Maps below.
    */
  val catalog: Seq[Q] = {
    val qs = Relational.all ++ Analytics.all ++ EventsQ.all ++ TextQ.all ++
      SimilarityQ.all ++ GeoQ.all ++ TransformQ.all ++ MultimodalQ.all ++ JoinsQ.all ++
      OlapQ.all ++ PipelineQ.all ++ BpeQ.all
    val dups = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (seeded-hash LSH / langid / fingerprints / sketches) → rows-only
    * check, each with a compensating ground-truth spec in
    * src/test/scala/graft: AnnRecallSpec (q_ann_lsh), IvfAnnSpec
    * (q_ann_ivf), MinhashRecallSpec (q_doc_minhash_lsh), SimhashSpec
    * (q_doc_simhash), LangIdSpec (q_doc_langid), FingerprintSpec
    * (q_doc_fingerprint), FingerprintNearDupSpec
    * (q_doc_fingerprint_neardup), SketchSpec (q_events_sketch_stats).
    */
  def oracleSql: Map[String, String] =
    catalog.collect { case q if q.oracle.isDefined => q.name -> q.oracle.get }
      .toMap

  /** Oracle-aux PREPARE hooks (see [[graft.queries.Q.preparedBy]]):
    * per-query side-effecting materializations of the replay artifacts
    * (trained models, signature tables) the DuckDB oracles read back.
    * The harness runs these OUTSIDE the verified/timed path — Verify
    * before dumping a query's result, Bench before its first timing —
    * so every `queries` fn is a pure read. Hooks are memoized per
    * (session, aux dir, corpus): shared artifacts publish once.
    */
  def prepares: Map[String, (SparkSession, String) => Unit] =
    catalog.collect { case q if q.prepare.isDefined => q.name -> q.prepare.get }
      .toMap
}
