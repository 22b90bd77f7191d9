package graft.queries

/** Fixed filesystem root for ORACLE-REPLAY side tables.
  *
  * Some operators derive small model artifacts from the corpus itself
  * (BPE merge/word-token tables, k-means centroids) that ANSI SQL
  * cannot re-derive. To keep those queries hash-verified instead of
  * rows-only, the engine materializes the artifact to this path and
  * the DuckDB oracle `read_parquet`s it back, replaying the
  * DOWNSTREAM computation (assignment, join, aggregation) exactly —
  * the artifact itself is then pinned by a golden ScalaTest spec.
  *
  * The path must be a compile-time constant because oracle SQL strings
  * are static; every aux table therefore carries a corpus_key column
  * (a content fingerprint the oracle recomputes from the base tables,
  * e.g. SUM(n_chars)) so a stale or concurrent write for a DIFFERENT
  * scale factor can never satisfy the oracle's filter.
  */
object OracleAux {
  val root: String = "/tmp/graft_oracle_aux"

  /** Write an aux table for oracle replay: stamps the corpus_key and
    * lands parquet under `dir/k<key>`. `singleFile` (default) is for
    * model-sized artifacts (centroids, merge tables — driver-scale
    * rows); signature tables are corpus-ROW-sized and must keep their
    * natural partitioning — a coalesce(1) would funnel the whole
    * signature computation through one task (measured 4x on the sf1
    * bench). The oracle's glob read handles either layout.
    */
  def write(df: org.apache.spark.sql.DataFrame, dir: String, key: Long,
            singleFile: Boolean = true): Unit = {
    val keyed = df.withColumn("corpus_key",
      org.apache.spark.sql.functions.lit(key))
    (if (singleFile) keyed.coalesce(1) else keyed)
      .write.mode("overwrite").parquet(s"$dir/k$key")
  }

  /** Once-per-(session, aux dir, corpus) guard for [[graft.queries.Q
    * .prepare]] hooks. Several queries share one artifact (the IVF
    * centroid table serves q_ann_ivf, q_ann_ivfpq, and
    * q_emb_cluster_balance; the band-key tables serve two queries
    * each) — memoizing on the aux DIR rather than the query name means
    * the write happens once no matter which of them prepares first,
    * and a later prepare is a no-op rather than a duplicate overwrite.
    */
  def prepareOnce(s: org.apache.spark.sql.SparkSession, dir: String,
                  d: String)(f: => Unit): Unit = {
    SharedFrames.value(s, s"auxw:$dir:$d") { f; java.lang.Boolean.TRUE }
    ()
  }
}
