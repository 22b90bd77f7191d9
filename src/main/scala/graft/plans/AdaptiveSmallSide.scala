package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Mechanized broadcast↔partitioned switchover for joins whose small
  * side is DERIVED data Catalyst cannot size (a distinct-gram set, an
  * exploded query-term table): AQE sizes leaf relations and
  * post-shuffle stages, but a `broadcast()` hint hard-commits the plan
  * at authoring time — correct at the gate SFs, fatal if the derived
  * side turns out corpus-scale. This module replaces those prose
  * guarantees ("the bench set is tiny relative to any corpus") with a
  * measured choice behind ONE knob:
  *
  *   - [[maxBroadcastRows]] — the single threshold. A small side at or
  *     under it broadcasts (one bounded count() decides); over it the
  *     join runs partitioned (shuffle), and for the decontamination
  *     shape a 1%-FPP bloom pre-filter drops ~99% of the corpus side
  *     in the SCAN stage first, so the shuffle carries survivors, not
  *     the corpus.
  *
  * The count is one extra bounded aggregation per decision; callers on
  * a hot path memoize the joined result (bm25's ranked frame, the
  * curate pipeline), so the probe is paid once per session. Both
  * arms are result-identical by construction — the bloom's false
  * positives die in the exact confirm join — and AdaptiveSmallSideSpec
  * proves it on fixtures by forcing each arm and comparing, with a
  * plan audit per arm.
  */
object AdaptiveSmallSide {

  /** THE knob: max small-side rows eligible for broadcast. ~400k
    * string-keyed rows hash to some tens of MB — the upper end of the
    * sensible autoBroadcast regime on a 1000-executor cluster (each
    * executor materializes the whole relation). Every gate-SF derived
    * side is orders of magnitude below it; a 10^8-row benchmark gram
    * set at real scale is orders above.
    */
  val maxBroadcastRows: Long = 400000L

  /** Equi-join choosing broadcast vs partitioned by measuring the
    * small side once. Results are identical either way — only the
    * physical strategy moves. The small side is checkpointed first
    * (same contract as [[decontamSemi]]): the sizing count and the
    * join must read the SAME rows even if the small side's lineage is
    * non-deterministic, and the join must not re-evaluate the derived
    * subtree the count already paid for.
    */
  def join(big: DataFrame, small: DataFrame, keys: Seq[String],
           joinType: String = "inner",
           maxRows: Long = maxBroadcastRows): DataFrame = {
    val s = small.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    if (s.count() <= maxRows) big.join(broadcast(s), keys, joinType)
    else big.join(s, keys, joinType)
  }

  /** The decontamination handoff: exact broadcast semi-join below the
    * knob; above it (or when `forceBloom` demonstrates the shape on a
    * small fixture) a distributed-built bloom filter (1% FPP) cuts the
    * corpus side in the scan stage and the exact semi-join confirm
    * kills the false positives — broadcast-confirm when the probe set
    * still fits the knob, partitioned-confirm when it doesn't (the
    * 10^8-row regime where broadcasting the probe was the problem).
    * `probe` is internally checkpointed: the count, the bloom build,
    * and the confirm all read it, and nothing may recompute a
    * non-deterministic upstream differently between them.
    */
  def decontamSemi(corpus: DataFrame, probe: DataFrame, key: String,
                   maxRows: Long = maxBroadcastRows,
                   forceBloom: Boolean = false): DataFrame = {
    // key-type contract checked at ENTRY, not when the bloom arm
    // happens to engage: stat.bloomFilter supports string and integral
    // keys, so any other type must fail identically on both arms
    // instead of splitting behavior on the knob
    import org.apache.spark.sql.types.{StringType, LongType, IntegerType}
    val kt = corpus.schema(key).dataType
    require(kt == StringType || kt == LongType || kt == IntegerType,
      s"decontamSemi key '$key' has unsupported type $kt " +
        "(string or int/bigint required — both join arms reject it)")
    require(probe.schema(key).dataType == kt,
      s"decontamSemi key '$key' type mismatch: corpus $kt vs " +
        s"probe ${probe.schema(key).dataType}")
    val bench = probe.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val n = bench.count()
    val fitsBroadcast = n <= maxRows
    if (fitsBroadcast && !forceBloom)
      corpus.join(broadcast(bench), Seq(key), "left_semi")
    else {
      val bloom = bench.stat.bloomFilter(key, math.max(n, 1000L), 0.01)
      val bBloom = corpus.sparkSession.sparkContext.broadcast(bloom)
      val mightContain = kt match {
        case StringType =>
          udf { g: String => g != null && bBloom.value.mightContain(g) }
        case _ =>
          // bloomFilter hashes integral keys as longs; IntegerType
          // upcasts losslessly so one long-typed UDF serves both
          udf { g: java.lang.Long =>
            g != null && bBloom.value.mightContainLong(g.longValue())
          }
      }
      val probeCol =
        if (kt == IntegerType) col(key).cast(LongType) else col(key)
      val cut = corpus.filter(mightContain(probeCol))
      if (fitsBroadcast) cut.join(broadcast(bench), Seq(key), "left_semi")
      else cut.join(bench, Seq(key), "left_semi")
    }
  }
}
