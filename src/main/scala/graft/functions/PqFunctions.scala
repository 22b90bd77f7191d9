package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the memory lever that makes a
  * 100 TB-derived vector index RESIDENT: the 64-dim float32 embedding
  * (256 B) compresses to `m` sub-codes (8 B at m=8, k=16 — 32×), and
  * the ADC scan ranks candidates reading codes only.
  *
  *   - TRAIN: an independent k-means codebook per 8-dim subspace
  *     (seeded, sample-bounded — the same trainer the IVF coarse
  *     quantizer uses, so past singleNodeKCap it would train
  *     distributed too; at k=16/subspace it never does).
  *   - ENCODE: per row, argmin code per subspace over the broadcast
  *     codebook table — fuses into the scan, no shuffle.
  *   - SEARCH (ADC, asymmetric distance computation): per query,
  *     precompute the m×k table of squared L2 distances from the
  *     query's subvectors to every code centroid; a candidate's
  *     approximate distance is the j-ascending sum of table[j][code_j]
  *     — codes-only until the final exact-cosine rerank of the top-C
  *     cut.
  *
  * Determinism contract (oracle replay): subvector slicing, the argmin
  * tie-break (distance ASC, code ASC), the per-subspace distance fold
  * (sequential over dims), and the ADC fold (sequential over
  * subspaces, j ascending) are all fixed-order double arithmetic that
  * DuckDB `list_reduce` replays bit-identically from the materialized
  * codebook parquet.
  */
object PqFunctions {

  val numSubspaces = 8
  val subDim = 8
  val codesPerSubspace = 16

  /** Train one codebook per subspace: [m][k][subDim] centroids. The
    * corpus is counted and hash-cut-sampled ONCE (checkpointed), then
    * each subspace fit slices the same sampled frame — not once per
    * fit, which would run 8 redundant full scans.
    */
  def trainCodebooks(emb: DataFrame, embeddingCol: String,
                     seed: Long = 42): Array[Array[Array[Double]]] = {
    val train = IvfFunctions.trainSample(emb, codesPerSubspace, seed)
      .select(col("vec_id"), col(embeddingCol))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    try Array.tabulate(numSubspaces) { j =>
      IvfFunctions.fitKmeans(
        train.select(slice(col(embeddingCol), j * subDim + 1, subDim).as("subvec")),
        "subvec", codesPerSubspace, seed = seed + j)
    } finally train.unpersist()
  }

  def broadcastCodebooks(emb: DataFrame, cb: Array[Array[Array[Double]]])
      : Broadcast[Array[Array[Array[Double]]]] =
    emb.sparkSession.sparkContext.broadcast(cb)

  private def l2sqSub(v: Array[Float], off: Int, c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) {
      val d = v(off + i) - c(i)
      s += d * d
      i += 1
    }
    s
  }

  private def toFloatArray(v: Seq[Float]): Array[Float] =
    IvfFunctions.toFloatArray(v)

  /** PQ encode: the m argmin codes, j ascending (ties → lowest code). */
  def encodeUdf(bc: Broadcast[Array[Array[Array[Double]]]]): UserDefinedFunction =
    udf { v: Seq[Float] =>
      val a = toFloatArray(v)
      val cb = bc.value
      val out = new Array[Int](cb.length)
      var j = 0
      while (j < cb.length) {
        val codes = cb(j)
        var best = 0
        var bestD = Double.MaxValue
        var i = 0
        while (i < codes.length) {
          val d = l2sqSub(a, j * subDim, codes(i))
          if (d < bestD) { bestD = d; best = i }
          i += 1
        }
        out(j) = best
        j += 1
      }
      out.toSeq
    }

  /** Per-query ADC tables: [m][k] squared L2 from the query's
    * subvectors to every code centroid (the same fixed-order fold the
    * encode argmin uses).
    */
  def adcTables(query: Array[Float],
                cb: Array[Array[Array[Double]]]): Array[Array[Double]] =
    Array.tabulate(cb.length) { j =>
      Array.tabulate(cb(j).length)(i => l2sqSub(query, j * subDim, cb(j)(i)))
    }

  /** ADC distance: j-ascending sum of table[j][code_j]. */
  def adcUdf(bc: Broadcast[Map[Long, Array[Array[Double]]]]): UserDefinedFunction =
    udf { (queryId: Long, codes: Seq[Int]) =>
      val tabs = bc.value(queryId)
      var s = 0.0
      var j = 0
      while (j < tabs.length) { s += tabs(j)(codes(j)); j += 1 }
      s
    }

  /** [[adcUdf]] keyed by (query, inverted list): IVF-PQ precomputes one
    * ADC table per PROBED list because the query residual differs per
    * coarse centroid.
    */
  def adcByListUdf(bc: Broadcast[Map[(Long, Int), Array[Array[Double]]]])
      : UserDefinedFunction =
    udf { (queryId: Long, cid: Int, codes: Seq[Int]) =>
      val tabs = bc.value((queryId, cid))
      var s = 0.0
      var j = 0
      while (j < tabs.length) { s += tabs(j)(codes(j)); j += 1 }
      s
    }

  /** Per-(query, probed-list) ADC table computed ON EXECUTORS from the
    * broadcast centroids + codebooks, returned FLATTENED
    * (`[j * k + code]`, j ascending). This lifts the fixed-query-set
    * driver bound (r13 verdict #2): nothing about the query batch ever
    * collects, so a corpus-sized batch (the kNN-graph-over-index
    * retrieval shape) streams through the scan. Bit-identical to the
    * driver-side [[adcTables]]: the residual is the same
    * `(q_i − c_i).toFloat` per element and every table entry is the
    * same [[l2sqSub]] fixed-order fold.
    */
  def adcTableUdf(bcC: Broadcast[Array[Array[Double]]],
                  bcCb: Broadcast[Array[Array[Array[Double]]]])
      : UserDefinedFunction =
    udf { (v: Seq[Float], cid: Int) =>
      val q = toFloatArray(v)
      val c = bcC.value(cid)
      val r = new Array[Float](q.length)
      var i = 0
      while (i < q.length) { r(i) = (q(i).toDouble - c(i)).toFloat; i += 1 }
      val cb = bcCb.value
      val out = new Array[Double](cb.length * codesPerSubspace)
      var j = 0
      while (j < cb.length) {
        var t = 0
        while (t < cb(j).length) {
          out(j * codesPerSubspace + t) = l2sqSub(r, j * subDim, cb(j)(t))
          t += 1
        }
        j += 1
      }
      out.toSeq
    }

  /** j-ascending ADC fold over a [[adcTableUdf]]-flattened table — the
    * executor-side twin of [[adcByListUdf]]: same additions, same
    * order, bit-identical result.
    */
  def adcFlatUdf: UserDefinedFunction =
    udf { (tabs: Seq[Double], codes: Seq[Int]) =>
      var s = 0.0
      var j = 0
      while (j < codes.length) { s += tabs(j * codesPerSubspace + codes(j)); j += 1 }
      s
    }
}
