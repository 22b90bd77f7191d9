package graft.functions

import org.apache.spark.sql.DataFrame

/** Distributed PCA over the embedding corpus (public method: Pearson
  * 1901 principal axes; Jacobi eigenvalue rotation per Golub & Van
  * Loan §8.5 — textbook algorithms, no external libraries).
  *
  * Scale design (100 TB): the only corpus-sized work is ONE
  * `mapPartitions` pass accumulating per-partition Gram/mean partials
  * (d=64 → a 33 KB partial per partition, any executor count), reduced
  * on the driver in PARTITION-INDEX ORDER so the double sums are
  * deterministic for a fixed partitioning — the same contract as the
  * sampled k-means trainer. The 64×64 eigendecomposition is driver-side
  * and corpus-size-independent. The fitted model (8 components + mean,
  * ~4 KB) broadcasts back into the projection scan.
  *
  * Determinism: partials fold in partition order; Jacobi sweeps are
  * cyclic (fixed (p,q) order) with a fixed convergence threshold; the
  * eigen sort is (eigenvalue desc, original index asc); each
  * component's sign is normalized so its largest-|coordinate| entry
  * (ties → lowest index) is positive. Two fits of the same corpus in
  * the same session are bit-identical.
  */
object Pca {

  val dim = 64

  /** Components to keep — enough for the whitening/visualization uses
    * the pipeline has (dedup preprocessing, cluster diagnostics) while
    * keeping the projection output ≤ 8 rows per vector.
    */
  val kComponents = 8

  /** Fitted model: row-major components (kComponents × dim), the mean
    * vector, eigenvalues (variance along each component, descending),
    * and the total variance (trace of the covariance matrix).
    */
  final case class Model(components: Array[Array[Double]],
                         mean: Array[Double],
                         eigenvalues: Array[Double],
                         totalVariance: Double)

  /** One-pass covariance: per-partition Σx and Σxxᵀ (upper triangle)
    * partials, folded on the driver in partition order, then
    * C = E[xxᵀ] − μμᵀ (population covariance — the deterministic
    * divisor; the fixture scale makes the n/n−1 distinction moot and
    * the oracle replays whatever was published).
    */
  private[graft] def covariance(emb: DataFrame): (Array[Array[Double]], Array[Double], Long) = {
    val d = dim
    val partials = emb.select("embedding").rdd
      .mapPartitionsWithIndex { (pi, it) =>
        val s = new Array[Double](d)
        val ss = new Array[Double](d * d)
        var n = 0L
        while (it.hasNext) {
          val seq = it.next().getSeq[Float](0)
          val x = new Array[Double](d)
          var i = 0
          while (i < d) { x(i) = seq(i).toDouble; i += 1 }
          i = 0
          while (i < d) {
            val xi = x(i)
            s(i) += xi
            var j = i
            while (j < d) { ss(i * d + j) += xi * x(j); j += 1 }
            i += 1
          }
          n += 1
        }
        Iterator((pi, n, s, ss))
      }.collect().sortBy(_._1)
    require(partials.exists(_._2 > 0), "empty embedding corpus")
    val s = new Array[Double](d)
    val ss = new Array[Double](d * d)
    var n = 0L
    partials.foreach { case (_, pn, psum, pss) =>
      n += pn
      var i = 0
      while (i < d) { s(i) += psum(i); i += 1 }
      i = 0
      while (i < d * d) { ss(i) += pss(i); i += 1 }
    }
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = ss(i * d + j) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    (cov, mean, n)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: rotate
    * away each off-diagonal (p,q) in fixed row-major order until the
    * off-diagonal Frobenius norm is negligible. Returns (eigenvalues,
    * eigenvectors as columns of V). Deterministic: fixed sweep order,
    * fixed threshold, bounded sweep count.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val maxSweeps = 64
    var sweep = 0
    var converged = false
    while (sweep < maxSweeps && !converged) {
      var off = 0.0
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) { off += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      if (off < 1e-22) converged = true
      else {
        p = 0
        while (p < d) {
          var q = p + 1
          while (q < d) {
            val apq = a(p)(q)
            if (apq != 0.0) {
              val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
              // smaller-angle root, the numerically stable choice
              val t =
                if (theta >= 0) 1.0 / (theta + math.sqrt(1.0 + theta * theta))
                else 1.0 / (theta - math.sqrt(1.0 + theta * theta))
              val c = 1.0 / math.sqrt(1.0 + t * t)
              val s = t * c
              var k = 0
              while (k < d) {
                val akp = a(k)(p); val akq = a(k)(q)
                a(k)(p) = c * akp - s * akq
                a(k)(q) = s * akp + c * akq
                k += 1
              }
              k = 0
              while (k < d) {
                val apk = a(p)(k); val aqk = a(q)(k)
                a(p)(k) = c * apk - s * aqk
                a(q)(k) = s * apk + c * aqk
                k += 1
              }
              k = 0
              while (k < d) {
                val vkp = v(k)(p); val vkq = v(k)(q)
                v(k)(p) = c * vkp - s * vkq
                v(k)(q) = s * vkp + c * vkq
                k += 1
              }
            }
            q += 1
          }
          p += 1
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Fit top-[[kComponents]] principal axes of the embedding corpus. */
  def fit(emb: DataFrame): Model = {
    val (cov, mean, _) = covariance(emb)
    val (eig, vecs) = jacobiEigen(cov)
    val d = dim
    val order = (0 until d).sortBy(i => (-eig(i), i)).take(kComponents)
    val components = order.map { ci =>
      val comp = Array.tabulate(d)(r => vecs(r)(ci))
      // sign convention: the largest-|coordinate| entry (ties → lowest
      // index) is positive, so the published axes are reproducible
      var best = 0
      var i = 1
      while (i < d) { if (math.abs(comp(i)) > math.abs(comp(best))) best = i; i += 1 }
      if (comp(best) < 0) comp.map(x => -x) else comp
    }.toArray
    val trace = (0 until d).map(i => cov(i)(i)).sum
    Model(components, mean, order.map(eig).toArray, trace)
  }
}
