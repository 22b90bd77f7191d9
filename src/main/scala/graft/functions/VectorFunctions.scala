package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.types.DoubleType

/** Embedding-vector primitives: cosine similarity, norms, and
  * random-hyperplane LSH for approximate nearest neighbors.
  *
  * The similarity kernels are native Catalyst expressions
  * (zip_with/aggregate) so they stay codegen'd and — crucially for the
  * DuckDB oracle — accumulate left-to-right in IEEE double, which is
  * bit-reproducible across engines for identical inputs.
  */
object VectorFunctions {

  /** Elementwise products in double (each float*float product is exact
    * in double), then a sequential left fold.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe via NULLIF-style guard on zero norms. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    dot(a, b) / when(denom =!= 0.0, denom)
  }

  // ---------------------------------------------------------------------
  // Random-hyperplane LSH (SimHash for vectors; Charikar 2002).
  // `nPlanes` sign bits of projections onto seeded Gaussian hyperplanes
  // form the bucket id. Near vectors collide with high probability;
  // candidate pairs are then exactly reranked.
  // ---------------------------------------------------------------------
  val lshPlanes = 12
  val embeddingDim = 64

  private lazy val planes: Array[Array[Double]] = {
    val rng = new scala.util.Random(7)
    Array.fill(lshPlanes, embeddingDim)(rng.nextGaussian())
  }

  /** LSH bucket id: an Int whose bit i is the sign of <v, plane_i>. */
  val lshBucket: UserDefinedFunction = udf { v: Seq[Float] =>
    var bucket = 0
    var p = 0
    while (p < lshPlanes) {
      var s = 0.0
      val plane = planes(p)
      val n = math.min(v.length, embeddingDim)
      var i = 0
      while (i < n) { s += v(i) * plane(i); i += 1 }
      if (s >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** Multi-probe neighbor buckets: the bucket itself plus all buckets at
    * Hamming distance 1 (flipping one plane's sign) — recovers most
    * near-boundary misses at 13× candidate cost.
    */
  val lshProbeBuckets: UserDefinedFunction = udf { bucket: Int =>
    bucket +: (0 until lshPlanes).map(p => bucket ^ (1 << p))
  }
}
