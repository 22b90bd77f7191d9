package graft

import org.apache.spark.sql.functions._

import graft.functions.Pca

/** Ground truth for the distributed PCA trainer + q_emb_pca.
  *
  * The planted fixture concentrates variance along two known
  * orthogonal axes (σ²≈9 and σ²≈1) with tiny isotropic noise, so the
  * fitted axes, the eigenvalue ordering, and the whitened variances
  * are all checkable against construction.
  */
class PcaSpec extends SparkSpecBase {
  import spark.implicits._

  private val d = Pca.dim

  /** Deterministic planted corpus: x = a·u + b·w + ε, a ~ 3·g1,
    * b ~ 1·g2 (seeded gaussians), ε small uniform noise.
    */
  private lazy val plantedDir: String = {
    val rnd = new java.util.Random(42)
    val u = Array.tabulate(d)(i => if (i == 3) 0.8 else if (i == 17) 0.6 else 0.0)
    val w = Array.tabulate(d)(i => if (i == 3) -0.6 else if (i == 17) 0.8 else 0.0)
    val rows = (0 until 400).map { id =>
      val a = 3.0 * rnd.nextGaussian()
      val b = 1.0 * rnd.nextGaussian()
      val vec = Array.tabulate(d) { i =>
        (a * u(i) + b * w(i) + 0.01 * (rnd.nextDouble() - 0.5)).toFloat
      }
      (id.toLong, vec.toSeq, 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("pca_fix").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("jacobiEigen solves a symmetric matrix: A·v = λ·v, eigensum = trace") {
    val rnd = new java.util.Random(7)
    val n = 6
    val m = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i until n) {
      val x = rnd.nextDouble() * 2 - 1
      m(i)(j) = x; m(j)(i) = x
    }
    val (eig, v) = Pca.jacobiEigen(m)
    assert(math.abs(eig.sum - (0 until n).map(i => m(i)(i)).sum) < 1e-9)
    for (c <- 0 until n) {
      val vec = Array.tabulate(n)(r => v(r)(c))
      val av = Array.tabulate(n)(r => (0 until n).map(k => m(r)(k) * vec(k)).sum)
      val resid = av.zip(vec).map { case (x, y) => x - eig(c) * y }
      assert(math.sqrt(resid.map(r => r * r).sum) < 1e-8,
        s"eigenpair $c residual too large")
    }
  }

  test("fit recovers the planted principal axes in order, components orthonormal") {
    val emb = graft.sources.Tables.embeddings(spark, plantedDir)
    val m = Pca.fit(emb)
    val u = Array.tabulate(d)(i => if (i == 3) 0.8 else if (i == 17) 0.6 else 0.0)
    val w = Array.tabulate(d)(i => if (i == 3) -0.6 else if (i == 17) 0.8 else 0.0)
    assert(math.abs(dot(m.components(0), u)) > 0.99,
      s"PC0 misaligned with planted major axis: ${dot(m.components(0), u)}")
    assert(math.abs(dot(m.components(1), w)) > 0.99,
      s"PC1 misaligned with planted minor axis: ${dot(m.components(1), w)}")
    assert(m.eigenvalues(0) > 4 * m.eigenvalues(1),
      "eigenvalue ordering does not reflect the 9:1 planted variance ratio")
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1)), "eigenvalues not descending")
    for (a <- m.components.indices; b <- a until m.components.length) {
      val expected = if (a == b) 1.0 else 0.0
      assert(math.abs(dot(m.components(a), m.components(b)) - expected) < 1e-9,
        s"components $a,$b not orthonormal")
    }
    // sign convention: largest-|coordinate| entry is positive
    m.components.foreach { c =>
      val best = c.indices.maxBy(i => (math.abs(c(i)), -i))
      assert(c(best) > 0, "sign convention violated")
    }
  }

  test("fit is deterministic within a session") {
    val emb = graft.sources.Tables.embeddings(spark, plantedDir)
    val a = Pca.fit(emb)
    val b = Pca.fit(emb)
    assert(a.mean.sameElements(b.mean))
    assert(a.eigenvalues.sameElements(b.eigenvalues))
    assert(a.components.zip(b.components).forall { case (x, y) => x.sameElements(y) })
  }

  test("q_emb_pca projection matches a local fold; whitened variance ≈ 1 on planted axes") {
    val out = SparkEntry.queries("q_emb_pca")(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val emb = graft.sources.Tables.embeddings(spark, plantedDir)
    val m = Pca.fit(emb)
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    // exact replay of the engine fold (same operand order)
    vecs.take(50).foreach { case (id, v) =>
      for (c <- 0 until Pca.kComponents) {
        var acc = 0.0
        var i = 0
        while (i < d) {
          acc += (v(i).toDouble - m.mean(i)) * m.components(c)(i)
          i += 1
        }
        assert(out((id, c))._1 == acc, s"coord mismatch vec=$id comp=$c")
      }
    }
    // population variance of whitened coords along the two planted axes ≈ 1
    for (c <- 0 to 1) {
      val ws = vecs.indices.map(i => out((vecs(i)._1, c))._2)
      val meanW = ws.sum / ws.size
      val varW = ws.map(x => (x - meanW) * (x - meanW)).sum / ws.size
      assert(math.abs(varW - 1.0) < 1e-6, s"whitened variance off on comp $c: $varW")
    }
  }

  test("q_emb_outliers surfaces a planted far-out vector at rank 1") {
    // amplify one vector far along the planted major axis, rewrite the
    // fixture, and the outlier list must lead with it
    val rnd = new java.util.Random(42)
    val u = Array.tabulate(d)(i => if (i == 3) 0.8 else if (i == 17) 0.6 else 0.0)
    val w = Array.tabulate(d)(i => if (i == 3) -0.6 else if (i == 17) 0.8 else 0.0)
    val rows = (0 until 400).map { id =>
      val a = 3.0 * rnd.nextGaussian()
      val b = 1.0 * rnd.nextGaussian()
      val boost = if (id == 123) 30.0 else 1.0
      val vec = Array.tabulate(d) { i =>
        (boost * a * u(i) + b * w(i) + 0.01 * (rnd.nextDouble() - 0.5)).toFloat
      }
      (id.toLong, vec.toSeq, 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("pca_out_fix").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_emb_outliers")(spark, dir).collect()
    assert(out.length == 100)
    assert(out.head.getLong(0) == 123L,
      s"planted outlier not at rank 1: ${out.take(3).mkString(", ")}")
    assert(out.map(_.getDouble(2)).sliding(2).forall(p => p(0) >= p(1)),
      "scores not descending")
  }

  test("q_emb_pca on the corpus: full coverage, deterministic, k rows per vector") {
    val rows = SparkEntry.queries("q_emb_pca")(spark, sfDir).collect()
    val nVec = graft.sources.Tables.embeddings(spark, sfDir).count()
    assert(rows.length == nVec * Pca.kComponents)
    val again = SparkEntry.queries("q_emb_pca")(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
