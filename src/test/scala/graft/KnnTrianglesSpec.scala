package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_emb_knn_triangles: a full driver-side
  * re-derivation from the kNN graph the engine itself reports
  * (normalize, brute-force triangle count, coefficient), a planted
  * clique whose coefficients are known exactly, and the structural
  * bounds every row must satisfy.
  */
class KnnTrianglesSpec extends SparkSpecBase {
  import spark.implicits._

  test("corpus: per-node triangles/degree/coefficient match a brute-force re-derivation") {
    val knn = SparkEntry.queries("q_emb_knn_graph")(spark, sfDir)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = knn.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val adj = (und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).map { case (n, g) => n -> g.map(_._2).toSet }
    val expTri = adj.map { case (n, nbrs) =>
      val ns = nbrs.toSeq
      n -> ns.combinations(2).count {
        case Seq(u, v) => und.contains((math.min(u, v), math.max(u, v)))
      }.toLong
    }
    val out = SparkEntry.queries("q_emb_knn_triangles")(spark, sfDir).collect()
    assert(out.nonEmpty && out.length == adj.size)
    out.foreach { r =>
      val (id, deg, tri, cc) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(deg == adj(id).size.toLong, s"degree of $id")
      assert(tri == expTri(id), s"triangles of $id")
      val expCc = if (deg >= 2) 2.0 * tri / (deg * (deg - 1)) else 0.0
      assert(cc == expCc, s"coefficient of $id")
      assert(cc >= 0.0 && cc <= 1.0)
      assert(tri <= deg * (deg - 1) / 2)
    }
  }

  test("planted clique: three co-directional vectors close a triangle at coefficient 1") {
    val dir = java.nio.file.Files.createTempDirectory("tri_fix").toString
    val e1 = Array.fill(8)(0f); e1(0) = 1f
    val e2 = Array.fill(8)(0f); e2(1) = 1f
    Seq((0L, e1.toSeq, 0), (1L, e1.toSeq, 0), (2L, e1.toSeq, 0),
      (3L, e2.toSeq, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // the memoized band/edge frames key on the corpus dir, so the planted
    // run cannot collide with the sfDir memo
    val out = SparkEntry.queries("q_emb_knn_triangles")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    Seq(0L, 1L, 2L).foreach { id =>
      val (deg, tri, cc) = out(id)
      assert(deg == 2L && tri == 1L && cc == 1.0, s"clique node $id: $deg $tri $cc")
    }
  }
}
