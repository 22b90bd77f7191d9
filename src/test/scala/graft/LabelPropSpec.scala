package graft

/** Ground truth for q_emb_label_prop: an independent driver-side
  * replay of clamped-seed majority propagation over the engine's own
  * kNN edge table must reproduce the query bit-for-bit; seeds stay
  * clamped; masked nodes without labeled reachable neighbors stay
  * NULL.
  */
class LabelPropSpec extends SparkSpecBase {

  test("corpus run equals an independent driver-side replay over the kNN graph") {
    val edges = SparkEntry.queries("q_emb_knn_graph")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nbrs = edges.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSeq }
    val seed: Map[Long, Option[Int]] = labels.map { case (v, l) =>
      v -> (if (v % 5 != 0) Some(l) else None)
    }
    var lab = seed
    for (_ <- 1 to 3) {
      val next = labels.keys.map { v =>
        val maj = nbrs.getOrElse(v, Seq.empty).flatMap(lab(_))
          .groupBy(identity).map { case (l, g) => (l, g.size) }
        val vote =
          if (maj.isEmpty) None
          else Some(maj.toSeq.sortBy { case (l, c) => (-c, l) }.head._1)
        v -> seed(v).orElse(vote)
      }.toMap
      lab = next
    }
    val out = SparkEntry.queries("q_emb_label_prop")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val v = r.getLong(0)
      assert(r.getBoolean(1) == (v % 5 != 0))
      assert(r.getInt(2) == labels(v))
      val got = if (r.isNullAt(3)) None else Some(r.getInt(3))
      assert(got == lab(v), s"vec $v: query=$got replay=${lab(v)}")
    }
    // seeds are clamped to their own label
    out.filter(_.getBoolean(1)).foreach(r => assert(r.getInt(3) == r.getInt(2)))
  }
}
