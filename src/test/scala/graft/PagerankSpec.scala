package graft

import org.apache.spark.sql.functions._

import graft.queries.PipelineQ

/** Ground truth for the integer-exact PageRank kernel and
  * q_doc_pagerank's witness-selection semantics: on a planted star the
  * hub out-ranks every spoke, on a symmetric pair ranks are equal, and
  * total mass is conserved up to truncation (damped sums only lose
  * mass to integer division, never gain it). Determinism: two
  * independent runs are row-identical.
  */
class PagerankSpec extends SparkSpecBase {
  import spark.implicits._

  private def ranks(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    PipelineQ.pagerank(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star: the hub out-ranks every spoke; spokes tie") {
    val star = (1L to 6L).map(sp => (0L, sp))
    val r = ranks(star)
    assert(r.keySet == (0L to 6L).toSet)
    val spokes = (1L to 6L).map(r)
    assert(spokes.distinct.size == 1, "symmetric spokes tie exactly")
    assert(r(0L) > 3 * spokes.head, "hub separates by over 3x")
  }

  test("symmetric pair: equal ranks, disconnected from a second pair") {
    val r = ranks(Seq((10L, 11L), (20L, 21L)))
    assert(r(10L) == r(11L) && r(20L) == r(21L))
    assert(r(10L) == r(20L), "isolated pairs are interchangeable")
    // a node exchanging all mass with one partner keeps exactly INIT
    // (contrib = rank, damp of S = rank is lossless at these values)
    assert(r(10L) == 1000000000L)
  }

  test("mass is conserved up to truncation and never created") {
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 4L))
    val r = ranks(pairs)
    val total = r.values.sum
    val init = 1000000000L * r.size
    assert(total <= init, "integer damping cannot create mass")
    assert(total > init - init / 100, "truncation loses under 1%")
  }

  test("n_neighbors is the undirected degree") {
    val df = PipelineQ.pagerank(Seq((0L, 1L), (0L, 2L)).toDF("doc_a", "doc_b"))
    val deg = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(deg == Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }

  test("determinism: two independent corpus runs are row-identical") {
    val a = SparkEntry.queries("q_doc_pagerank")(spark, sfDir).collect().toSeq
    val b = SparkEntry.queries("q_doc_pagerank")(spark, sfDir).collect().toSeq
    assert(a == b)
  }
}
