package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.queries.SimilarityQ

/** Randomized exactness proof for the r11 one-exchange fold in
  * SimilarityQ.buildRankedPairs: the lag-marks-firsts window dedup
  * must equal a straightforward reference (materialize every banded
  * candidate pair, dedup, sort per anchor, row_number + cross-label
  * running count) on seeded-random band tables that deliberately
  * plant the hazards — multi-band duplicate pairs, identical
  * embeddings (exact score ties resolved by neighbor_id), and
  * mixed-label anchors exercising the xrank tail.
  *
  * Scores for the reference come from the SAME fastCosine expression
  * the engine uses (evaluated over an explicit pair table), so the
  * comparison isolates the dedup/ranking fold — the one thing the
  * rewrite changed.
  */
class RankedPairsFoldSpec extends SparkSpecBase {
  import spark.implicits._

  private val trials = 12

  test("window-fold dedup+rank equals the materialized-pairs reference on seeded random tables") {
    val rnd = new scala.util.Random(20260816L)
    (1 to trials).foreach { trial =>
      val n = 8 + rnd.nextInt(32)
      val bucketPool = Vector.tabulate(3 + rnd.nextInt(4))(i => s"b$i")
      // a quarter of the vectors reuse one shared embedding → exact
      // score ties among distinct neighbors of the same anchor
      val shared = Array.fill(4)(rnd.nextFloat())
      val rows = (0 until n).map { i =>
        val emb =
          if (i % 4 == 0) shared
          else Array.fill(4)(rnd.nextFloat())
        val nBands = 1 + rnd.nextInt(3)
        val bks = Vector.fill(nBands)(bucketPool(rnd.nextInt(bucketPool.size)))
          .distinct
        (i.toLong, bks, i % 2, emb)
      }
      val keyed = rows
        .flatMap { case (id, bks, label, emb) => bks.map(bk => (id, bk, label, emb)) }
        .toDF("vec_id", "bk", "label", "embedding")

      val got = SimilarityQ.buildRankedPairs(keyed)
        .select("vec_id", "neighbor_id", "label", "n_label", "rank", "xrank")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
          r.getInt(4), r.getLong(5)))
        .toSet

      // reference: distinct banded pairs, scored through the same
      // expression, ranked in plain Scala
      val pairs = rows.flatMap { case (a, aBks, _, _) =>
        rows.collect {
          case (b, bBks, _, _) if a != b && aBks.exists(bBks.contains) => (a, b)
        }
      }.distinct
      val byId = rows.map(r => r._1 -> r).toMap
      val scored = pairs.toDF("a", "b")
        .join(keyed.select(col("vec_id").as("a"), col("embedding").as("ea"))
          .dropDuplicates("a"), Seq("a"))
        .join(keyed.select(col("vec_id").as("b"), col("embedding").as("eb"))
          .dropDuplicates("b"), Seq("b"))
        .select(col("a"), col("b"),
          VectorFunctions.fastCosine(col("ea"), col("eb")).as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val expected = pairs.groupBy(_._1).toSeq.flatMap { case (anchor, ps) =>
        val ordered = ps.map { case (a, b) => (b, scored((a, b))) }
          .sortBy { case (b, s) => (-s, b) }
        var xr = 0L
        ordered.zipWithIndex.flatMap { case ((b, _), idx) =>
          val rank = idx + 1
          val xlabel = byId(anchor)._3 != byId(b)._3
          if (xlabel) xr += 1
          if (rank <= SimilarityQ.knnK ||
            (xlabel && xr <= SimilarityQ.hardNegK))
            Some((anchor, b, byId(anchor)._3, byId(b)._3, rank, xr))
          else None
        }
      }.toSet

      assert(got == expected,
        s"trial $trial (n=$n): missing=${(expected -- got).take(3)} " +
          s"extra=${(got -- expected).take(3)}")
    }
  }
}
