package graft

import org.apache.spark.sql.functions._

/** Ground truth for q_market_basket: exact pair/frequency/ratio values
  * on planted baskets, including the duplicate-line dedup (one order
  * listing a part twice is ONE basket membership).
  */
class MarketBasketSpec extends SparkSpecBase {
  import spark.implicits._

  /** Baskets: o1 {10, 20, 30}, o2 {10, 20}, o3 {10} (with part 10
    * listed twice — must dedup). Pairs: (10,20)×2, (10,30)×1,
    * (20,30)×1. n: 10→3, 20→2, 30→1; orders 3.
    */
  private lazy val plantedDir: String = {
    val rows = Seq(
      (1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3),
      (2L, 10L, 1), (2L, 20L, 2),
      (3L, 10L, 1), (3L, 10L, 2))
    val dir = java.nio.file.Files.createTempDirectory("basket_fix").toString
    rows.toDF("l_orderkey", "l_partkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("planted baskets: exact pair counts, frequencies, support and confidence") {
    val out = SparkEntry.queries("q_market_basket")(spark, plantedDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(out.size == 3)
    assert(out((10L, 20L)) == ((2L, 3L, 2L, 2.0 / 3, 2.0 / 3)))
    assert(out((10L, 30L)) == ((1L, 3L, 1L, 1.0 / 3, 1.0 / 3)))
    assert(out((20L, 30L)) == ((1L, 2L, 1L, 1.0 / 3, 1.0 / 2)))
  }

  test("corpus: ordering is (n_ab desc, pair asc) and ratios are consistent") {
    val rows = SparkEntry.queries("q_market_basket")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val keys = rows.map(r => (-r.getLong(2), r.getLong(0), r.getLong(1)))
    assert(keys.toSeq == keys.sortBy(identity).toSeq)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(2) <= r.getLong(4),
        "pair count cannot exceed either part's frequency")
      assert(r.getDouble(6) == r.getLong(2).toDouble / r.getLong(3))
    }
  }
}
