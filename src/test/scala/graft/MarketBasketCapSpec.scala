package graft

import java.sql.Date

import org.apache.spark.sql.functions._

/** Ground truth for q_market_basket's mega-basket cap (r12 verdict
  * #4): a 300-part order must contribute pairs from its 64 LOWEST
  * part keys only, individual frequencies and the order total must
  * stay uncapped, and the truncation must announce itself (the
  * disclosed-loss log line).
  *
  * The cap-binding discriminator: parts 65 and 66 co-occur in the
  * mega order AND in a small order. Uncapped, (65,66) counts n_ab=2
  * and ties the planted twin pair at the top; capped, the mega
  * order's contribution is gone, so exactly ONE pair in the corpus
  * has n_ab=2.
  */
class MarketBasketCapSpec extends SparkSpecBase {
  import spark.implicits._

  /** order 1: parts 1..300 (mega). orders 2,3: the twin pair
    * (500,501). order 4: part 600 twice (in-order dup). order 5:
    * parts 65,66 (the over-cap discriminator's second occurrence).
    */
  private lazy val dir: String = {
    val rows =
      (1 to 300).map(pk => (1L, pk.toLong)) ++
        Seq((2L, 500L), (2L, 501L), (3L, 500L), (3L, 501L),
          (4L, 600L), (4L, 600L), (5L, 65L), (5L, 66L))
    val d = java.nio.file.Files.createTempDirectory("basket_cap").toString
    rows.zipWithIndex.map { case ((ok, pk), i) =>
      (ok, pk, 7L, i.toLong, 1.0, 1.0, 0.05, 0.02, "N", "O",
        Date.valueOf("2024-01-01"), Date.valueOf("2024-01-02"),
        Date.valueOf("2024-01-03"), "NONE", "TRUCK", "c")
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate", "l_commitdate",
      "l_receiptdate", "l_shipinstruct", "l_shipmode", "l_comment")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("300-part order pairs only within its 64 lowest parts; loss is disclosed") {
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    val rows =
      try {
        System.setErr(new java.io.PrintStream(buf, true))
        SparkEntry.queries("q_market_basket")(spark, dir).collect()
      } finally System.setErr(old)
    assert(buf.toString.contains("disclosed loss") &&
      buf.toString.contains("over 64 parts"),
      s"cap must announce itself when it binds; stderr was: ${buf.toString.take(400)}")

    assert(rows.length == 25)
    // exactly one pair survives at n_ab=2: the twin (500,501). The
    // over-cap discriminator (65,66) fell back to n_ab=1 because the
    // mega order's copy was cut by the cap.
    val top = rows.head
    assert((top.getLong(0), top.getLong(1), top.getLong(2)) == ((500L, 501L, 2L)),
      s"top pair wrong: $top")
    assert(rows.count(_.getLong(2) == 2L) == 1,
      "an uncapped mega order would put (65,66) at n_ab=2 too")
    // frequencies and the total stay UNCAPPED: 500 appears in 2 of 5
    // orders; support = 2/5, confidence = 2/2
    assert(top.getLong(3) == 2L && top.getLong(4) == 2L)
    assert(top.getDouble(5) == 2.0 / 5.0 && top.getDouble(6) == 1.0)
    // the n_ab=1 tail orders by (part_a, part_b): (1,2), (1,3), …
    val second = rows(1)
    assert((second.getLong(0), second.getLong(1), second.getLong(2)) == ((1L, 2L, 1L)))
    // no published pair reaches past the cap boundary of the mega order
    assert(rows.forall(r => r.getLong(0) <= 64 || r.getLong(0) >= 500),
      "pairs from mega-order parts above rank 64 must not exist")
  }

  test("corpus run (TPC-H shape, <=7 lines/order): cap never binds, no loss line") {
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    val n =
      try {
        System.setErr(new java.io.PrintStream(buf, true))
        SparkEntry.queries("q_market_basket")(spark, sfDir).count()
      } finally System.setErr(old)
    assert(n == 25)
    assert(!buf.toString.contains("disclosed loss"),
      "the cap must be silent on a corpus it never touches")
  }
}
