package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** sf1/sf10 bench-data generator (not a CI test — run with
  * `Test/runMain graft.Sf1GenMain [outDir] [copies]`): amplifies the
  * driver's sf0.1 tables `copies`× (default 10 = sf1; 100 = sf10) so
  * the catalog can be benchmarked decades above the per-round bench
  * SF (BENCH_NOTES.md records the results).
  *
  * Scaling model — "10× more crawl", not "10 copies of the same
  * crawl": each copy gets a DISJOINT key space (keys shifted by a
  * copy stride far above the original max), so joins stay within-copy
  * and per-key selectivities match the original corpus. Document text
  * in copies ≥ 1 is re-tokenized through a per-copy token bijection
  * (every token suffixed `_c<copy>`): within-copy similarity
  * structure (near-dups, shingles, token counts) is preserved
  * exactly, while cross-copy shingle/n-gram overlap is zero — without
  * this, every doc would have 9 identical twins and candidate-pair
  * queries would grow 100×, which is duplication, not scale. Copy 0
  * is verbatim sf0.1, so the original planted structure (near-dup
  * pairs, benchmark contamination, doc_id < 10 bench set) survives
  * unchanged.
  *
  * Embeddings are copied with shifted vec_ids and identical vectors:
  * cross-copy twins at cosine 1.0 are exactly what SemDeDup/near-dup
  * are built to collapse, and ANN query vectors (vec_id < 5) exist
  * only in copy 0 so the query set stays fixed while the corpus
  * grows.
  */
object Sf1GenMain {

  private var copies = 10

  // strides: comfortably above each key domain's max at sf0.1
  private val ckStride = 1000000L   // c_custkey max 15k
  private val skStride = 1000000L   // s_suppkey max 1k
  private val pkStride = 1000000L   // p_partkey max 20k
  private val okStride = 10000000L  // o_orderkey
  private val evStride = 10000000L  // event_id
  private val userStride = 1000000L // user_id
  private val docStride = 1000000L  // doc_id max 5k
  private val vecStride = 1000000L  // vec_id max 2k

  private def shifted(c: String, stride: Long): Column =
    (col(c) + col("__c") * stride).as(c)

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_sf1")
    copies = args.lift(1).map(_.toInt).getOrElse(10)
    require(copies <= 1000, "key strides assume copies <= 1000")
    val src = "/root/testdata/sf0.1"
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")

    // shared dims: unchanged
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }

    def amplify(table: String)(remap: DataFrame => DataFrame): Unit = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val cols = df.columns
      val wide = df.crossJoin(
        spark.range(copies).select(col("id").as("__c")))
      remap(wide)
        .select(cols.map(col).toIndexedSeq: _*)
        // 32 files per amplified table: the source tables are single
        // parquet files (one row group — unsplittable), so without
        // this every sf1 scan would run on 1-2 cores no matter what
        // maxPartitionBytes says; a real 100 TB table has thousands
        // of files and this is the local stand-in for that
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"amplified: $table x$copies")
    }

    amplify("customer")(_.withColumn("c_custkey", shifted("c_custkey", ckStride)))
    amplify("supplier")(_.withColumn("s_suppkey", shifted("s_suppkey", skStride)))
    amplify("part")(_.withColumn("p_partkey", shifted("p_partkey", pkStride)))
    amplify("orders")(
      _.withColumn("o_orderkey", shifted("o_orderkey", okStride))
        .withColumn("o_custkey", shifted("o_custkey", ckStride)))
    amplify("lineitem")(
      _.withColumn("l_orderkey", shifted("l_orderkey", okStride))
        .withColumn("l_partkey", shifted("l_partkey", pkStride))
        .withColumn("l_suppkey", shifted("l_suppkey", skStride)))
    // events.ts is nanos-as-long under the session conf; it passes
    // through untouched (same event-time range, 10x the events — how
    // traffic actually grows)
    amplify("events")(
      _.withColumn("event_id", shifted("event_id", evStride))
        .withColumn("user_id", shifted("user_id", userStride)))
    amplify("documents") { df =>
      val tagged = concat_ws(" ",
        transform(split(col("text"), "\\s+"),
          t => concat(t, lit("_c"), col("__c"))))
      df.withColumn("doc_id", shifted("doc_id", docStride))
        .withColumn("text",
          when(col("__c") === 0, col("text")).otherwise(tagged))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    amplify("embeddings")(_.withColumn("vec_id", shifted("vec_id", vecStride)))

    // post-generation sanity: every table readable at the expected size
    graft.sources.Tables.names.foreach { t =>
      val n = spark.read.parquet(s"$out/$t.parquet").count()
      println(s"check: $t rows=$n")
    }
    spark.stop()
  }
}
