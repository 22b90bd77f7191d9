package graft

import org.apache.spark.sql.functions._

import graft.sink.HashIndex
import graft.sources.Tables

/** The persistent corpus hash index: incremental dedup against a
  * bucketed on-disk hash table must (a) match the oracle-gated
  * q_doc_incremental_dedup semantics exactly, (b) shuffle ONLY the
  * incoming batch — the index side reads bucket-aligned with no
  * Exchange — and (c) absorb appended hashes without a rewrite so the
  * next batch sees them.
  */
class HashIndexSpec extends SparkSpecBase {

  test("bucketed index dedup matches the oracle query; index side never shuffles") {
    val docs = Tables.documents(spark, sfDir)
    spark.sql("DROP TABLE IF EXISTS corpus_hashes")
    HashIndex.build(docs.filter(col("doc_id") % 3 =!= 0), "corpus_hashes")

    val batch = docs.filter(col("doc_id") % 3 === 0)
    // force the join shape broadcast would otherwise hide
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val survivors = HashIndex.dedupAgainst(spark, "corpus_hashes", batch)
      val got = survivors.select("doc_id").collect().map(_.getLong(0)).sorted
      val expected = SparkEntry.queries("q_doc_incremental_dedup")(spark, sfDir)
        .collect().map(_.getLong(0)).sorted
      assert(got.sameElements(expected),
        "bucketed-index dedup must equal the oracle-gated anti-join")

      val plan = survivors.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("leftanti"), plan)
      assert(plan.contains("Bucketed: true"),
        s"index side must read bucket-aligned:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"only the batch side may shuffle (found $exchanges hash exchanges):\n$plan")

      // append the accepted hashes: the next identical batch is fully seen
      HashIndex.append(spark, "corpus_hashes", survivors)
      val second = HashIndex.dedupAgainst(spark, "corpus_hashes", batch).count()
      assert(second == 0,
        "after appending accepted hashes, rerunning the same batch must yield 0")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS corpus_hashes")
    }
  }
}
