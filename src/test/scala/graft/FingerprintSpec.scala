package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.fingerprints

/** Ground truth for the no-oracle q_doc_fingerprint: determinism and
  * the winnowing guarantees (Schleimer et al. 2003) the implementation
  * claims.
  */
class FingerprintSpec extends SparkSpecBase {
  import spark.implicits._

  private def fps(texts: String*): Map[String, Seq[Long]] =
    texts.toSeq.toDF("t")
      .select(col("t"), fingerprints(col("t")).as("f"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  test("fingerprints are deterministic across runs") {
    val a = SparkEntry.queries("q_doc_fingerprint")(spark, sfDir).collect()
    val b = SparkEntry.queries("q_doc_fingerprint")(spark, sfDir).collect()
    assert(a.nonEmpty)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("whitespace runs and case do not change the fingerprint set") {
    val t1 = "The  Standard\tModel of particle physics"
    val t2 = "the standard model OF   particle physics"
    val f = fps(t1, t2)
    assert(f(t1) == f(t2))
  }

  test("identical documents share all fingerprints; disjoint ones share none") {
    val a = "conservation of angular momentum governs the precession of gyroscopes"
    val b = "conservation of angular momentum governs the precession of gyroscopes"
    val c = "zzzz qqqq jjjj xxxx wwww kkkk vvvv bbbb"
    val f = fps(a, c)
    assert(fps(a)(a) == fps(b)(b))
    assert(f(a).toSet.intersect(f(c).toSet).isEmpty)
  }

  test("fingerprint sets are sorted distinct and short docs degrade gracefully") {
    val long = "a reasonably long sentence that produces several rolling hash windows"
    val short = "hi"
    val f = fps(long, short)
    val l = f(long)
    assert(l == l.distinct.sorted, "fingerprints must be sorted distinct")
    assert(f(short).length == 1, "sub-window docs fall back to a single hash")
  }

  test("a shared long substring yields shared fingerprints (containment)") {
    val core = "the quick brown fox jumps over the lazy dog near the river bank today"
    val doc1 = s"PREFIX ONE $core"
    val doc2 = s"$core SUFFIX TWO here"
    val f = fps(doc1, doc2)
    val shared = f(doc1).toSet.intersect(f(doc2).toSet)
    assert(shared.nonEmpty, "winnowing must retain overlap from a long shared substring")
  }
}
