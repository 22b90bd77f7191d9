package graft

import org.apache.spark.sql.functions._

import graft.queries.SharedFrames

/** Pins the SharedFrames LRU release story (round-10 verdict #3): the
  * memo evicts least-recently-used frames past a byte budget and
  * unpersists their checkpoint blocks immediately — but never a frame
  * the CURRENT query (epoch) has touched — and the build ledger that
  * makes memoized family costs self-adjudicating records every build.
  */
class SharedFramesSpec extends SparkSpecBase {

  private def mkFrame(tag: String) = mkFrameIn(spark, tag)

  private def mkFrameIn(s: org.apache.spark.sql.SparkSession, tag: String) = {
    // distinct per tag so memo keys don't collide across tests
    s.range(1000).select(col("id"), lit(tag).as("t"))
      .localCheckpoint(true)
  }

  test("frames evict LRU past the byte budget and rebuild on re-request") {
    val s = spark
    SharedFrames.clear(s)
    SharedFrames.budgetOverride = Some(1L) // any real frame busts it
    try {
      var builds = 0
      SharedFrames.setContext("q_a")
      SharedFrames.frame(s, "sfspec:a") { builds += 1; mkFrame("a") }
      SharedFrames.setContext("q_b")
      SharedFrames.frame(s, "sfspec:b") { builds += 1; mkFrame("b") }
      // a (older epoch) was evicted when b busted the budget → a
      // re-request rebuilds; b (current epoch at its insert) survived
      // until the next epoch's insert
      SharedFrames.setContext("q_a2")
      SharedFrames.frame(s, "sfspec:a") { builds += 1; mkFrame("a") }
      assert(builds == 3, s"expected a evicted + rebuilt, got $builds builds")
      // within ONE epoch, a frame just touched is never evicted by a
      // sibling build — the query's own plan can't lose blocks mid-run
      SharedFrames.setContext("q_c")
      val c1 = SharedFrames.frame(s, "sfspec:c") { mkFrame("c") }
      SharedFrames.frame(s, "sfspec:d") { mkFrame("d") }
      var cBuilds = 0
      SharedFrames.frame(s, "sfspec:c") { cBuilds += 1; mkFrame("c") }
      assert(cBuilds == 0, "same-epoch frame was evicted from under its query")
      assert(c1.count() == 1000)
    } finally {
      SharedFrames.budgetOverride = None
      SharedFrames.clear(s)
    }
  }

  test("evicted frames' checkpoint blocks are unpersisted, survivors' are not") {
    val s = spark
    SharedFrames.clear(s)
    SharedFrames.budgetOverride = Some(1L)
    try {
      SharedFrames.setContext("q_e1")
      SharedFrames.frame(s, "sfspec:e1") { mkFrame("e1") }
      val before = s.sparkContext.getRDDStorageInfo.length
      SharedFrames.setContext("q_e2")
      SharedFrames.frame(s, "sfspec:e2") { mkFrame("e2") }
      // e1's blocks released deterministically (not ContextCleaner-
      // whenever): the storage registry did not grow
      val after = s.sparkContext.getRDDStorageInfo.length
      assert(after <= before,
        s"evicted frame's blocks still registered: $before -> $after")
    } finally {
      SharedFrames.budgetOverride = None
      SharedFrames.clear(s)
    }
  }

  test("eviction budget is accounted per session, not JVM-wide") {
    // round-10 verdict #3b / r10 ADVICE: evict() used to compare the
    // JVM-WIDE byte total against the budget while only the calling
    // session's frames were evictable — another session's resident
    // blocks (a spec harness's newSession(), a concurrent server)
    // pinned the total above budget and churned this session's frames
    // through needless evict/rebuild cycles even when it was under
    // budget on its own.
    val a = spark
    val b = spark.newSession()
    SharedFrames.clear(a); SharedFrames.clear(b)
    try {
      // measure one real frame's footprint under an effectively
      // unlimited budget, then size the budget to fit ~2.5 of them
      SharedFrames.budgetOverride = None
      SharedFrames.setContext("q_xa1")
      SharedFrames.frame(a, "sfspec:xa1") { mkFrameIn(a, "xa1") }
      val aBytes = SharedFrames.buildLog(a)
        .find(_._1 == "sfspec:xa1").map(_._4).getOrElse(0L)
      assert(aBytes > 0, "frame footprint not captured")
      SharedFrames.budgetOverride = Some(aBytes * 5 / 2)
      SharedFrames.setContext("q_xa2")
      SharedFrames.frame(a, "sfspec:xa2") { mkFrameIn(a, "xa2") }
      // session b holds 2 frames (≤ budget on its own); the JVM-wide
      // sum across both sessions is ~4 frames (> budget)
      SharedFrames.setContext("q_xb1")
      SharedFrames.frame(b, "sfspec:xb1") { mkFrameIn(b, "xb1") }
      SharedFrames.setContext("q_xb2")
      SharedFrames.frame(b, "sfspec:xb2") { mkFrameIn(b, "xb2") }
      // per-session accounting: neither session is over ITS budget, so
      // nothing may have been evicted — every re-request must hit
      var rebuilds = 0
      SharedFrames.setContext("q_xb3")
      SharedFrames.frame(b, "sfspec:xb1") { rebuilds += 1; mkFrameIn(b, "xb1") }
      SharedFrames.setContext("q_xa3")
      SharedFrames.frame(a, "sfspec:xa1") { rebuilds += 1; mkFrameIn(a, "xa1") }
      assert(rebuilds == 0,
        s"cross-session bytes churned an under-budget session's frames ($rebuilds rebuilds)")
    } finally {
      SharedFrames.budgetOverride = None
      SharedFrames.clear(a); SharedFrames.clear(b)
    }
  }

  test("driver-side values never evict; build ledger records key/query") {
    val s = spark
    SharedFrames.clear(s)
    SharedFrames.budgetOverride = Some(1L)
    try {
      SharedFrames.setContext("q_v")
      var vBuilds = 0
      SharedFrames.value(s, "sfspec:v") { vBuilds += 1; Seq(1, 2, 3) }
      SharedFrames.setContext("q_w")
      SharedFrames.frame(s, "sfspec:w") { mkFrame("w") } // busts budget
      SharedFrames.setContext("q_v2")
      val v = SharedFrames.value(s, "sfspec:v") { vBuilds += 1; Seq(9) }
      assert(vBuilds == 1 && v == Seq(1, 2, 3), "value entry was evicted")
      val log = SharedFrames.buildLog(s).filter(_._1.startsWith("sfspec:"))
      assert(log.exists(e => e._1 == "sfspec:w" && e._3 == "q_w"))
      assert(log.exists(e => e._1 == "sfspec:v" && e._3 == "q_v"))
      assert(log.count(_._1 == "sfspec:v") == 1)
    } finally {
      SharedFrames.budgetOverride = None
      SharedFrames.clear(s)
    }
  }
}
