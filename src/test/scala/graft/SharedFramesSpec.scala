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

  private def mkFrame(tag: String) = {
    // distinct per tag so memo keys don't collide across tests
    spark.range(1000).select(col("id"), lit(tag).as("t"))
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
