package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JdbcSource

/** S10 — the JDBC partitioned-read option contract (the live scan needs
  * a database; the partitioning math is what prevents the
  * single-connection full-table serialization at scale).
  */
class JdbcSourceSpec extends AnyFunSuite {

  test("partitioned options carry column, bounds, partitions, and fetch batching") {
    val opts = JdbcSource.partitionedOptions("o_orderkey", 0L, 6000000L, 32)
    assert(opts("partitionColumn") == "o_orderkey")
    assert(opts("lowerBound") == "0" && opts("upperBound") == "6000000")
    assert(opts("numPartitions") == "32")
    assert(opts("fetchsize") == "1000") // reference's chunksize (storage.py:217)
  }

  test("degenerate ranges and partition counts are rejected") {
    intercept[IllegalArgumentException] {
      JdbcSource.partitionedOptions("k", 10L, 10L, 4)
    }
    intercept[IllegalArgumentException] {
      JdbcSource.partitionedOptions("k", 0L, 10L, 0)
    }
  }
}
