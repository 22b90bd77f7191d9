package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM (sbt runs all
  * suites in a single fork): building a SparkSession per suite would
  * dominate test wall-clock. Config comes from [[Sessions]] so tests run
  * with exactly the semantics Verify/Bench run with.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.builder(cpus = "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  /** Smallest driver-generated fixture (TESTDATA.md). */
  val sfDir = "/root/testdata/sf0.001"
}
