package graft

/** Manual plan inspector (not a CI test — `Test/runMain graft.PlanDumpMain
  * <sfDir> <query>[,<query>...]`): prints the formatted physical plan of
  * named catalog queries without executing them, for shuffle/reuse audits
  * at amplified SFs where running the query first would take minutes.
  */
object PlanDumpMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q1_pricing_summary"))
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
