package graft.tools
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.build("plan-check")
    args.foreach { q =>
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect() // let AQE finalize
      println(df.queryExecution.executedPlan.toString.take(30000))
    }
    spark.stop()
  }
}
