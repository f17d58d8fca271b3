package graft.tools
import graft.SparkEntry
import graft.core.Sessions
object PlanNew {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("plan-new")
    val d = "/root/testdata/sf0.001"
    for (n <- args.toSeq) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, d).queryExecution.executedPlan.toString)
    }
  }
}
