package graft.tools

/** Prints the registered query inventory (used to keep README/COVERAGE
  * counts honest — see round-4 VERDICT "doc hygiene" item). */
object Inventory {
  def main(args: Array[String]): Unit = {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${qs.size} oracles=${os.size}")
    println("rows-only: " + (qs -- os).toSeq.sorted.mkString(", "))
    val orphans = os -- qs
    if (orphans.nonEmpty) println("ORPHAN ORACLES: " + orphans.toSeq.sorted.mkString(", "))
    qs.toSeq.sorted.grouped(6).foreach(g => println("  " + g.mkString(", ")))
  }
}
