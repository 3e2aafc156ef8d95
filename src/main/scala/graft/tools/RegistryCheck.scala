package graft.tools

/** Print registry sizes and fail on map inconsistencies — the assembly-time
  * uniqueness gate is exercised simply by touching `queries`/`oracleSql`. */
object RegistryCheck {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries
    val o = graft.SparkEntry.oracleSql
    val orphans = o.keySet.diff(q.keySet)
    require(orphans.isEmpty, s"oracleSql keys without queries: $orphans")
    println(s"queries=${q.size} oracle=${o.size} noOracle=${q.keySet.diff(o.keySet).toSeq.sorted.mkString(",")}")
  }
}
