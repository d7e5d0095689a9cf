package graft

/** Dev tool: print a query's formatted physical plan (the
  * `.explain("formatted")` view PlanAuditSpec asserts against) without
  * executing it. `runMain graft.PlanDump <name>[,<name>...] [sfDir]`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.engine.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args(0).split(',').foreach { q =>
      println(s"===== $q =====")
      println(graft.plans.PlanInspector.formatted(
        SparkEntry.queries(q)(spark, sfDir)))
    }
    spark.stop()
  }
}
