package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString.take(40000))
    }
    spark.stop()
  }
}
