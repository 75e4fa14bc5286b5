package graft

import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` output for named queries to
  * files (plans/<tag>/<query>_<suffix>.txt) — the optimization-round
  * evidence trail (guide §1: capture the plan shape before and after).
  *
  * Usage: runMain graft.PlanFormat <outDir> <suffix> <q1,q2,...> [sfDir]
  */
object PlanFormat {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = GraftSession.getOrCreate()
    // SPARK_GRAFT_FANOUT=0 reproduces the pre-r15 plans (before files)
    if (sys.env.get("SPARK_GRAFT_FANOUT").contains("0"))
      spark.conf.set("spark.graft.scan.fanout", "false")
    Files.createDirectories(Paths.get(outDir))
    for (q <- names) {
      try {
        val df = SparkEntry.queries(q)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${q}_$suffix.txt"),
          s"== $q ($suffix, $sfDir) ==\n" + plan)
        System.err.println(s"[plan] $q -> $outDir/${q}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plan] $q FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
