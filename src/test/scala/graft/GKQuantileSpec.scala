package graft

import org.apache.spark.sql.functions._

/** GK quantile summary: streaming (update-mode) aggregation across
  * micro-batches and the SQL registration route. The core containment
  * property test lives in OperatorsSpec. */
class GKQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val vals: Seq[Double] =
    (0 until 4000).map(i => ((i * 2654435761L) % 99991).toDouble / 100.0)

  test("streaming: gk_bounds aggregates across micro-batches (update mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Double]
    val agg = input.toDF().toDF("v")
      .agg(graft.functions.GKQuantile.gkBounds(col("v"), 0.01, Seq(0.5)).as("gk"))
      .select(col("gk.n").as("n"), col("gk.bounds")(0).as("b"))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("gk_stream").start()
    try {
      input.addData(vals.take(2000))
      q.processAllAvailable()
      input.addData(vals.drop(2000))
      q.processAllAvailable()
      val last = spark.table("gk_stream").orderBy(col("n").desc).head()
      assert(last.getLong(0) === vals.size.toLong)
      val b = last.getStruct(1)
      val sorted = vals.sorted
      val k = math.floor(0.5 * (vals.size - 1)).toInt
      assert(b.getDouble(1) <= sorted(k)
        && sorted(math.min(vals.size - 1, k + 1)) <= b.getDouble(2),
        s"median window [${b.getDouble(1)}, ${b.getDouble(2)}] misses ${sorted(k)}")
    } finally q.stop()
  }

  test("merge of SORTED-partition summaries keeps rank containment (g-carried uncertainty)") {
    // Each partition sees ascending input → compress leaves Δ=0 and the
    // uncertainty lives entirely in g. The old max-Δ merge rule added 0
    // here and broke containment; the successor g+Δ−1 rule must not.
    import graft.functions.GKSummary
    val n = 20000
    val data = (0 until n).map(_.toDouble)
    val sorted = data.toArray // already sorted
    for (parts <- Seq(2, 5, 16)) {
      val chunks = data.grouped(math.ceil(n.toDouble / parts).toInt).toSeq
      val summaries = chunks.map { c =>
        val s = new GKSummary(0.01); c.foreach(s.add); s.compress(); s
      }
      // chain merge (worst topology for error accumulation)
      val chained = summaries.reduceLeft { (a, b) => a.merge(b); a }
      assert(chained.n === n.toLong)
      for (r <- Seq(1L, n / 4L, n / 2L, 3L * n / 4L, n - 1L, n.toLong)) {
        val (lo, hi) = chained.window(r)
        val v = sorted((r - 1).toInt)
        assert(lo <= v && v <= hi,
          s"parts=$parts rank=$r window [$lo,$hi] misses $v (sorted input)")
      }
    }
    // interleaved sorted halves (evens/odds) through a tree merge
    val a = new GKSummary(0.01); data.filter(_ % 2 == 0).foreach(a.add)
    val b = new GKSummary(0.01); data.filter(_ % 2 == 1).foreach(b.add)
    a.merge(b)
    for (r <- Seq(1L, n / 3L, n / 2L, n.toLong)) {
      val (lo, hi) = a.window(r)
      val v = sorted((r - 1).toInt)
      assert(lo <= v && v <= hi, s"evens/odds rank=$r window [$lo,$hi] misses $v")
    }
  }

  test("gk_bounds over an empty relation / all-null group yields null, not an error") {
    graft.functions.GraftFunctions.registerAll(spark)
    Seq.empty[Double].toDF("v").createOrReplaceTempView("gk_empty")
    val r1 = spark.sql(
      "SELECT gk_bounds(v, 0.01D, array(0.5D)) AS gk FROM gk_empty").head()
    assert(r1.isNullAt(0))
    Seq[(String, Option[Double])]("a" -> None, "a" -> None, "b" -> Some(1.0))
      .toDF("k", "v").createOrReplaceTempView("gk_nulls")
    val rows = spark.sql(
      """SELECT k, gk_bounds(v, 0.01D, array(0.5D)) AS gk
         FROM gk_nulls GROUP BY k ORDER BY k""").collect()
    assert(rows(0).isNullAt(1), "all-null group must be null")
    assert(!rows(1).isNullAt(1), "non-null group must produce bounds")
  }

  test("SQL surface: gk_bounds registered (eps + quantile-array literals)") {
    graft.functions.GraftFunctions.registerAll(spark)
    vals.toDF("v").createOrReplaceTempView("gk_in")
    val row = spark.sql(
      """SELECT gk_bounds(v, 0.01D, array(0.5D, 0.9D)).n AS n,
         size(gk_bounds(v, 0.01D, array(0.5D, 0.9D)).bounds) AS s
         FROM gk_in""")
      .as[(Long, Int)].head()
    assert(row._1 === vals.size.toLong && row._2 === 2)
  }
}
