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
