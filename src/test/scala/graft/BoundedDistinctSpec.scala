package graft

import graft.functions.BoundedDistinct.boundedCountDistinct
import graft.functions.DistinctSketch
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The hybrid exact→HLL distinct aggregate (SURVEY.md §7.3). */
class BoundedDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("below threshold: exact, matches countDistinct across partitions") {
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem").repartition(4)
    val got = li.groupBy("l_returnflag")
      .agg(
        boundedCountDistinct(col("l_partkey"), threshold = 100000).as("bounded"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("bounded") == r.getAs[Long]("exact"), r.toString)
    }
  }

  test("above threshold: HLL estimate within 5% of truth") {
    val n = 50000
    val df = spark.range(n).select((col("id") * 7919L).as("v")) // 50k distinct
    val est = df.agg(boundedCountDistinct(col("v"), threshold = 100, p = 12))
      .as[Long].head()
    assert(math.abs(est - n).toDouble / n < 0.05, s"estimate $est for $n")
  }

  test("sketch unit: degrade preserves estimate; merge exact+hll works") {
    val a = new DistinctSketch(10, 12)
    (1 to 9).foreach(i => a.add(graft.functions.HashOps.mix64(i.toLong)))
    assert(a.isExact && a.estimate() == 9)
    (10 to 1000).foreach(i => a.add(graft.functions.HashOps.mix64(i.toLong)))
    assert(!a.isExact)
    assert(math.abs(a.estimate() - 1000).toDouble / 1000 < 0.10)
    // merge a still-exact sketch into the degraded one
    val b = new DistinctSketch(10, 12)
    (1001 to 1005).foreach(i => b.add(graft.functions.HashOps.mix64(i.toLong)))
    a.merge(b)
    assert(math.abs(a.estimate() - 1005).toDouble / 1005 < 0.10)
    // serialization roundtrip in both modes
    val a2 = DistinctSketch.deserialize(a.serialize())
    assert(a2.estimate() == a.estimate())
    val b2 = DistinctSketch.deserialize(b.serialize())
    assert(b2.estimate() == 5)
  }

  test("works in update-mode streaming where countDistinct is rejected") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Booking]
    val agg = StreamingPipeline.hotelsCountBounded(
      StreamingPipeline.enrich(input.toDF()), threshold = 1000)
    val q = agg.writeStream.format("memory").queryName("hc_bounded")
      .outputMode("update").start()
    try {
      input.addData(
        Booking("2020-01-01", "2020-01-03", 100L),
        Booking("2020-01-01", "2020-01-03", 100L),
        Booking("2020-01-01", "2020-01-03", 200L))
      q.processAllAvailable()
      input.addData(Booking("2020-01-01", "2020-01-03", 300L))
      q.processAllAvailable()
      val last = spark.table("hc_bounded")
        .groupBy("stay_category")
        .agg(max("hotels_amount").as("n"), max("distinct_hotels").as("d"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(last("Short stay") == (4L, 3L)) // exact under threshold
    } finally q.stop()
  }
}
