package graft

import org.apache.spark.sql.functions._
import graft.functions.{HeavyHitters, MGSummary}

/** Misra-Gries invariants: the frequency guarantee must hold under any
  * partitioning/merge topology, counts must be lower bounds, state must
  * stay ≤ k, and the exact-confirmed query output must be independent
  * of merge order. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 30% heavy key 1, the rest spread over 2..300 (each well below n/9)
  private val stream: Seq[Long] =
    (Seq.fill(900)(1L) ++ (0 until 2100).map(i => 2L + (i % 299))).toSeq

  test("unit: guarantee and lower bounds hold for adversarial orderings") {
    for (ordered <- Seq(stream, stream.reverse, stream.sortBy(identity),
      stream.sortBy(-_))) {
      val sk = new MGSummary(8)
      ordered.foreach(sk.add)
      val (n, items) = sk.result()
      assert(n === stream.size)
      assert(items.length <= 8)
      val heavy = items.toMap
      assert(heavy.contains(1L), s"heavy key lost in $heavy")
      val trueCounts = ordered.groupBy(identity).view.mapValues(_.size.toLong)
      items.foreach { case (key, lb) =>
        assert(lb <= trueCounts(key), s"lb for $key exceeds true count")
      }
    }
  }

  test("unit: merge keeps the guarantee and caps state at k") {
    for (parts <- Seq(2, 7, 31)) {
      val chunks = stream.grouped(math.ceil(stream.size.toDouble / parts).toInt)
        .map { ch => val s = new MGSummary(8); ch.foreach(s.add); s }.toSeq
      val merged = chunks.reduce { (a, b) => a.merge(b); a }
      val (n, items) = merged.result()
      assert(n === stream.size)
      assert(items.length <= 8)
      assert(items.toMap.contains(1L))
    }
  }

  test("aggregate: confirmed heavy-hitter set is partitioning-independent") {
    def confirmed(parts: Int): Seq[(Long, Long)] = {
      val df = stream.toDF("k").repartition(parts)
      val mg = df.agg(HeavyHitters.mgCandidates(col("k"), 8).as("mg"))
      val cands = mg.select(col("mg.n").as("n"), explode(col("mg.items")).as("it"))
        .select(col("n"), col("it.key").as("k"))
      df.join(broadcast(cands), Seq("k"))
        .groupBy(col("k"), col("n")).agg(count(lit(1)).as("c"))
        .filter(col("c") * 9 > col("n"))
        .select("k", "c").orderBy("k")
        .as[(Long, Long)].collect().toSeq
    }
    val expected = Seq((1L, 900L)) // only key 1 exceeds n/9 ≈ 333
    assert(confirmed(1) === expected)
    assert(confirmed(4) === expected)
    assert(confirmed(32) === expected)
  }

  test("streaming: mg_candidates aggregates across micro-batches (update mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val agg = input.toDF().toDF("k")
      .agg(HeavyHitters.mgCandidates(col("k"), 8).as("mg"))
      .select(col("mg.n").as("n"), col("mg.items.key").as("keys"))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("mg_stream").start()
    try {
      input.addData(stream.take(1500))
      q.processAllAvailable()
      input.addData(stream.drop(1500))
      q.processAllAvailable()
      val last = spark.table("mg_stream").orderBy(col("n").desc).head()
      assert(last.getLong(0) === stream.size.toLong)
      assert(last.getSeq[Long](1).contains(1L))
    } finally q.stop()
  }

  test("SQL surface: mg_candidates registered") {
    graft.functions.GraftFunctions.registerAll(spark)
    stream.toDF("k").createOrReplaceTempView("mg_in")
    val row = spark.sql(
      "SELECT mg_candidates(k, 8).n AS n, size(mg_candidates(k, 8).items) AS s FROM mg_in")
      .as[(Long, Int)].head()
    assert(row._1 === stream.size.toLong && row._2 <= 8)
  }
}
