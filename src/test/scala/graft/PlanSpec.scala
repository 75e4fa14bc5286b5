package graft

/** Plan-shape regression tests: lock in the scale-critical physical-plan
  * properties reviewed in PLANS.md so a refactor can't silently lose
  * pushdown or broadcast decisions. */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  test("projection_pushdown: filter reaches the parquet scan") {
    val p = plan("projection_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
  }

  test("projection_pushdown: scan reads only the needed columns") {
    val p = plan("projection_pushdown")
    val read = "ReadSchema: ([^\\n]*)".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_extendedprice"), read)
    assert(!read.contains("l_partkey") && !read.contains("l_discount"), read)
  }

  test("join_broadcast_dims: all three dims broadcast, fact never shuffled for joins") {
    val p = plan("join_broadcast_dims")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q1_agg: partial+final hash aggregation around one exchange") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("sort_limit plans TakeOrderedAndProject, not a global sort") {
    val p = plan("sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("sample_stratified: single agg pass, no join, no window") {
    val p = plan("sample_stratified")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial+final
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("anomaly_zscore: stats join is broadcast, fact not shuffled") {
    val p = plan("anomaly_zscore")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("assignToCentroids: argmax combines map-side (partial_max_by), no window over corpus×k") {
    val e = sources.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val cents = operators.Similarity.kmeansCentroids(e, k = 4, iters = 1)
    val p = operators.Similarity.assignToCentroids(e, cents)
      .queryExecution.executedPlan.toString
    // partial aggregation before the exchange ⇒ the shuffle carries ~|corpus|
    // combined rows, not |corpus|·k candidate rows (the old window shape)
    assert(p.contains("partial_max_by"), p)
  }

  test("multimodal_frame_features: generator pipeline plans no shuffle before the sort") {
    val p = plan("multimodal_frame_features")
    // one exchange only: the final presentation orderBy
    assert("Exchange".r.findAllIn(p).size <= 1, p)
  }
}
