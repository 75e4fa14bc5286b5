package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}

/** The unpartitioned-window guard's walker + classifier, factored out of
  * PlanSpec so its FAILURE path can be pinned by a negative spec (r11
  * verdict #3): the positive test proves every registered query passes;
  * the negative test proves deliberately-offending plans are caught —
  * including the `partitionBy(lit(0))` costume and a window hidden under
  * `.cache()`, the two disguises the walker exists to see through. */
object WindowGuard {

  /** Full physical-plan walk: a plain `collect` stops at the AQE wrapper
    * (whose children is Nil), cached relations, and subquery boundaries —
    * all three HIDE window operators, so unwrap each explicitly. */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case i: InMemoryTableScanExec => Seq(i.relation.cachedPlan)
      // an already-executed AQE subtree (e.g. inside a materialized cached
      // relation) is made of QueryStageExec LEAVES whose subplan lives in
      // `.plan`, not `.children` — found by the r12 negative spec
      case s: QueryStageExec => Seq(s.plan)
      case other => other.children
    }
    val subs = p.subqueries
    p +: (kids ++ subs).flatMap(allNodes)
  }

  /** Structurally bounded: a per-partition group-limit or a limit below
    * the window (top-k), or the P-row spark_partition_id offset frame of
    * Rank.globalRowNumber / globalRunningSum. */
  def bounded(w: WindowExec): Boolean =
    allNodes(w.child).exists {
      case _: WindowGroupLimitExec | _: LocalLimitExec |
           _: GlobalLimitExec | _: TakeOrderedAndProjectExec => true
      case a: HashAggregateExec =>
        a.groupingExpressions.map(_.name) == Seq("__pid")
      case a: SortAggregateExec =>
        a.groupingExpressions.map(_.name) == Seq("__pid")
      case a: ObjectHashAggregateExec =>
        a.groupingExpressions.map(_.name) == Seq("__pid")
      case _ => false
    }

  /** Global (unpartitioned or foldable-partitioned) WindowExec nodes in
    * the plan that are NOT structurally bounded — the single-task hazard
    * the guard flags. A foldable partitionSpec (`partitionBy(lit(0))`) is
    * the same hazard wearing a costume. */
  def unboundedGlobalWindows(df: DataFrame): Seq[WindowExec] =
    allNodes(df.queryExecution.executedPlan).collect {
      case w: WindowExec
        if (w.partitionSpec.isEmpty || w.partitionSpec.forall(_.foldable)) &&
           !bounded(w) => w
    }
}
