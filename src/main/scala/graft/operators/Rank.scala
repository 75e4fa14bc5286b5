package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel

/** Distributed total-order ranking — the scale-safe replacement for the
  * unpartitioned `row_number()`/`ntile()` window, whose physical plan
  * (`Exchange SinglePartition` → `WindowExec`) funnels the ENTIRE input
  * through one task: fine at fixture SF, a single-task sort of 10⁹ rows
  * at 100 TB.
  *
  * Shape: range-repartition on the sort keys (each partition holds a
  * contiguous key range, so partition id order IS global order), rank
  * within partitions (a partitioned window — parallel), then add
  * per-partition row-count offsets (a partition-count-sized frame, the
  * only unpartitioned window, over P rows of metadata). The ranked frame
  * is persisted so the offset pass and the rank pass see the same
  * sampled range boundaries.
  *
  * Exactness does not depend on the sampled boundaries being balanced —
  * only on the keys forming a total order (callers must include a
  * unique tiebreak column), because offset + within-partition rank is
  * the exact global position for ANY contiguous range split.
  *
  * CACHE LIFETIME (ADVICE r10): the persist has no safe unpersist point
  * inside a lazy builder (the returned plan reads it twice — offsets and
  * output — and the caller decides when to execute), so these frames stay
  * registered in the session's CacheManager until evicted (MEMORY_AND_DISK
  * evicts under pressure; it does not OOM). Long-lived sessions issuing
  * many ranked queries — chained calls like customers_rfm's three axes
  * included — should call `spark.catalog.clearCache()` between query
  * batches, which is exactly what Bench and Verify do after every query.
  */
object Rank {

  /** Appends `rnCol` = exact global row_number (1-based, BIGINT) of the
    * total order given by `order`. Adds no other columns. */
  def globalRowNumber(df: DataFrame, numPartitions: Int, rnCol: String,
                      order: Column*): DataFrame = {
    val rp = df.repartitionByRange(numPartitions, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = rp.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    // P rows of metadata — the only single-partition window
    val wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wo), lit(0L)))
      .drop("__cnt")
    val wr = Window.partitionBy("__pid").orderBy(order: _*)
    rp.join(broadcast(offsets), Seq("__pid"))
      .withColumn(rnCol,
        row_number().over(wr).cast("bigint") + col("__off"))
      .drop("__pid", "__off")
  }

  /** Appends `sumCol` = exact global INCLUSIVE running sum of `value`
    * (BIGINT) over the total order `order` — the prefix-sum sibling of
    * [[globalRowNumber]], replacing `sum(v).over(Window.orderBy(...))`
    * whose physical plan funnels every row through one task. Same
    * two-pass shape: range-repartition on the sort keys, per-partition
    * running sums (a partitioned window — parallel), then broadcast the
    * P-row per-partition totals as carried-in offsets.
    *
    * Rows whose sort keys tie may receive their tied prefix sums in any
    * order, exactly like the single-task window they replace — the
    * MULTISET of running values over a tie group is deterministic
    * (callers needing a unique value per row must pass a tiebreak
    * column, as with globalRowNumber). */
  def globalRunningSum(df: DataFrame, numPartitions: Int, sumCol: String,
                       value: Column, order: Column*): DataFrame =
    globalRunningSums(df, numPartitions, Seq(sumCol -> value), order: _*)

  /** Several exact global running sums over ONE total order in ONE
    * range-repartition pass (r15 opt): chained [[globalRunningSum]] calls
    * would each pay the sample job + exchange + offsets broadcast; the
    * sums are independent per column, so they share all of it. */
  def globalRunningSums(df: DataFrame, numPartitions: Int,
                        sums: Seq[(String, Column)],
                        order: Column*): DataFrame = {
    // ADVICE r15 hardening: an empty sums list would throw a confusing
    // NoSuchElementException deep in the totals aggregation, and the
    // internal temp columns would silently collide with (and corrupt)
    // same-named caller columns
    require(sums.nonEmpty, "globalRunningSums: sums must be non-empty")
    val reserved = ("__pid" +: sums.indices.flatMap(i =>
      Seq(s"__v$i", s"__t$i", s"__off$i"))).toSet
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"globalRunningSums: input columns ${clash.mkString(", ")} collide " +
        "with reserved temp names (__pid/__vN/__tN/__offN)")
    val vCols = sums.indices.map(i => s"__v$i")
    val withVals = sums.zipWithIndex.foldLeft(df) {
      case (d, ((_, value), i)) => d.withColumn(vCols(i), value.cast("bigint"))
    }
    val rp = withVals
      .repartitionByRange(numPartitions, order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val totals = rp.groupBy(col("__pid")).agg(
      sum(col(vCols.head)).as("__t0"),
      vCols.tail.zipWithIndex.map { case (c, i) =>
        sum(col(c)).as(s"__t${i + 1}") }: _*)
    // P rows of metadata — the only single-partition window
    val wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sums.indices.foldLeft(totals) { (t, i) =>
      t.withColumn(s"__off$i",
        coalesce(sum(col(s"__t$i")).over(wo), lit(0L)))
    }.drop(sums.indices.map(i => s"__t$i"): _*)
    val wr = Window.partitionBy("__pid").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joinedBack = rp.join(broadcast(offsets), Seq("__pid"))
    sums.zipWithIndex.foldLeft(joinedBack) {
      case (d, ((sumCol, _), i)) =>
        d.withColumn(sumCol, sum(col(vCols(i))).over(wr) + col(s"__off$i"))
    }.drop("__pid")
      .drop(vCols: _*)
      .drop(sums.indices.map(i => s"__off$i"): _*)
  }

  /** `ntile(k)` bucket (1-based, BIGINT) of a 1-based position in a
    * total order — the closed form of the SQL ntile contract (first
    * `n mod k` buckets get `⌈n/k⌉` rows, the rest `⌊n/k⌋`), so the
    * bucket can be computed from a distributed global rank instead of a
    * single-task window. SQL-text form for use inside `expr(...)`:
    * requires BIGINT columns `q` (= n div k) and `r` (= n % k) in scope
    * and takes the 1-based position expression text. The ELSE branch is
    * unreachable when q = 0 (pos ≤ n = r·1 then), so its `div q` never
    * divides by zero. */
  def ntileExprSql(posSql: String): String =
    s"""CASE WHEN ($posSql) <= r * (q + 1)
          THEN (($posSql) + q) div (q + 1)
          ELSE r + (($posSql) - r * (q + 1) + q - 1) div q END"""
}
