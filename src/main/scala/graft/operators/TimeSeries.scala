package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Time-series subsequence similarity (motif search) over keyed event
  * streams — the batch form of streaming time-series similarity search:
  * for every key, find the window of length m whose z-normalized shape is
  * closest (squared Euclidean) to a query pattern.
  *
  * Everything is higher-order-function folds over per-key ordered value
  * lists, which evaluate left-to-right — the same IEEE addition order as
  * any external reimplementation folding ascending, so results are
  * engine-replicable bit-for-bit. One shuffle (the per-key collect); the
  * window scoring is embarrassingly parallel per key.
  *
  * At 100 TB the per-key series must be bounded: `bestMotif` collects each
  * key's full series into one array row, so a key is limited to
  * `maxPointsPerKey` points (default 1,000,000 ≈ 8 MB of doubles — well
  * inside a task's memory; two years of minutely data per device). The
  * bound is ENFORCED — an oversized key fails the job with a clear error
  * instead of silently OOMing an executor. For genuinely unbounded keys
  * the same scoring runs inside flatMapGroupsWithState/transformWithState
  * over a sliding buffer.
  */
object TimeSeries {

  /** Sum fold in ascending index order. */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (a, x) => a + x)

  /** z-normalize an array column: (x - mean) / std, all-zero when the
    * window is constant (std = 0). Population std, sequential folds. */
  def znorm(arr: Column, m: Int): Column = {
    val mean = fsum(arr) / m
    val variance = aggregate(arr, lit(0.0), (a, x) => a + (x - mean) * (x - mean)) / m
    val std = sqrt(variance)
    when(std === 0.0, transform(arr, _ => lit(0.0)))
      .otherwise(transform(arr, x => (x - mean) / std))
  }

  /** Squared Euclidean distance of two equal-length arrays (fold over
    * indices, ascending). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)

  /** Resample a keyed event stream onto a fixed hourly grid with forward
    * fill: one row per (key, hour) between the key's first and last
    * events, carrying the most recent observed value. The grid explodes
    * from per-key bounds (no cross join with a global calendar), the fill
    * is a running `last(ignoreNulls)` over the per-key hour order — one
    * window pass after one aggregation, both keyed on `keyCol`. */
  def gapFillHourly(events: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hour = date_trunc("hour", col(tsCol))
    val hourly = events
      .groupBy(col(keyCol), hour.as("hour"))
      .agg(max_by(col(valCol), struct(col(tsCol), col(tieCol))).as("last_val"))
    val grid = hourly
      .groupBy(col(keyCol))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col(keyCol),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(hourly, Seq(keyCol, "hour"), "left")
      .withColumn("value_filled", last(col("last_val"), ignoreNulls = true).over(w))
      .withColumn("observed",
        when(col("last_val").isNotNull, 1L).otherwise(0L))
      .select(col(keyCol), col("hour").cast("timestamp_ntz").as("hour"),
        col("value_filled"), col("observed"))
  }

  /** Per key: the best (lowest z-normalized distance) window of length `m`
    * against `pattern`. Output: (key, start, dist) with `start` 0-based in
    * event order; ties broken by the earliest start. Keys with fewer than
    * `m` events are dropped; keys with MORE than `maxPointsPerKey` events
    * fail the job fast (see the object doc — this operator collects each
    * key's series into a single array row by design). */
  def bestMotif(events: DataFrame, keyCol: String, tsCol: String,
                tieCol: String, valCol: String, pattern: Seq[Double],
                m: Int, maxPointsPerKey: Int = 1000000): DataFrame = {
    require(pattern.length == m, s"pattern length ${pattern.length} != m $m")
    require(maxPointsPerKey >= m,
      s"maxPointsPerKey $maxPointsPerKey < window m $m")
    val p = array(pattern.map(lit): _*)
    val pz = znorm(p, m)
    val series = events
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(
        struct(col(tsCol), col(tieCol), col(valCol).as("v")))).as("evs"))
      .select(col(keyCol), transform(col("evs"), e => e.getField("v")).as("vals"))
      // fail fast on an unbounded key rather than OOM an executor: the
      // per-key array is this operator's documented contract boundary
      .withColumn("vals",
        when(size(col("vals")) > maxPointsPerKey,
          raise_error(concat(
            lit("bestMotif: key "), col(keyCol).cast("string"),
            lit(" has "), size(col("vals")).cast("string"),
            lit(s" points > maxPointsPerKey=$maxPointsPerKey; " +
              "use the transformWithState sliding-buffer variant " +
              "for unbounded keys"))))
          .otherwise(col("vals")))
      .filter(size(col("vals")) >= m)
    series
      .select(col(keyCol),
        posexplode(transform(
          sequence(lit(0), size(col("vals")) - m),
          s => slice(col("vals"), s + 1, lit(m)))).as(Seq("start", "w")))
      .withColumn("dist", sqDist(znorm(col("w"), m), pz))
      .groupBy(col(keyCol))
      .agg(min_by(struct(col("start"), col("dist")),
        struct(col("dist"), col("start"))).as("best"))
      .select(col(keyCol), col("best.start").cast("long").as("start"),
        col("best.dist").as("dist"))
  }
}
