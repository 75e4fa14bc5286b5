package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series join operators the built-in join types don't cover.
  *
  * The backward as-of join ("latest right row at or before each left row,
  * per key") is implemented with the union + ordered-window formulation:
  * tag both inputs, union them, and run `last(right_value, ignoreNulls)`
  * over a (key, time)-ordered window. This costs exactly ONE shuffle of
  * (left ∪ right) on the key — the same price as a plain equi-join — and
  * never materializes the quadratic (left × right-history) space a naive
  * range join would. At 100 TB this is the only formulation that holds:
  * state per key is a running scalar, skew behaves like any keyed sort,
  * and AQE/range-partition handling applies unchanged.
  */
object AsOf {

  /** Backward (inclusive) as-of join: for every left row, the `rightVal`
    * of the latest right row with the same `key` and right time ≤ left
    * time. Ties on time prefer the larger `rightVal` (deterministic).
    * Output = all left rows + `outCol` (null when no right row precedes).
    *
    * `toleranceUs` (pandas merge_asof `tolerance`) bounds the lookback:
    * a preceding right row farther than that many microseconds yields
    * null instead. Requires timestamp-typed time columns (the default
    * unbounded form accepts any orderable type).
    *
    * `rightVal` must be an orderable type (used as the tie-break). */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   rightVal: String, outCol: String,
                   toleranceUs: Option[Long] = None): DataFrame = {
    val lCols = left.columns.toSeq
    val rvType = right.select(rightVal).schema.head.dataType
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    // right side carries only (key, ts, value); left payload columns are
    // null-filled so the union schema matches
    val r = lCols.foldLeft(
      right.select(col(key).as("__k"), col(rightTs).as("__ts"),
        col(rightVal).as("__rv"))
        .withColumn("__side", lit(0))
    ) { (df, c) =>
      if (c == key) df.withColumn(c, col("__k"))
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.drop("__k")

    val unified = (lCols ++ Seq("__ts", "__side", "__rv")).map(col)
    val u = l.select(unified: _*).unionByName(r.select(unified: _*))

    // right rows sort before left rows at equal time (inclusive semantics);
    // right ties sort by value so `last` picks the largest
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toleranceUs match {
      case None =>
        u.withColumn(outCol,
            last(when(col("__side") === 0, col("__rv")), ignoreNulls = true).over(w))
          .filter(col("__side") === 1)
          .drop("__ts", "__side", "__rv")
      case Some(tol) =>
        // carry the candidate's time alongside its value so the Δt bound
        // is applied AFTER the window pass — still one keyed shuffle
        val us = unix_micros(col("__ts").cast("timestamp"))
        val cand = when(col("__side") === 0, struct(us.as("cus"), col("__rv").as("cv")))
        u.withColumn("__b", last(cand, ignoreNulls = true).over(w))
          .filter(col("__side") === 1)
          .withColumn(outCol,
            when(us - col("__b.cus") <= tol, col("__b.cv")))
          .drop("__ts", "__side", "__rv", "__b")
    }
  }

  /** Forward (inclusive) as-of join (pandas merge_asof
    * direction='forward'): for every left row, the `rightVal` of the
    * EARLIEST right row with the same `key` and right time ≥ left time.
    * Ties on time prefer the smaller `rightVal` (deterministic, mirroring
    * the backward variant's largest-value rule). Output = all left rows +
    * `outCol` (null when no right row follows).
    *
    * Same union + ordered-window formulation as [[asofBackward]], run over
    * the FOLLOWING frame: right rows sort after left rows at equal time so
    * an equal-time right row lands in the left row's following frame
    * (inclusive semantics). Still exactly ONE keyed shuffle of
    * (left ∪ right); per-key state is a single running scalar. */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  rightVal: String, outCol: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rvType = right.select(rightVal).schema.head.dataType
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val r = lCols.foldLeft(
      right.select(col(key).as("__k"), col(rightTs).as("__ts"),
        col(rightVal).as("__rv"))
        .withColumn("__side", lit(0))
    ) { (df, c) =>
      if (c == key) df.withColumn(c, col("__k"))
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.drop("__k")

    val unified = (lCols ++ Seq("__ts", "__side", "__rv")).map(col)
    val u = l.select(unified: _*).unionByName(r.select(unified: _*))

    // left rows sort before right rows at equal time (inclusive forward
    // semantics); right ties sort by value so `first` picks the smallest
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").desc, col("__rv").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u.withColumn(outCol,
        first(when(col("__side") === 0, col("__rv")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__rv")
  }

  /** Nearest as-of join (pandas merge_asof direction='nearest'): the
    * right row minimizing |Δt| per key, equidistant ties resolved to
    * the BACKWARD side; equal-time ties within a side pick the largest
    * value backward / smallest forward (both deterministic). Same
    * union + ordered-window formulation — the backward candidate is a
    * running `last` over the preceding frame, the forward candidate a
    * `first` over the following frame — so the cost is still ONE
    * keyed shuffle of (left ∪ right) and per-key state is two scalars,
    * never a (left × right) range product. Timestamps compare in
    * microseconds. */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  rightVal: String, outCol: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rvType = right.select(rightVal).schema.head.dataType
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val r = lCols.foldLeft(
      right.select(col(key).as("__k"), col(rightTs).as("__ts"),
        col(rightVal).as("__rv"))
        .withColumn("__side", lit(0))
    ) { (df, c) =>
      if (c == key) df.withColumn(c, col("__k"))
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.drop("__k")
    val unified = (lCols ++ Seq("__ts", "__side", "__rv")).map(col)
    val u = l.select(unified: _*).unionByName(r.select(unified: _*))
      .withColumn("__us", unix_micros(col("__ts").cast("timestamp")))

    val ord = Seq(col("__us").asc, col("__side").asc, col("__rv").asc)
    val wB = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cand = when(col("__side") === 0,
      struct(col("__us").as("cus"), col("__rv").as("cv")))
    val picked = u
      .withColumn("__b", last(cand, ignoreNulls = true).over(wB))
      .withColumn("__f", first(cand, ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
      .withColumn(outCol,
        when(col("__f").isNull, col("__b.cv"))
          .when(col("__b").isNull, col("__f.cv"))
          .when(col("__us") - col("__b.cus") <= col("__f.cus") - col("__us"),
            col("__b.cv"))
          .otherwise(col("__f.cv")))
    picked.drop("__ts", "__side", "__rv", "__us", "__b", "__f")
  }
}
