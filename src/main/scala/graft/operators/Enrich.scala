package graft.operators

import graft.functions.StayCategory
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference pipeline's transform stages re-expressed declaratively
  * (SURVEY.md §2.3–§2.5). Works identically on batch and streaming
  * DataFrames — Structured Streaming incrementalizes the same plan.
  */
object Enrich {

  /** P4 — MaskField SMT parity: rewrite a column to the reference's masking
    * constant (/root/reference/azure-source-cc.json:14-17). */
  val MaskConstant = "0000-00-00 00:00:00"
  def maskField(df: DataFrame, col: String): DataFrame =
    df.withColumn(col, lit(MaskConstant))

  /** P3 — null-message guard: drop records whose payload column is null
    * (/root/reference/src/main.py:43-45). */
  def nullGuard(df: DataFrame, col: String): DataFrame =
    df.filter(org.apache.spark.sql.functions.col(col).isNotNull)

  /** D1–D4 — append `stay_category` derived from two date-string columns
    * (/root/reference/src/main.py:70-95). */
  def withStayCategory(df: DataFrame, checkIn: String, checkOut: String): DataFrame =
    df.withColumn("stay_category", StayCategory.stayCategory(col(checkIn), col(checkOut)))

  /** Same enrichment when the inputs are already date/timestamp typed. */
  def withStayCategoryFromDates(df: DataFrame, checkIn: String, checkOut: String): DataFrame =
    df.withColumn("stay_category",
      StayCategory.stayCategoryFromDates(col(checkIn), col(checkOut)))

  /** A1–A3 — the reference's one real query
    * (/root/reference/ci_cd/ksql/create_table.json:2):
    * SELECT stay_category, COUNT(hotel_id), COUNT_DISTINCT(hotel_id)
    * GROUP BY stay_category.
    *
    * Catalyst plans partial+final HashAggregate around a single exchange on
    * `stay_category` (≙ ksqlDB's repartition topic); countDistinct expands
    * to a two-phase distinct aggregate — both scale linearly with input and
    * shuffle only (category, hotel_id) pairs, not whole rows.
    */
  def hotelsCount(enriched: DataFrame, hotelId: String): DataFrame =
    enriched.groupBy(col("stay_category"))
      .agg(
        count(col(hotelId)).as("hotels_amount"),
        countDistinct(col(hotelId)).as("distinct_hotels"))
}
