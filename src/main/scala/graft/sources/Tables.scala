package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's file-source stage (SURVEY.md §2.1 S1 — the Azure
  * Blob Avro connector at /root/reference/azure-source-cc.json:4-13): a
  * partitioned columnar scan is the Spark-native equivalent; Catalyst pushes
  * filters and prunes columns into the scan automatically.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Canonical-type contract: `events.ts` always surfaces as
    * [[org.apache.spark.sql.types.TimestampType]], whatever physical parquet
    * encoding the generator shipped. Three encodings have been observed so
    * far, and each gets a branch:
    *
    *   - TIMESTAMP(NANOS) read as int64 nanos (under
    *     spark.sql.legacy.parquet.nanosAsLong): integer-divide to micros,
    *     then timestamp_micros — the same truncation DuckDB applies for
    *     TIMESTAMP_NS → TIMESTAMP, keeping both engines value-identical.
    *   - timestamp[us] without isAdjustedToUTC → Spark TIMESTAMP_NTZ: cast
    *     to TimestampType. Value-identical because the session timezone is
    *     pinned to UTC (GraftSession), so wall-clock micros == epoch micros.
    *   - timestamp[us] UTC-adjusted → already TimestampType: passthrough.
    *
    * Anything else would surface as a new type; queries call
    * unix_millis/unix_micros on `ts`, which fail analysis on non-TIMESTAMP
    * input, so a fourth encoding can't silently corrupt results.
    * TimestampContractSpec pins all three branches.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = spark.read.parquet(path(dir, name))
    if (name != "events") df
    else df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        // integer division — `/` would go through double and lose precision
        // at 1.7e18 ns (above 2^53), shifting timestamps by ±1 µs
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
