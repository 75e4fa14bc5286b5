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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(dir, name))
    // `events.ts` is parquet TIMESTAMP(NANOS): read as long nanos
    // (spark.sql.legacy.parquet.nanosAsLong) and truncate to microsecond
    // timestamps — the same truncation DuckDB applies for TIMESTAMP_NS →
    // TIMESTAMP, keeping both engines value-identical.
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) if name == "events" =>
        // integer division — `/` would go through double and lose precision
        // at 1.7e18 ns (above 2^53), shifting timestamps by ±1 µs
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df
    }
  }

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
