package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage-layout operators — where 100 TB performance is actually won.
  *
  * A table partitioned by a predicate column turns a full scan into a
  * directory prune; a table bucketed by a join key turns a shuffle join
  * into a co-located one. These helpers encode the layouts the engine's
  * operators expect (e.g. IVF corpora partitioned by cell id, documents
  * bucketed by fingerprint).
  */
object Layout {

  /** Write partitioned by low-cardinality predicate columns. Queries with
    * equality/IN filters on those columns scan only matching directories
    * (PartitionFilters in the plan, not data filters). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Write bucketed + sorted by a join/group key (requires a table name —
    * bucketing metadata lives in the catalog). Joins/aggregations on the
    * bucket key skip the shuffle entirely when both sides share layout. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Idempotent partition replacement: with dynamic partition overwrite,
    * rewriting one partition's data leaves every other partition intact —
    * the retry-safe incremental-batch pattern (no Delta/iceberg needed). */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
