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

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(totalBytes / targetFileBytes) files. At warehouse scale the
    * long tail of KB-sized files from incremental appends dominates
    * scan/driver/namenode overhead — periodic compaction is the fix.
    * Rewrites through a sibling temp dir then swaps, so a concurrent
    * reader sees either the old or the new layout, never a half-written
    * one. Returns the new file count. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 256L * 1024 * 1024): Int = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "_compact_tmp")
    spark.read.parquet(path).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(path + "_compact_old")
    if (!fs.rename(hPath, old))
      throw new java.io.IOException(s"compact: cannot move $path aside")
    if (!fs.rename(tmp, hPath)) {
      fs.rename(old, hPath) // roll back
      throw new java.io.IOException(s"compact: cannot install $tmp")
    }
    fs.delete(old, true)
    n
  }

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
