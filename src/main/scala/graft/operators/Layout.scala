package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators — where 100 TB performance is actually won.
  *
  * A table partitioned by a predicate column turns a full scan into a
  * directory prune; a table bucketed by a join key turns a shuffle join
  * into a co-located one. These helpers encode the layouts the engine's
  * operators expect (e.g. IVF corpora partitioned by cell id, documents
  * bucketed by fingerprint).
  */
object Layout {

  /** Z-order (Morton) key: interleave the low `bits` bits of two long
    * columns, `a`'s bits in the odd positions. Sorting/range-partitioning
    * a table by this key clusters rows that are close in BOTH dimensions
    * into the same files, so parquet min/max (or partition) pruning works
    * for predicates on either column — the standard multi-dimensional
    * layout trick (Delta/Iceberg OPTIMIZE ZORDER) expressed as a plain
    * codegen-friendly column: 16 interleave steps of shift/and/or, no
    * UDF. At 100 TB: `df.repartitionByRange(col(zkey)).sortWithinPartitions`
    * then write — every file covers a small (a, b) rectangle. */
  def zOrderKey(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }

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

  /** Interleave the low 16 bits of two longs (Morton/Z-value): bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. Standard
    * bit-spreading with shift/mask chains — pure codegen'd column ops. */
  def zValue(a: Column, b: Column): Column = {
    def spread(x0: Column): Column = {
      val x1 = x0.bitwiseAND(lit(0xFFFFL))
      val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(lit(0x00FF00FFL))
      val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(lit(0x33333333L))
      x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Z-ordered write: quantize two numeric columns to 16-bit buckets over
    * their observed ranges, interleave into a Z-value, range-partition and
    * sort the data by it. Each output file then covers a small RECTANGLE
    * in (colA, colB) space instead of a full-width stripe, so parquet
    * min/max skipping prunes files for predicates on EITHER column — the
    * multi-dimensional clustering a single-column sort can't give. This is
    * what makes "WHERE a = x AND b BETWEEN .." scans cheap at 100 TB when
    * the table can only be written once.
    *
    * Columns are clustered on their integer part (cast to BIGINT before
    * quantization) — exact for integral columns; fractional columns
    * cluster at whole-number resolution, which parquet min/max pruning
    * still benefits from.
    *
    * Reference point: the same layout trick Delta/Iceberg OPTIMIZE ZORDER
    * applies; here it is a plain parquet write with deterministic
    * fixed-range quantization (one stats pass + one ordered write). */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int): Unit = {
    val stats = df.agg(
      min(col(colA)).cast("long").as("za_min"), max(col(colA)).cast("long").as("za_max"),
      min(col(colB)).cast("long").as("zb_min"), max(col(colB)).cast("long").as("zb_max"))
    // Quantize to a FULL 16-bit bucket space in both regimes:
    //  - small range (< 2^46): multiply-first (offset*65535 div range+1)
    //    scales narrow domains UP so both dimensions contribute 16
    //    balanced bits to the interleave (identity/divide-first would
    //    leave a narrow column only a few significant bits and the
    //    z-curve would degenerate to a single-column sort);
    //  - huge range (≥ 2^46, e.g. epoch-micros/nanos or hash-derived
    //    keys): multiply-first overflows Long past ~2^47 and wraps
    //    buckets negative, so divide-first (offset div (range div 65536
    //    + 1)) — which loses only sub-bucket resolution the 16-bit
    //    quantizer discards anyway.
    // Overflow discipline: `max - min` itself wraps negative when the
    // keys span more than the signed-Long range (full-range fnv64 keys),
    // which would silently take the multiply-first branch and produce
    // garbage z-values. So the regime test halves BEFORE subtracting
    // (max/2 - min/2 ≈ range/2, never overflows), and the huge-range
    // branch divides each operand by the step BEFORE differencing
    // (c div step - min div step ∈ [0, ~65537]) — no subexpression can
    // exceed Long anywhere. div truncates toward zero, which is still
    // monotone in c, so bucket ordering (all z-order needs) is preserved.
    def bucket16(c: String, minC: String, maxC: String): Column = expr(
      s"""CASE WHEN ($maxC div 2) - ($minC div 2) < ${1L << 45}
         |  THEN ((CAST($c AS BIGINT) - $minC) * 65535)
         |       div ($maxC - $minC + 1)
         |  ELSE least(greatest(
         |         (CAST($c AS BIGINT) div (((($maxC div 2) - ($minC div 2)) div 32768) + 1))
         |       - ($minC div (((($maxC div 2) - ($minC div 2)) div 32768) + 1)), 0L), 65535L)
         |END""".stripMargin)
    val q = df.crossJoin(broadcast(stats))
      .withColumn("z", zValue(
        bucket16(colA, "za_min", "za_max"),
        bucket16(colB, "zb_min", "zb_max")))
      .drop("za_min", "za_max", "zb_min", "zb_max")
    q.repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Hilbert-curve index of two `bits`-bit coordinates — Z-order's
    * stronger sibling: the Hilbert curve has NO long diagonal jumps, so
    * consecutive index ranges cover tighter (a, b) rectangles than the
    * Morton curve's (the property Delta Lake's OPTIMIZE switched to
    * Hilbert for; see also Moon et al., "Analysis of the Clustering
    * Properties of the Hilbert Space-Filling Curve", TKDE 2001).
    *
    * Implementation: the classic xy2d bit-level walk (one step per bit,
    * most-significant first; each step adds the quadrant's s² offset and
    * applies the reflect+swap rotation). Each step MATERIALIZES (x, y, d)
    * as a projection — the rotation makes both next coordinates depend on
    * both current ones, so nesting the steps as one expression would
    * double the tree per step; as chained projections it is 16 narrow
    * codegen'd selects, no UDF, no shuffle. Output column `outCol` in
    * [0, 4^bits); input coords must already be in [0, 2^bits). */
  def withHilbertKey(df: DataFrame, aCol: String, bCol: String,
                     outCol: String, bits: Int = 16): DataFrame = {
    val n = 1L << bits
    val seeded = df
      .withColumn("_hx", col(aCol).cast("long"))
      .withColumn("_hy", col(bCol).cast("long"))
      .withColumn(outCol, lit(0L))
    val walked = (bits - 1 to 0 by -1).foldLeft(seeded) { (d, k) =>
      val s = 1L << k
      val rx = when(shiftright(col("_hx"), k).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(0L)
      val ry = when(shiftright(col("_hy"), k).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(0L)
      // (3·rx) XOR ry spelled as a CASE so the oracle can use the exact
      // same portable arithmetic (no xor builtin dependency)
      val quad = when(col("_rx") === 1L && col("_ry") === 1L, 2L)
        .when(col("_rx") === 1L, 3L)
        .when(col("_ry") === 1L, 1L)
        .otherwise(0L)
      d.withColumn("_rx", rx).withColumn("_ry", ry)
        .withColumn(outCol, col(outCol) + lit(s * s) * quad)
        // rot: if ry==0 reflect (when rx==1) then swap x/y
        .withColumn("_hx2",
          when(col("_ry") === 0L,
            when(col("_rx") === 1L, lit(n - 1) - col("_hy"))
              .otherwise(col("_hy")))
          .otherwise(col("_hx")))
        .withColumn("_hy2",
          when(col("_ry") === 0L,
            when(col("_rx") === 1L, lit(n - 1) - col("_hx"))
              .otherwise(col("_hx")))
          .otherwise(col("_hy")))
        .withColumn("_hx", col("_hx2")).withColumn("_hy", col("_hy2"))
        .drop("_hx2", "_hy2")
    }
    walked.drop("_hx", "_hy", "_rx", "_ry")
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

  /** Order- and layout-independent dataset content fingerprint:
    * (n_rows, content_hash) where content_hash is the wrapping mod-2^64
    * sum of per-row FNV-1a hashes over a '|'-joined canonical string of
    * the given columns (nulls → a NUL sentinel distinct from any
    * cast output). Repartitioning, compaction, z-ordering, bucketing or
    * any row reordering leaves it unchanged; any row added, dropped or
    * edited changes it — the integrity check for 100 TB replica
    * verification and copy validation, computed in one pass with a
    * map-side-combinable agg (a few hundred bytes cross the wire per
    * partition, never rows). Commutative-sum fingerprints are standard
    * in storage systems (e.g. incremental checksums); FNV keeps the
    * row hash engine-reproducible. */
  /** The per-row hash behind the fingerprint family: FNV-1a over the
    * '|'-joined canonical string of `cols` (nulls → a NUL sentinel
    * distinct from any cast output; concat_ws would silently skip
    * them). Shared by batch, grouped, and streaming fingerprints so
    * their values are interchangeable. */
  def rowHash(cols: Seq[String]): Column =
    graft.functions.HashFunctions.fnv64(concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))

  def datasetFingerprint(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(rowHash(cols).as("h"))
      .agg(count(lit(1)).as("n_rows"),
        // LongType sum wraps on overflow (ANSI off) = exact mod-2^64
        sum(col("h")).as("content_hash"))

  /** Per-group [[datasetFingerprint]] — the Merkle-style incremental
    * sync primitive: fingerprint each partition/group of two replicas,
    * join on the group key, and only groups whose hashes differ need a
    * row-level diff or re-copy. At 100 TB this turns replica
    * verification into a metadata-sized comparison plus targeted
    * re-reads. One shuffle of (group, partial count, partial sum) —
    * map-side combined, rows never move. */
  def datasetFingerprintBy(df: DataFrame, groupCols: Seq[String],
                           cols: Seq[String]): DataFrame =
    df.select(groupCols.map(col) :+ rowHash(cols).as("h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h")).as("content_hash"))

  /** Replica diff from group fingerprints: full-outer-join the per-group
    * fingerprints of two replicas and classify each group —
    * `match` (hash and count equal), `differs`, `missing_in_a`,
    * `missing_in_b`. The output is group-cardinality-sized (metadata,
    * not data); only `differs`/`missing` groups need row-level
    * re-reads. Both replicas are scanned exactly once, nothing but
    * (group, count, hash) ever shuffles. */
  def replicaDiff(a: DataFrame, b: DataFrame, groupCols: Seq[String],
                  cols: Seq[String]): DataFrame = {
    val fa = datasetFingerprintBy(a, groupCols, cols)
      .withColumnRenamed("n_rows", "n_rows_a")
      .withColumnRenamed("content_hash", "hash_a")
    val fb = datasetFingerprintBy(b, groupCols, cols)
      .withColumnRenamed("n_rows", "n_rows_b")
      .withColumnRenamed("content_hash", "hash_b")
    fa.join(fb, groupCols, "full_outer")
      .withColumn("status",
        when(col("hash_a").isNull, lit("missing_in_a"))
          .when(col("hash_b").isNull, lit("missing_in_b"))
          .when(col("hash_a") === col("hash_b") &&
            col("n_rows_a") === col("n_rows_b"), lit("match"))
          .otherwise(lit("differs")))
  }

  /** Incremental fingerprint maintenance under CDC: because the
    * fingerprint is a commutative wrapping sum,
    * fingerprint(T ∖ deletes ∪ inserts)
    *   = fingerprint(T) − Σ hash(deletes) + Σ hash(inserts)  (mod 2^64)
    * — so a 100 TB table's fingerprint is maintained per change batch
    * from the BATCH alone, never rescanning the table (an update is a
    * delete + insert of the same key). `prev` is a 1-row
    * (n_rows, content_hash) frame as produced by
    * [[datasetFingerprint]]; the result has the same shape and equals
    * what a full recompute over the updated table would produce. */
  def incrementalFingerprint(prev: DataFrame, inserts: DataFrame,
                             deletes: DataFrame,
                             cols: Seq[String]): DataFrame = {
    def folded(df: DataFrame, n: String, h: String) =
      df.select(rowHash(cols).as("h"))
        .agg(count(lit(1)).as(n), coalesce(sum(col("h")), lit(0L)).as(h))
    prev
      .crossJoin(folded(inserts, "n_i", "h_i"))
      .crossJoin(folded(deletes, "n_d", "h_d"))
      .select(
        (col("n_rows") + col("n_i") - col("n_d")).as("n_rows"),
        // LongType +/- wrap (ANSI off) = exact mod-2^64 group ops
        (col("content_hash") + col("h_i") - col("h_d")).as("content_hash"))
  }
}
