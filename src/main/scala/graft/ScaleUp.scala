package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: build an N× replica of a testdata sf dir for scale
  * spot-runs (`ScaleUp <srcDir> <outDir> <factor>`). TESTDATA.md tops
  * out at sf0.1; the judge's scale gate wants the heavy queries timed at
  * ~10× that, so this unions `factor` disjoint copies of every table:
  *
  *  - entity keys shift by copy·10⁹ so the copies never collide (also
  *    clear of the +10⁶/+2·10⁶ id ranges augmentedDocs adds);
  *  - document TEXT is token-salted per copy (every token gets the copy
  *    index appended), so copies are NOT near-duplicates of each other —
  *    10 identical copies would inflate every shingle's df 10× and make
  *    dedup look quadratically worse than 10× organic data actually is;
  *  - embeddings get a per-copy diagonal ±1 sign-flip (component j of
  *    copy i flips iff murmur3(j, i) is odd): an orthogonal transform, so
  *    ALL within-copy angles/norms are preserved exactly, while any
  *    cross-copy pair has ~half its energy sign-flipped → cosine ≈ 0,
  *    far below the 0.95 near-dup bar. (A magnitude-only rescale, used
  *    through round 4, left cross-copy cosine ≈ 0.97 — every cross-copy
  *    pair counted as a near-dup and the scale timings were quadratically
  *    pessimistic; ScaleUpSpec now asserts the cross-copy cosine.)
  *  - tiny dimension tables (region, nation) copy through unscaled, like
  *    real reference data.
  */
object ScaleUp {

  private val shiftCols = Set(
    "c_custkey", "s_suppkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "event_id", "user_id",
    "doc_id", "vec_id")

  private[graft] def copyOf(df: DataFrame, table: String, i: Int): DataFrame = {
    val off = i.toLong * 1000000000L
    var out = df
    for (c <- df.columns if shiftCols(c))
      out = out.withColumn(c, col(c) + lit(off))
    if (i > 0 && table == "documents")
      out = out.withColumn("text",
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(i.toString))), " "))
    if (i > 0 && table == "embeddings")
      out = out.withColumn("embedding",
        transform(col("embedding"), (x, j) =>
          when(pmod(hash(j, lit(i)), lit(2)) === lit(1), -x).otherwise(x)
            .cast("float")))
    out
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorStr) = args.take(3)
    val factor = factorStr.toInt
    val spark = GraftSession.builder(master = "local[32]",
      appName = "graft-scaleup").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- graft.sources.Tables.all) {
      val base = graft.sources.Tables.load(spark, srcDir, t)
      val scaled0 =
        if (t == "region" || t == "nation") base
        else (0 until factor).map(copyOf(base, t, _)).reduce(_ unionByName _)
      // write timestamps NTZ so the replica's parquet encoding matches
      // the driver testdata (a tz-aware write would make DuckDB read the
      // oracle side tz-aware while query outputs stay naive)
      val scaled = scaled0.schema.fields.foldLeft(scaled0) { (df, f) =>
        if (f.dataType == org.apache.spark.sql.types.TimestampType)
          df.withColumn(f.name, col(f.name).cast("timestamp_ntz"))
        else df
      }
      scaled.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"$t: ${spark.read.parquet(s"$outDir/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
