package graft

import org.apache.spark.sql.functions._

/** Ad-hoc instrumentation main for the dev loop (not part of the driver
  * contract). Currently: LSH bucket-size distribution + candidate counts. */
object Debug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    val docs = {
      val d = graft.sources.Tables.load(spark, sfDir, "documents").select("doc_id", "text")
      val exact = d.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val near = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" graft near dup tail")).as("text"))
      d.unionByName(exact).unionByName(near)
    }
    val t0 = System.nanoTime()
    val buckets = graft.operators.Dedup.minhashBuckets(docs, "doc_id", "text", 3, 16, 4)
    val sizes = buckets.groupBy("band", "band_key").count()
    sizes.select(
      count(lit(1)).as("n_buckets"),
      max("count").as("max_bucket"),
      expr("percentile_approx(count, 0.99)").as("p99"),
      sum(col("count") * (col("count") - 1) / 2).as("candidate_pairs"))
      .show(false)
    println(s"bucket stats in ${(System.nanoTime() - t0) / 1e9}s")
    val t1 = System.nanoTime()
    println("docs=" + docs.count())
    val sig = docs.select(graft.functions.HashFunctions.minhashFromHashes(
      graft.operators.Dedup.hashedShingles(col("text"), 3), 64).as("sig"))
    println("sig checksum=" + sig.select(sum(element_at(col("sig"), 1))).first().getLong(0))
    println(s"signature pass (hashed shingles) in ${(System.nanoTime() - t1) / 1e9}s")
    spark.stop()
  }
}
