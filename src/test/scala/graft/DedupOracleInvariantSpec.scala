package graft

import graft.functions.HashFunctions
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Guards for the `dedup_best_of_cluster` ORACLE's LSH-replica recipe
  * (r15, superseding the r14 df-cap assumption this suite originally
  * pinned — the cap was shown to drop 20 real pairs at sf1 and is gone).
  *
  * The oracle now replicates the engine's candidate semantics: 64
  * signed-min MinHash components, 16 bands × 4 rows, band-signature
  * equality, bucket-size-1000 cap, exact-Jaccard verify. Two things keep
  * that replication honest:
  *
  *  1. a Spark-side re-derivation joining on the RAW 4-component band
  *     signature (the oracle's join key) must reproduce
  *     `Dedup.minhashPairsFromIndex`'s pair set exactly — pinning the
  *     j-slicing, the bucket cap, the threshold, and the claim that the
  *     engine's xxhash64 band_key equality is equivalent to raw
  *     signature equality;
  *  2. on the gate fixture, engine LSH pairs == exact all-pairs Jaccard
  *     pairs (recall 1.0) — the property that licenses the remaining
  *     stricter-than-LSH oracles (`dedup_minhash_pairs`,
  *     `dedup_clusters`, `dedup_minhash_survivors`) to stay green at
  *     sf0.01 while their sf1 rows carry the standing recall
  *     adjudication.
  */
class DedupOracleInvariantSpec extends SparkSpec {

  private val gateDir = "/root/testdata/sf0.01"

  /** Exact-Jaccard pairs at a threshold from the distinct-shingle table
    * (grouped-count postings — the oracle's verify shape). */
  private def exactPairs(shd: DataFrame, threshold: Double): DataFrame = {
    val e = shd.select(col("doc_id"), explode(col("sh")).as("h"))
    val sizes = shd.select(col("doc_id"), size(col("sh")).as("n"))
    e.select(col("doc_id").as("id_a"), col("h"))
      .join(e.select(col("doc_id").as("id_b"), col("h")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .filter(col("c").cast("double") /
        (col("na") + col("nb") - col("c")).cast("double") >= threshold)
      .select("id_a", "id_b")
  }

  test("raw band-signature candidates reproduce the engine pair set (oracle recipe soundness)") {
    val sh = SparkEntry.augShingles(spark, gateDir)
    val shd = sh.select(col("doc_id"), array_distinct(col("hs")).as("sh"))
    // oracle-style buckets: 16 band signatures of 4 RAW components each
    // (no xxhash64), from the same 64-component signature the engine uses
    val sig = sh.select(col("doc_id"),
      HashFunctions.minhashFromHashes(col("hs"), 64).as("sig"))
    val bsig = sig.select(col("doc_id"), posexplode(
      array((0 until 16).map(b => slice(col("sig"), b * 4 + 1, 4)): _*))
      .as(Seq("band", "bs")))
    val ok = bsig.groupBy("band", "bs").count()
      .filter(col("count") <= 1000).select("band", "bs")
    val bc = bsig.join(ok, Seq("band", "bs"))
    val cand = bc.select(col("band"), col("bs"), col("doc_id").as("id_a"))
      .join(bc.select(col("band"), col("bs"), col("doc_id").as("id_b")),
        Seq("band", "bs"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // exact verify of the raw-signature candidates at the engine threshold
    val replicated = cand.join(exactPairs(shd, 0.6), Seq("id_a", "id_b"))
    val engine = Dedup.minhashPairsFromIndex(sh,
      SparkEntry.augBuckets(spark, gateDir), "doc_id", threshold = 0.6)
      .select("id_a", "id_b")
    val nEngine = engine.count()
    assert(nEngine > 0, "fixture must contain near-dup pairs")
    assert(replicated.exceptAll(engine).isEmpty &&
      engine.exceptAll(replicated).isEmpty,
      s"raw-signature replication diverges from the engine (engine=$nEngine)")
  }

  test("engine LSH recall is 1.0 on the gate fixture (licenses the stricter exact oracles)") {
    val sh = SparkEntry.augShingles(spark, gateDir)
    val shd = sh.select(col("doc_id"), array_distinct(col("hs")).as("sh"))
    val exact = exactPairs(shd, 0.6)
    val engine = Dedup.minhashPairsFromIndex(sh,
      SparkEntry.augBuckets(spark, gateDir), "doc_id", threshold = 0.6)
      .select("id_a", "id_b")
    val missed = exact.exceptAll(engine).count()
    val extra = engine.exceptAll(exact).count()
    assert(missed == 0 && extra == 0,
      s"sf0.01 engine-vs-exact pair delta: missed=$missed extra=$extra — " +
        "the stricter exact oracles are no longer licensed on this fixture")
  }
}
