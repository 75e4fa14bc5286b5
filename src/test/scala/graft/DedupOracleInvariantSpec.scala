package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ADVICE r14: `dedup_best_of_cluster`'s oracle computes intersection
  * counts from df-CAPPED postings (HAVING count(*) BETWEEN 2 AND 1000) —
  * a corpus-shape assumption ("no qualifying pair depends on a high-df
  * shingle") that nothing previously enforced. This suite pins it on the
  * sf0.01 gate fixture, so a fixture/ScaleUp text change that breaks the
  * assumption fails HERE with a named invariant instead of surfacing as
  * an opaque engine-vs-oracle hash mismatch:
  *
  *  1. the df-capped pair set is EXACTLY the uncapped exact-Jaccard pair
  *     set (the direct form of the oracle's claim), and
  *  2. every shingle shared by a qualifying pair has df ≤ 50 — well
  *     under the 1000 cap and, critically, NOT scaling with
  *     corpus size: base-text dfs are per-copy constants (ScaleUp salts
  *     text per copy), while the only df that grows with the corpus is
  *     the unsalted " graft near dup tail" literal's (= n_tails, already
  *     100 at sf0.01 → 10k at sf1), which the suite proves no qualifying
  *     pair depends on. Together these show the BETWEEN 2 AND 1000 cap
  *     separates the two df regimes at every SF, not just the tested one.
  */
class DedupOracleInvariantSpec extends SparkSpec {

  private val gateDir = "/root/testdata/sf0.01"

  private def postings: (DataFrame, DataFrame) = {
    val shd = SparkEntry.augShingles(spark, gateDir)
      .select(col("doc_id"), array_distinct(col("hs")).as("sh"))
    val e = shd.select(col("doc_id"), explode(col("sh")).as("h"))
    val sizes = shd.select(col("doc_id"), size(col("sh")).as("n"))
    (e, sizes)
  }

  /** Exact-Jaccard ≥ 0.6 pairs from a postings table (grouped count —
    * the oracle's own verify shape). */
  private def pairsFrom(e: DataFrame, sizes: DataFrame): DataFrame = {
    val a = e.select(col("doc_id").as("id_a"), col("h"))
    val b = e.select(col("doc_id").as("id_b"), col("h"))
    a.join(b, Seq("h")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .filter(col("c").cast("double") /
        (col("na") + col("nb") - col("c")).cast("double") >= 0.6)
      .select("id_a", "id_b")
  }

  test("df-capped pair set == uncapped exact-Jaccard pair set at sf0.01") {
    val (e, sizes) = postings
    val dfok = e.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, 1000)).select("h")
    val capped = pairsFrom(e.join(dfok, Seq("h")), sizes)
    val uncapped = pairsFrom(e, sizes)
    val nUncapped = uncapped.count()
    assert(nUncapped > 0, "fixture must contain qualifying near-dup pairs")
    assert(capped.exceptAll(uncapped).isEmpty &&
      uncapped.exceptAll(capped).isEmpty,
      s"capped and uncapped pair sets differ (uncapped=$nUncapped)")
  }

  test("qualifying pairs share only low-df shingles; tail-literal df is the sole corpus-scaling df") {
    val (e, sizes) = postings
    val dfTab = e.groupBy("h").agg(count(lit(1)).as("df"))
    val pairs = pairsFrom(e, sizes)
    // max df over shingles SHARED by a qualifying pair
    val shared = pairs
      .join(e.select(col("doc_id").as("id_a"), col("h")), Seq("id_a"))
      .join(e.select(col("doc_id").as("id_b"), col("h")), Seq("id_b", "h"))
      .join(dfTab, Seq("h"))
    // measured 16 on the committed fixture (one base trigram repeats
    // across 16 docs of the copy); the bound must stay under BOTH the
    // 1000 cap and the n_tails regime (100 already at this SF)
    val maxSharedDf = shared.agg(max(col("df"))).head().getLong(0)
    assert(maxSharedDf <= 50,
      s"a qualifying pair depends on a df=$maxSharedDf shingle — the " +
        "oracle's BETWEEN 2 AND 1000 cap assumption no longer holds")
    // the corpus DOES contain high-df shingles (the unsalted tail
    // literal, df = n_tails = 100 here) — proving the cap has two
    // separated regimes to cut between, rather than passing vacuously
    val maxDf = dfTab.agg(max(col("df"))).head().getLong(0)
    assert(maxDf >= 100,
      s"expected the tail-literal shingles at df ≈ n_tails (≥100), got $maxDf")
  }
}
