package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Product-quantization ANN: the code table must have exactly one code
  * per (vector, subspace) with codes inside the codebook, the
  * materialized-index form must be bit-identical to the inline form, and
  * corpus-member queries must recall themselves at rank 1 (the ADC cut
  * keeps the self-match, the exact rerank puts it first). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.sources.Tables.load(spark, sfDir, "embeddings")

  test("pqEncode: one code per (vector, subspace), codes within codebook") {
    val books = Similarity.pqCodebooks(emb, subspaces = 4, subDim = 16,
      codes = 8, iters = 1)
    val cells = Similarity.pqEncode(emb, books, subDim = 16)
    val n = emb.count()
    assert(cells.count() === n * 4)
    assert(cells.groupBy("vec_id", "sub").count()
      .filter(col("count") =!= 1).count() === 0L)
    val range = cells.agg(min("code"), max("code")).as[(Long, Long)].head()
    assert(range._1 >= 0L && range._2 < 8L)
  }

  test("materialized-index probe is bit-identical to the inline form") {
    val inline0 = SparkEntry.queries("similarity_topk_pq")(spark, sfDir)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val indexed = SparkEntry.queries("similarity_topk_pq_index")(spark, sfDir)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(inline0 === indexed)
    assert(inline0.nonEmpty)
  }

  test("ADC + rerank recall@10 vs exact brute force stays above the floor") {
    val pq = SparkEntry.queries("similarity_topk_pq")(spark, sfDir)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val bf = Similarity.bruteForceTopK(emb, q, k = 10)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSet
    val hits = (pq intersect bf).size
    // deterministic data: currently 37/50; floor leaves headroom for
    // parameter tweaks without letting recall silently collapse
    assert(hits >= 30, s"recall@10 dropped to $hits/50")
  }

  test("corpus-member queries recall themselves at rank 1 with cosine 1") {
    val top1 = SparkEntry.queries("similarity_topk_pq")(spark, sfDir)
      .filter(col("rnk") === 1)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(top1.length === 5)
    top1.foreach { case (q, v, c) =>
      assert(q === v, s"query $q top-1 was $v")
      assert(math.abs(c - 1.0) < 1e-9)
    }
  }
}
