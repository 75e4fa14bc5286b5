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
