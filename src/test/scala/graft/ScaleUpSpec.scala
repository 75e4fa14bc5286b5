package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** ScaleUp's N× replica construction must make copies that are
  * structurally disjoint (shifted keys) and semantically independent
  * (salted text, sign-flipped embeddings) — otherwise 10× replicated
  * data measures quadratic near-dup blowup instead of 10× organic scale.
  * Crucially this spec also keeps `ScaleUp` inside the test-compile
  * gate: it lives in the main compile unit, so an error here breaks
  * Verify/Bench too (the round-5 failure). */
class ScaleUpSpec extends SparkSpec {

  private def vecs(table: String, copy: Int, unshift: Boolean): Map[Long, Array[Float]] = {
    val df = graft.sources.Tables.load(spark, sfDir, table)
      .orderBy("vec_id").limit(40)
    ScaleUp.copyOf(df, table, copy).select("vec_id", "embedding").collect()
      .map { case Row(id: Long, e: scala.collection.Seq[_]) =>
        val raw = if (unshift) id - copy.toLong * 1000000000L else id
        raw -> e.map(_.asInstanceOf[Float]).toArray
      }.toMap
  }

  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum

  test("cross-copy cosine is far below the 0.95 near-dup bar") {
    val base = vecs("embeddings", 0, unshift = false)
    for (copy <- 1 to 3) {
      val flipped = vecs("embeddings", copy, unshift = true)
      val cosines = base.keys.toSeq.sorted.map { id =>
        val (a, b) = (base(id), flipped(id))
        math.abs(dot(a, b)) / math.sqrt(dot(a, a) * dot(b, b))
      }
      assert(cosines.max < 0.95,
        s"copy $copy: max cross-copy |cosine| ${cosines.max} >= 0.95")
      val mean = cosines.sum / cosines.size
      assert(mean < 0.5, s"copy $copy: mean cross-copy |cosine| $mean")
    }
  }

  test("within-copy geometry is exactly preserved (orthogonal transform)") {
    val base = vecs("embeddings", 0, unshift = false)
    val flipped = vecs("embeddings", 2, unshift = true)
    val ids = base.keys.toSeq.sorted
    // Sign-flip negates floats exactly, so every pairwise product
    // x_k*y_k (both operands flipped or not) is bit-identical: dot
    // products and norms must match EXACTLY, not approximately.
    for (i <- ids; j <- ids.take(5)) {
      assert(dot(base(i), base(j)) == dot(flipped(i), flipped(j)),
        s"dot($i,$j) changed under copy transform")
    }
  }

  test("key shift makes copies disjoint and clear of augmented-id ranges") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents").limit(100)
    val ranges = (0 to 2).map { c =>
      val r = ScaleUp.copyOf(docs, "documents", c)
        .agg(min("doc_id"), max("doc_id")).head()
      (r.getLong(0), r.getLong(1))
    }
    for (Seq((_, hi), (lo2, _)) <- ranges.sliding(2)) {
      assert(hi < lo2, s"copy id ranges overlap: $ranges")
      // augmentedDocs adds +10^6/+2*10^6 synthetic ids; the 10^9 stride
      // must clear them too.
      assert(lo2 - hi > 2000000L, s"copy gap too small for augmented ids: $ranges")
    }
  }

  test("document text is token-salted per copy (no shared shingles)") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .orderBy("doc_id").limit(20)
    val base = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val salted = ScaleUp.copyOf(docs, "documents", 1)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0) - 1000000000L) -> r.getString(1)).toMap
    for ((id, t) <- base) {
      val toks = t.split(" ").toSet
      val saltedToks = salted(id).split(" ").toSet
      assert(toks.intersect(saltedToks).isEmpty,
        s"doc $id shares tokens between copies")
    }
  }
}
