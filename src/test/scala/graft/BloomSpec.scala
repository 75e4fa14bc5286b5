package graft

import org.apache.spark.sql.functions._
import graft.functions.Bloom
import graft.operators.Dedup

/** The broadcast Bloom filter must never produce false negatives (that
  * would silently change dedup semantics), must hold its designed false-
  * positive rate, and — used as a prefilter — must leave
  * incrementalDedupBloom bit-identical to incrementalDedup while
  * actually shrinking the join's probe side. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val words = Bloom.wordsFor(200) // 200 keys → 64 words = 4096 bits

  test("no false negatives: every inserted key probes true") {
    val keys = (1L to 200L).map(_ * 2654435761L).toDF("key")
    val bloom = Bloom.literal(Bloom.buildWords(keys, "key", words))
    val misses = keys
      .filter(!Bloom.mightContain(bloom, col("key"), words))
      .count()
    assert(misses === 0L)
  }

  test("false-positive rate on disjoint keys stays near the 10-bit/key design point") {
    val inserted = (1L to 200L).map(_ * 2654435761L).toDF("key")
    val bloom = Bloom.literal(Bloom.buildWords(inserted, "key", words))
    val probes = (1_000_000L to 1_010_000L).toDF("key")
    val hits = probes
      .filter(Bloom.mightContain(bloom, col("key"), words))
      .count()
    // 10 bits/key, k=7 ⇒ design fp ≈ 0.8%; allow generous slack
    assert(hits.toDouble / 10001 < 0.05,
      s"false-positive rate ${hits.toDouble / 10001} too high")
  }

  test("null keys are ignored on build and never match on probe") {
    val keys = Seq(Some(1L), None, Some(2L)).toDF("key")
    val bloom = Bloom.literal(Bloom.buildWords(keys, "key", words))
    val nullProbe = Seq(Option.empty[Long]).toDF("key")
      .filter(Bloom.mightContain(bloom, col("key"), words))
    assert(nullProbe.count() === 0L)
  }

  test("incrementalDedupBloom is bit-identical to incrementalDedup") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val copies = docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val tails = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" graft near dup tail")).as("text"))
    val aug = docs.unionByName(copies).unionByName(tails)
    val newDocs = aug.filter(col("doc_id") >= 1000000L)
    val corpus = aug.filter(col("doc_id") < 1000000L)
    val base = Dedup.incrementalDedup(newDocs, corpus, "doc_id", "text")
      .select("doc_id").orderBy("doc_id").as[Long].collect()
    val bloomed = Dedup.incrementalDedupBloom(newDocs, corpus, "doc_id", "text")
      .select("doc_id").orderBy("doc_id").as[Long].collect()
    assert(bloomed.toSeq === base.toSeq)
  }

  test("buildWordsMulti builds byte-identical filters to per-filter buildWords") {
    val a = (1L to 300L).map(i => Tuple1(i * 31L)).toDF("key")
    val b = (1L to 900L).map(i => Tuple1(i * 97L + 5L)).toDF("key")
    val wa = Bloom.wordsFor(300)
    val wb = Bloom.wordsFor(900)
    val Seq(ma, mb) = Bloom.buildWordsMulti(Seq(
      (a, "key", wa, 7), (b, "key", wb, 7)))
    assert(ma.toSeq == Bloom.buildWords(a, "key", wa).toSeq)
    assert(mb.toSeq == Bloom.buildWords(b, "key", wb).toSeq)
  }

  test("prefilter shrinks the probe side for a mostly-novel batch") {
    // batch of novel docs: nothing should survive the fingerprint bloom
    val corpus = (1L to 500L)
      .map(i => (i, s"corpus document number $i with shared words"))
      .toDF("doc_id", "text")
    val batch = (1001L to 1500L)
      .map(i => (i, s"completely fresh ingest item $i nothing alike"))
      .toDF("doc_id", "text")
    val w = Bloom.wordsFor(500)
    val bloom = Bloom.literal(Bloom.buildWords(
      corpus.select(xxhash64(md5(col("text"))).as("key")), "key", w))
    val survivors = batch
      .filter(Bloom.mightContain(bloom, xxhash64(md5(col("text"))), w))
      .count()
    assert(survivors < 25, s"bloom passed $survivors of 500 novel docs")
  }
}
