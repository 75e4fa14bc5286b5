package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom filter built and probed with native (codegen'd)
  * column expressions only — no UDFs, no driver-side bit twiddling.
  *
  * Shape: the filter is ONE ROW holding an `array<long>` of `words`
  * 64-bit words (m = words·64 bits). Build is a map-side-combinable
  * `bit_or` aggregate over the key column — each executor contributes
  * partial words, and only `words × 8` bytes per partition cross the
  * wire. Probe broadcasts that single row (`crossJoin(broadcast(...))`)
  * and tests the k bit positions with `shiftright`/`pmod`/bitwiseAND —
  * all inside whole-stage codegen.
  *
  * Why it matters at 100 TB: rolling-ingest dedup joins a small batch
  * against an enormous corpus key set. Shipping a ~100 KB bloom of the
  * corpus keys to every executor turns that shuffle join into a local
  * filter; only the (tiny) might-contain survivors pay the exact
  * confirm join. False positives are harmless (removed by the exact
  * confirm); false negatives are impossible, so semantics are
  * unchanged.
  *
  * Sizing rule: m ≈ 10 bits per distinct key and k = 7 gives ≲1% false
  * positives; `wordsFor` applies it.
  *
  * The k probe positions use the standard double-hashing scheme
  * (Kirsch–Mitzenmacher): position_i = xxhash64(key, i) mod m, which
  * keeps build and probe trivially identical expressions.
  */
object Bloom {

  /** Words (array length) for an expected distinct-key count: ~10 bits
    * per key, rounded up to a power of two, floor 64 words (4 Kbit). */
  def wordsFor(expectedKeys: Long): Int = {
    val bits = math.max(4096L, expectedKeys * 10L)
    var w = 64
    while (w.toLong * 64 < bits && w < (1 << 24)) w <<= 1
    w
  }

  private def position(key: Column, i: Int, words: Int): Column =
    pmod(xxhash64(key, lit(i)), lit(words.toLong * 64L))

  /** Build the filter over `keys(keyCol)` (any hashable type): returns a
    * ONE-ROW DataFrame with column `bloom` = array<long> of length
    * `words`. Null keys are ignored (a null never matches the probe). */
  def build(keys: DataFrame, keyCol: String, words: Int, k: Int = 7): DataFrame = {
    val pos = keys.filter(col(keyCol).isNotNull)
      .select(explode(array((0 until k).map(i =>
        position(col(keyCol), i, words)): _*)).as("pos"))
    val wordRows = pos
      .select(shiftright(col("pos"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("pos"), lit(64L)).cast("int")).as("m"))
      .groupBy(col("w")).agg(bit_or(col("m")).as("bits"))
    wordRows
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits")))).as("wm"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        w => coalesce(element_at(col("wm"), w), lit(0L))).as("bloom"))
  }

  /** Probe: true iff all k bits for `key` are set in `bloom` (an
    * array<long> column from [[build]]). Pure column expression —
    * usable in `filter` after `crossJoin(broadcast(bloomDf))`. */
  def mightContain(bloom: Column, key: Column, words: Int, k: Int = 7): Column =
    (0 until k).map { i =>
      val pos = position(key, i, words)
      val word = element_at(bloom, shiftright(pos, 6).cast("int") + 1)
      val mask = call_function("shiftleft", lit(1L), pmod(pos, lit(64L)).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
}
