package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom filter built and probed with native (codegen'd)
  * column expressions only — no UDFs, no per-row filter copies.
  *
  * Shape: the filter is an `array<long>` of `words` 64-bit words
  * (m = words·64 bits). Build is a map-side-combinable `bit_or`
  * aggregate over the key column — each executor contributes partial
  * words, and only `words × 8` bytes per partition cross the wire;
  * the result is then an INDEX ARTIFACT, collected to the driver
  * ([[buildWords]]) and inlined into the probe plan as a literal
  * ([[literal]]) — a constant reference in generated code. The probe
  * tests the k bit positions with `shiftright`/`pmod`/bitwiseAND in a
  * plain `filter`, all inside whole-stage codegen.
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

  /** The distributed half of the build: explode each key into its k bit
    * positions, partial-`bit_or` per 64-bit word. At most `words` tiny
    * rows survive the (map-side combined) aggregate. Null keys are
    * ignored (a null never matches the probe). */
  private def wordRows(keys: DataFrame, keyCol: String, words: Int, k: Int): DataFrame =
    keys.filter(col(keyCol).isNotNull)
      .select(explode(array((0 until k).map(i =>
        position(col(keyCol), i, words)): _*)).as("pos"))
      .select(shiftright(col("pos"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("pos"), lit(64L)).cast("int")).as("m"))
      .groupBy(col("w")).agg(bit_or(col("m")).as("bits"))

  /** Build the filter: the `bit_or` aggregate runs distributed
    * (map-side combined — `words × 8` bytes per partition cross the
    * wire), and the ≤ `words` surviving (word, bits) rows are assembled
    * into the dense array by a trivial driver loop. The result is an
    * INDEX ARTIFACT (like the memoized IVF centroids), meant to be
    * inlined into probe plans via [[literal]] — a constant reference in
    * generated code. Two shapes NOT to use, both measured ~10× the
    * entire dedup runtime at words=16384: assembling the dense array
    * relationally (`transform(sequence…, element_at(map…))` is
    * words×words interpreted map scans), and cross-joining a one-row
    * build frame into the probe (copies the whole array into every
    * probe row's UnsafeRow). */
  def buildWords(keys: DataFrame, keyCol: String, words: Int, k: Int = 7): Array[Long] = {
    val arr = new Array[Long](words)
    wordRows(keys, keyCol, words, k).collect()
      .foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Build SEVERAL filters in ONE Spark action (r15 opt): the per-filter
    * word rows are tagged and unioned, so one job materializes every
    * build input (persisted upstream frames included) with the union's
    * branches running concurrently, instead of one serial job per
    * filter. Word layout and probe semantics are byte-identical to
    * [[buildWords]] per filter. */
  def buildWordsMulti(parts: Seq[(DataFrame, String, Int, Int)]): Seq[Array[Long]] = {
    import org.apache.spark.sql.functions.lit
    val tagged = parts.zipWithIndex.map { case ((keys, keyCol, words, k), i) =>
      wordRows(keys, keyCol, words, k)
        .select(lit(i).as("f"), col("w"), col("bits"))
    }
    val arrs = parts.map { case (_, _, words, _) => new Array[Long](words) }
    tagged.reduce(_ unionByName _).collect()
      .foreach(r => arrs(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    arrs
  }

  /** The collected filter as a plan literal for [[mightContain]]. */
  def literal(bloomWords: Array[Long]): Column = typedLit(bloomWords)

  /** Probe: true iff all k bits for `key` are set in `bloom` (a literal
    * from [[literal]], or any array<long> column). Pure codegen'd
    * column expression — a plain `filter`, no join. */
  def mightContain(bloom: Column, key: Column, words: Int, k: Int = 7): Column =
    (0 until k).map { i =>
      val pos = position(key, i, words)
      val word = element_at(bloom, shiftright(pos, 6).cast("int") + 1)
      val mask = call_function("shiftleft", lit(1L), pmod(pos, lit(64L)).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
}
