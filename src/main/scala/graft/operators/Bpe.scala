package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding tokenizer TRAINER (Sennrich et al. 2016, the
  * public BPE construction): repeatedly merge the corpus-wide most
  * frequent adjacent symbol pair until the target number of merges is
  * reached. The single-step primitive is `tokenizer_bpe_step`; this is
  * the full driver loop that produces the actual artifact — the ordered
  * merge table (the tokenizer's vocab beyond the base alphabet).
  *
  * Scale design, in order of importance at 100 TB:
  *
  *  1. The corpus is scanned ONCE — the trainer's working state is the
  *     distinct-word frequency table (`words`), which grows sub-linearly
  *     with corpus size (vocabulary saturates), never the document set.
  *  2. The pair-count table is maintained INCREMENTALLY: a merge of
  *     pair (a,b) only changes pair counts inside words that contain
  *     (a,b) adjacently, so each step subtracts the affected words' old
  *     pairs and adds their re-segmented pairs — a delta aggregation
  *     sized by the affected subset, not a recount of the corpus or
  *     even of the full word table.
  *  3. Everything per-step is one map-side-combinable keyed aggregation
  *     (the delta groupBy) plus one cheap top-1 (`orderBy.limit(1)`
  *     plans TakeOrderedAndProject — per-partition top-1, k-row merge).
  *     Driver traffic per step is exactly ONE row (the winning pair).
  *
  * Symbol-sequence representation: a word is the "cell string"
  * `" s1\n s2\n … sk\n"` — every symbol sits in its own ` …\n` cell.
  * Tokens are whitespace-split, so no symbol can ever contain ' ' or
  * '\n', which makes cell boundaries unambiguous; merging pair (a,b)
  * is then the literal replace of `" a\n b\n"` with `" ab\n"`. Because
  * both cells are consumed whole (no shared separator), one left-to-
  * right non-overlapping replace() pass IS the greedy BPE merge
  * application — e.g. `a a a a a` → `aa aa a` — and the identical
  * replace() exists in DuckDB, so the oracle replays the trainer in
  * pure SQL with the same semantics.
  */
object Bpe {

  /** Cell-string of a word's characters: `" c1\n c2\n…"`. */
  private def cellString(w: org.apache.spark.sql.Column) =
    concat(lit(" "),
      array_join(transform(sequence(lit(1), length(w)),
        i => substring(w, i, lit(1))), "\n "),
      lit("\n"))

  /** Adjacent-pair counts (freq-weighted) of a cell-string frame. */
  private def pairCounts(words: DataFrame): DataFrame = {
    val syms = split(expr("substring(s, 2, length(s) - 2)"), "\n ")
    words
      .select(col("freq"), syms.as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("a"),
          element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").as("n"))
  }

  /** Train `numMerges` BPE merges over the token stream of `docs.text`
    * (lowercased, whitespace tokens, length ≥ 2 — the same stream as
    * `tokenizer_bpe_step`). Returns the ordered merge table
    * (step, lhs, rhs, merged, n); ties broken (n desc, lhs, rhs). */
  def train(spark: SparkSession, docs: DataFrame, numMerges: Int): DataFrame = {
    import spark.implicits._
    val w0 = docs
      .select(explode(graft.functions.TextFunctions.tokens(lower(col("text")))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // Only TWO kinds of cache: the base word table (scanned by every
    // step's delta through a chain of narrow no-op-safe replaces — the
    // chain is k passes over a small cached table, cheaper than a
    // persist+materialize job per step) and each step's pair table.
    // The loop runs exactly ONE Spark job per step: the top-1 collect,
    // which also materializes that step's incrementally-built pair
    // cache (TakeOrderedAndProject scans every partition). A pair
    // cache is unpersisted only after its CHILD has materialized, so
    // nothing ever recomputes from scratch.
    val words0 = w0.select(cellString(col("w")).as("s"), col("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var words = words0
    var pairs = pairCounts(words0).persist(StorageLevel.MEMORY_AND_DISK)
    var grandparent: Option[DataFrame] = None

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      // one job: materializes `pairs` (and, transitively, anything in
      // its lineage) and returns the winning pair to the driver
      val top = pairs.orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
      grandparent.foreach(_.unpersist())
      grandparent = Some(pairs)
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, a, b, a + b, n))
        val pat = s" $a\n $b\n"
        val rep = s" $a$b\n"
        // literal (non-regex) replace; pat/rep injected as column
        // literals so no SQL-string escaping of token chars is needed
        def applyMerge(df: DataFrame): DataFrame = df.withColumn("s",
          call_function("replace", col("s"), lit(pat), lit(rep)))
        // the DELTA reads only the affected words; the word table takes
        // the replace as one NARROW pass (a no-op on unaffected rows),
        // keeping partition count stable — a filter ∪ union formulation
        // doubles the partition count every step and melts down
        val affected = words.filter(col("s").contains(lit(pat)))
        val delta = pairCounts(affected).withColumn("n", -col("n"))
          .unionByName(pairCounts(applyMerge(affected)))
        pairs = pairs.unionByName(delta)
          .groupBy("a", "b").agg(sum("n").as("n"))
          .filter(col("n") > 0)
          .persist(StorageLevel.MEMORY_AND_DISK)
        words = applyMerge(words)
        step += 1
      }
    }
    val out = merges.toSeq.toDF("step", "lhs", "rhs", "merged", "n")
    pairs.unpersist(); grandparent.foreach(_.unpersist()); words0.unpersist()
    out
  }

  /** ENCODE with a trained merge table (the standard BPE apply: replay
    * the merges in rank order), reported as per-document token stats —
    * (doc_id, n_tokens, n_chars, n_symbols, ratio_bp) where ratio_bp is
    * chars-per-symbol in fixed-point basis points.
    *
    * Scale design: the corpus token stream is NEVER encoded row-by-row —
    * the DISTINCT vocabulary is encoded once (vocab grows sublinearly,
    * merges are k narrow replace passes over a vocab-sized frame) and
    * joined back to the token stream, so per-token work is one
    * dictionary lookup (broadcast at small vocab; a keyed join at web
    * scale). The per-doc rollup is one map-side-combinable aggregation. */
  def encodeStats(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(lower(col("text")))
    val dt = docs.select(col("doc_id"), explode(toks).as("w"))
    val enc0 = dt.select("w").distinct().withColumn("s", cellString(col("w")))
    val enc = merges.foldLeft(enc0) { case (df, (a, b)) =>
        df.withColumn("s", call_function("replace", col("s"),
          lit(s" $a\n $b\n"), lit(s" $a$b\n")))
      }
      // every cell ends in '\n', so the symbol count is the '\n' count
      .withColumn("n_sym", (length(col("s")) -
        length(call_function("replace", col("s"), lit("\n"), lit("")))).cast("long"))
      .select("w", "n_sym")
    dt.join(enc, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(length(col("w"))).cast("long").as("n_chars"),
        sum(col("n_sym")).as("n_symbols"))
      .withColumn("ratio_bp",
        floor(col("n_chars") * lit(10000) / col("n_symbols")))
      .orderBy("doc_id")
  }
}
