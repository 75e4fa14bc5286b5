package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.to_date

/** Semantic invariants of the round-3 analytics/pipeline queries on
  * sf0.001 — properties the DuckDB oracle equivalence alone would not
  * prove (mass conservation, partition completeness, quota bounds). */
class EntryQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  test("privacy_pii_remediate: audit counts match the injection rule, output is clean") {
    val rows = q("privacy_pii_remediate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // injected ground truth: 1–2 emails by id%2, 1–2 IPs by id%3,
      // 0–1 phones by id%5 — the doc text itself may add more (>=)
      assert(r.getAs[Long]("n_email_spans") >= 1 + (id % 2), r.toString)
      assert(r.getAs[Long]("n_ip_spans") >= (if (id % 3 == 0) 2L else 1L), r.toString)
      assert(r.getAs[Long]("n_phone_spans") >= (if (id % 5 != 0) 1L else 0L), r.toString)
      // every redaction shrinks or holds length net of the class tokens;
      // chars_redacted is at least the shortest injected span's length
      assert(r.getAs[Long]("chars_redacted") >= 10L, r.toString)
      // the release gate: NO residual PII in the remediated text
      assert(r.getAs[Boolean]("clean"), s"residual PII in doc $id")
      assert(!r.getAs[String]("remediated").contains("@corp.example.net"))
    }
  }

  test("train_packing_boundary_audit: conservation + boundary invariants vs pack_sequences") {
    val audit = q("train_packing_boundary_audit").collect()
    assert(audit.length == 8) // every shard reports, even tiny ones
    val nDocs = audit.map(_.getAs[Long]("n_docs")).sum
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(nDocs == corpus, s"doc conservation: $nDocs vs $corpus")
    audit.foreach { r =>
      val split = r.getAs[Long]("n_docs_split")
      val crossings = r.getAs[Long]("n_boundary_crossings")
      val foreign = r.getAs[Long]("foreign_tokens")
      val toks = r.getAs[Long]("n_tokens")
      assert(split <= r.getAs[Long]("n_docs"))
      assert(crossings >= split) // every split doc crosses >= 1 boundary
      assert(foreign <= toks && foreign >= 0)
      assert(r.getAs[Long]("tail_padding") >= 0 &&
        r.getAs[Long]("tail_padding") < 512)
      // a doc only has foreign tokens if something crossed a boundary
      assert((foreign > 0) == (crossings > 0), r.toString)
    }
    // same layout as pack_sequences: shard token totals must agree
    val packed = q("pack_sequences").collect()
      .groupBy(_.getAs[Long]("shard"))
      .map { case (k, rows) => k -> rows.map(_.getAs[Long]("started_tokens")).sum }
    audit.foreach { r =>
      assert(packed(r.getAs[Long]("shard")) == r.getAs[Long]("n_tokens"),
        s"shard ${r.getAs[Long]("shard")} token totals diverge from pack_sequences")
    }
  }

  test("join_edit_distance_prefix: equals brute-force levenshtein over the subset") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 % 4 == 0).toSeq
    val expected = (for {
      (ka, na) <- names; (kb, nb) <- names
      if ka < kb && lev(na, nb) <= 1
    } yield (ka, kb, lev(na, nb).toLong)).toSet
    val got = q("join_edit_distance_prefix")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"${got.size} vs ${expected.size}")
    assert(got.nonEmpty)
  }

  test("sessions_concurrency: equals a direct interval sweep over the session set") {
    val sess = q("event_sessionize")
      .select("session_start", "session_end")
      .collect().map { r =>
        def us(i: Int) = r.getAs[java.time.LocalDateTime](i)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
        (us(0), us(1))
      }.toSeq
    // direct sweep: -1 processed before +1 at equal time (half-open)
    val bounds = (sess.map(s => (s._1, 1L)) ++ sess.map(s => (s._2, -1L)))
      .sortBy(b => (b._1, b._2))
    var level = 0L
    val dayPeaks = scala.collection.mutable.Map[Long, Long]()
    val dayStarts = scala.collection.mutable.Map[Long, Long]()
    bounds.foreach { case (t, d) =>
      val day = t / 86400000000L * 86400000000L
      val before = level
      level += d
      dayPeaks(day) = math.max(dayPeaks.getOrElse(day, Long.MinValue),
        math.max(level, before))
      if (d == 1L) dayStarts(day) = dayStarts.getOrElse(day, 0L) + 1L
    }
    val got = q("sessions_concurrency")
      .collect().map { r =>
        val day = r.getAs[java.time.LocalDateTime](0)
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
        (day, (r.getLong(1), r.getLong(2)))
      }.toMap
    assert(got.keySet == dayPeaks.keySet.toSet)
    got.foreach { case (day, (peak, starts)) =>
      assert(peak == dayPeaks(day), s"day $day peak $peak != ${dayPeaks(day)}")
      assert(starts == dayStarts.getOrElse(day, 0L))
    }
    assert(got.values.map(_._1).max > 1L) // fixture has real overlap
  }

  test("orders_basket_lift: top-20 equals brute-force basket counting") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq
    val nOrders = li.map(_._1).distinct.size.toLong
    val na = li.groupBy(_._2).map { case (k, v) => (k, v.size.toLong) }
    val pairs = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for { i <- ps.indices; j <- i + 1 until ps.size } yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val expected = pairs.toSeq.map { case ((a, b), nab) =>
      (a, b, nab, na(a), na(b), 1000000L * nab * nOrders / (na(a) * na(b)))
    }.sortBy(t => (-t._3, -t._6, t._1, t._2)).take(20)
    val got = q("orders_basket_lift")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected, s"${got.take(3)} vs ${expected.take(3)}")
  }

  test("part_skyline: equals brute-force dominance; front is a strict staircase") {
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_retailprice", "p_size")
      .collect().map(r => (r.getLong(0),
        math.round(r.getDouble(1) * 100), r.getInt(2).toLong)).toSeq
    val expected = parts.filter { case (_, pb, sb) =>
      !parts.exists { case (_, pa, sa) =>
        pa <= pb && sa >= sb && (pa < pb || sa > sb) }
    }.map(_._1).toSet
    val got = q("part_skyline")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._1).toSet == expected)
    assert(got.nonEmpty && got.size < parts.size)
    // staircase property of a (min price, max size) front: paying more
    // must buy strictly more size, else the cheaper point dominates
    val front = got.sortBy(t => (t._2, t._3))
    front.sliding(2).foreach {
      case Seq((_, p1, s1), (_, p2, s2)) =>
        if (p1 != p2) assert(s2 > s1, s"front not a staircase: $front")
      case _ => }
  }

  test("text_keywords_tfidf: top-3 per doc recomputed from raw term counts") {
    import org.apache.spark.sql.functions._
    val tok = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(lower(col("text"))))
          .as("term"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val tf = tok.groupBy(identity).map { case ((d, t), v) => ((d, t), v.size.toLong) }
    val df_ = tf.keys.groupBy(_._2).map { case (t, v) => (t, v.size.toLong) }
    val expected = tf.toSeq.groupBy(_._1._1).map { case (d, terms) =>
      val scored = terms.map { case ((_, t), f) =>
        val idf = math.floor(1000000.0 * math.log(nDocs.toDouble / df_(t))).toLong
        (t, f, f * idf)
      }
      (d, scored.sortBy(x => (-x._3, x._1)).take(3)
        .zipWithIndex.map { case ((t, f, s), i) => (i + 1L, t, f, s) })
    }
    val got = q("text_keywords_tfidf")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))).toSeq
      .groupBy(_._1).map { case (d, v) => (d, v.map(_._2).sortBy(_._1)) }
    assert(got.keySet == expected.keySet)
    got.foreach { case (d, ks) => assert(ks == expected(d), s"doc $d") }
  }

  test("join_cardinality_estimate: estimator lands near the exact join size") {
    val row = q("join_cardinality_estimate").head()
    def d(c: String) = row.getDouble(row.fieldIndex(c))
    val est = d("est_join_rows")
    val exact = row.getLong(row.fieldIndex("exact_join_rows")).toDouble
    assert(exact > 0.0)
    // KMV error at k=256 is ~6%; multiplicity is near-uniform in the
    // fixture, so the estimate must land well within 25%
    assert(math.abs(est - exact) / exact < 0.25, s"est $est exact $exact")
    assert(d("est_a") > 0.0 && d("est_b") > 0.0)
    assert(d("est_keys") <= math.min(d("est_a"), d("est_b")) + 1e-9)
  }

  test("scd2_point_in_time: one row per active user, k matches the covering interval") {
    val hist = q("scd2_build")
      .collect().map { r =>
        val vf = r.getAs[java.time.LocalDateTime](r.fieldIndex("valid_from"))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        val vt = Option(r.getAs[java.time.LocalDateTime](r.fieldIndex("valid_to")))
          .map(_.toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
        (r.getLong(r.fieldIndex("user_id")),
          if (r.isNullAt(r.fieldIndex("k"))) None
          else Some(r.getLong(r.fieldIndex("k"))), vf, vt)
      }.toSeq
    import org.apache.spark.sql.functions._
    val b = graft.sources.Tables.load(spark, sfDir, "events")
      .agg(min(expr("unix_millis(ts)")), max(expr("unix_millis(ts)"))).head()
    val tMid = (b.getLong(0) + b.getLong(1)) / 2
    val expected = hist
      .filter { case (_, _, vf, vt) => vf <= tMid && vt.forall(_ > tMid) }
      .map { case (u, k, _, _) => (u, k) }.toMap
    val got = q("scd2_point_in_time")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
    // exactly one interval covers T per active user (intervals partition
    // each user's timeline)
    assert(got.map(_._1).distinct.size == got.size)
    assert(got.toMap == expected, s"${got.size} vs ${expected.size}")
    assert(got.nonEmpty)
  }

  test("customers_rfm: balanced quintiles, segment arithmetic, monotone scores") {
    val rows = q("customers_rfm")
      .select("recency_days", "frequency", "monetary_cents",
        "r_score", "f_score", "m_score", "segment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val n = rows.size
    // ntile balance: every score bucket within 1 of n/5
    for (sel <- Seq[((Long,Long,Long,Long,Long,Long,Long)) => Long](
        _._4, _._5, _._6)) {
      val sizes = rows.groupBy(sel).values.map(_.size)
      assert(sizes.size == 5 && sizes.forall(sz => math.abs(sz - n / 5.0) <= 1))
    }
    rows.foreach { case (_, _, _, r, f, m, seg) =>
      assert(seg == 100 * r + 10 * f + m)
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
    }
    // monotonicity: sorted by monetary, m_score never decreases
    rows.sortBy(_._3).map(_._6).sliding(2).foreach {
      case Seq(a, b) => assert(a <= b); case _ => }
    // recency score: MORE recent (smaller recency_days) => higher r
    rows.sortBy(-_._1).map(_._4).sliding(2).foreach {
      case Seq(a, b) => assert(a <= b); case _ => }
  }

  test("graph_kcore: true k-core at the fixpoint — residual degrees >= k, 4th peel inert") {
    import org.apache.spark.sql.functions._
    val out = q("graph_kcore")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // rebuild the graph + adaptive k directly
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val e0 = li.select((col("l_suppkey") * 2L).as("src"),
        (col("l_partkey") * 2L + 1L).as("dst")).distinct()
    val und = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val deg0 = und.groupBy(_._1).map { case (n, es) => (n, es.size) }
    val degs = deg0.values.toSeq.sorted
    val p25 = {
      val pos = 0.25 * (degs.size - 1)
      val lo = degs(pos.toInt); val hi = degs(math.ceil(pos).toInt)
      math.floor(lo + (pos - pos.toInt) * (hi - lo)).toLong
    }
    val allNodes = deg0.keySet
    assert(out.keySet.subsetOf(allNodes))
    assert(out.size < allNodes.size, "peel removed nothing")
    // every survivor's residual degree within the surviving subgraph >= k
    val surv = out.keySet
    val resDeg = und.filter(e => surv(e._1) && surv(e._2))
      .groupBy(_._1).map { case (n, es) => (n, es.size.toLong) }
    assert(resDeg.keySet == surv)
    resDeg.foreach { case (n, d) =>
      assert(d >= p25, s"node $n residual degree $d < k=$p25")
      assert(out(n) == d)
    }
  }

  test("stats_did: cell means and estimator equal a direct recompute") {
    import org.apache.spark.sql.functions._
    val row = q("stats_did").head()
    def g(c: String) = row.getDouble(row.fieldIndex(c))
    // the parallel-trends arithmetic must close exactly over the cells
    val did = BigDecimal((g("treatment_post") - g("treatment_pre")) -
      (g("control_post") - g("control_pre")))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(g("did") - did) <= 2e-6)
    // every cell mean is positive and the four cells are distinct numbers
    val cells = Seq(g("control_pre"), g("control_post"),
      g("treatment_pre"), g("treatment_post"))
    assert(cells.forall(_ > 0.0))
    assert(cells.distinct.size == 4)
  }

  test("dq_partition_audit: median recomputed, flags consistent") {
    val rows = q("dq_partition_audit")
      .select("n_rows", "median_rows", "low_volume")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq
    assert(rows.nonEmpty)
    val counts = rows.map(_._1).sorted
    val pos = 0.5 * (counts.size - 1)
    val med = counts(pos.toInt) +
      (pos - pos.toInt) * (counts(math.ceil(pos).toInt) - counts(pos.toInt))
    val medQ = rows.head._2
    assert(math.abs(medQ - med) < 1e-4)
    rows.foreach { case (n, m, flag) =>
      assert(flag == (n.toDouble < m * 0.5), s"day n=$n m=$m flag=$flag")
    }
  }

  test("similarity_mutual_knn: exactly the symmetric slice of the rank-1 edge list") {
    val rank1 = q("similarity_knn_graph")
      .filter(org.apache.spark.sql.functions.col("rnk") === 1)
      .select("vec_id", "nbr_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = rank1.filter { case (a, b) => a < b && rank1((b, a)) }
    val got = q("similarity_mutual_knn")
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"${got.size} vs ${expected.size}")
    assert(got.nonEmpty)
  }

  test("events_funnel_windowed: dominated by the unbounded funnel, ppm arithmetic exact") {
    val wf = q("events_funnel_windowed")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    val uf = q("events_funnel")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(wf.map(_._1) == Seq("1_signup", "2_click_24h", "3_purchase_24h"))
    // step 1 identical; deadline steps can only lose users vs unbounded
    assert(wf(0)._2 == uf(0)._2)
    assert(wf(1)._2 <= uf(1)._2 && wf(2)._2 <= uf(2)._2)
    // funnel monotone + live
    assert(wf(0)._2 >= wf(1)._2 && wf(1)._2 >= wf(2)._2)
    assert(wf(2)._2 > 0L)
    assert(wf(0)._3 == 1000000L)
    assert(wf(1)._3 == 1000000L * wf(1)._2 / wf(0)._2)
    assert(wf(2)._3 == 1000000L * wf(2)._2 / wf(1)._2)
  }

  test("agg_incremental_update: delta algebra equals an independent in-engine recompute") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edited = li.filter(pmod(col("l_orderkey"), lit(97)) =!= 0)
      .filter(pmod(col("l_orderkey"), lit(89)) =!= 0 ||
        pmod(col("l_orderkey"), lit(97)) === 0)
      .unionByName(li.filter(pmod(col("l_orderkey"), lit(97)) === 0))
    val direct = edited.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val got = q("agg_incremental_update")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got == direct, s"$got vs $direct")
  }

  test("events_rolling_active: window accounting vs daily actives") {
    import org.apache.spark.sql.functions._
    val rows = q("events_rolling_active")
      .collect().map(r => (r.getAs[java.time.LocalDateTime](0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getLong(1), r.getLong(2))).toSeq
    assert(rows.nonEmpty)
    val daily = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(countDistinct(col("user_id")).as("dau"), count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0).getTime,
        (r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { case (ws, wau, nev) =>
      val days = (0 until 7).flatMap(k =>
        daily.get(ws + k * 86400000L))
      assert(days.nonEmpty)
      // WAU is bounded by [max daily, sum daily]; events sum exactly
      assert(wau >= days.map(_._1).max && wau <= days.map(_._1).sum,
        s"window $ws wau $wau vs $days")
      assert(nev == days.map(_._2).sum, s"window $ws n $nev")
    }
  }

  test("feature_binning: bins span 1..10, near-equal occupancy, monotone in value") {
    val rows = q("feature_binning")
      .select("o_totalprice", "bin")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    val n = rows.size
    assert(rows.map(_._2).distinct.sorted == (1L to 10L))
    val sizes = rows.groupBy(_._2).values.map(_.size)
    sizes.foreach(sz => assert(math.abs(sz - n / 10.0) < 0.02 * n,
      s"bin occupancy skew: $sizes"))
    rows.sortBy(_._1).map(_._2).sliding(2).foreach {
      case Seq(a, b) => assert(a <= b); case _ => }
  }

  test("graph_pagerank: positive ranks, damped mass bound, degree column sane") {
    val rows = q("graph_pagerank")
      .select("pagerank", "degree").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (r, d) => r > 0L && d >= 1L })
    // total mass starts at ~10^12 and only shrinks (integer-division leak
    // + no dangling-mass redistribution), never grows
    val total = rows.map(_._1).sum
    assert(total <= 1000000000000L)
    assert(total >= 800000000000L, s"mass leaked too far: $total")
  }

  test("graph_triangles: every triangle is one vector with its two rescaled copies") {
    val tri = q("graph_triangles").as[(Long, Long, Long)].collect()
    assert(tri.nonEmpty)
    tri.foreach { case (a, b, c) =>
      assert(b == a + 1000000L && c == a + 2000000L, s"unexpected triangle ($a,$b,$c)")
    }
  }

  test("pipeline_quality_gate: funnel is monotone and every stage is live") {
    val st = q("pipeline_quality_gate")
      .select("stage", "n_docs").as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(st.map(_._1) === Seq("0_ingest", "1_lang_en", "2_quality",
      "3_exact_dedup", "4_near_dedup"))
    val ns = st.map(_._2)
    ns.sliding(2).foreach { case Seq(a, b) => assert(b <= a, s"funnel grew: $st") }
    assert(ns.last > 0L, s"funnel collapsed to zero: $st")
    assert(ns.last < ns.head, s"funnel filtered nothing: $st")
  }

  test("graph_jaccard_neighbors: scores bounded, common <= min degree, sorted") {
    val rows = q("graph_jaccard_neighbors")
      .select("common", "da", "db", "jaccard_bp")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.size === 20)
    rows.foreach { case (c, da, db, bp) =>
      assert(c >= 1L && c <= math.min(da, db))
      assert(bp >= 1L && bp <= 10000L)
      assert(bp === c * 10000L / (da + db - c))
    }
    assert(rows.map(_._4) === rows.map(_._4).sorted.reverse, "not sorted desc")
  }

  test("graph_shortest_paths: BFS levels respect bipartite parity and source zeros") {
    val d = q("graph_shortest_paths")
      .select("node", "dist").as[(Long, Long)].collect().toSeq
    assert(d.nonEmpty)
    d.foreach { case (node, dist) =>
      assert(dist >= 0L && dist <= 3L)
      // suppliers are even nodes, parts odd: on a bipartite graph every
      // BFS level flips sides, so dist parity must equal node parity
      assert(dist % 2 === node % 2, s"parity violated at ($node, $dist)")
    }
    val zeros = d.filter(_._2 == 0L).map(_._1).sorted
    assert(zeros.nonEmpty && zeros.forall(n => n % 2 == 0 && n <= 6L))
  }

  test("window_distribution: ppm bounds and nth_value frame semantics") {
    val rows = q("window_distribution")
      .select("pr_ppm", "cd_ppm").as[(Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (pr, cd) =>
      assert(pr >= 0L && pr <= 1000000L)
      assert(cd >= 1L && cd <= 1000000L) // cume_dist is strictly positive
      assert(pr <= cd) // (rank-1)/(n-1) <= rank/n for rank >= 1
    }
  }

  test("pack_sequences: token mass is conserved and sequences are shard-local") {
    val out = q("pack_sequences")
      .select("shard", "started_tokens").as[(Long, Long)].collect()
    val total = sources.Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.expr(
        "sum(CASE WHEN trim(text) = '' THEN 0 ELSE size(split(trim(text), '\\\\s+')) END)"))
      .head().getLong(0)
    assert(out.map(_._2).sum == total, "packing must not lose tokens")
    assert(out.map(_._1).toSet.subsetOf((0L until 8L).toSet))
  }

  test("train_split: splits partition the corpus (disjoint + complete)") {
    val out = q("train_split")
      .select("split", "n_docs").as[(String, Long)].collect()
    assert(out.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
    val total = out.map(_._2).sum
    val docs = sources.Tables.load(spark, sfDir, "documents").count()
    assert(total == docs)
    // with pmod(h,1000)<800 the train share must dominate
    val train = out.filter(_._1 == "train").map(_._2).sum
    assert(train > total / 2)
  }

  test("sample_balanced_lang: per-language quota of 20, contiguous ranks") {
    val out = q("sample_balanced_lang")
      .select("lang", "rn").as[(String, Long)].collect()
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val rns = rows.map(_._2).sorted
      assert(rns.length <= 20, s"$lang over quota")
      assert(rns.toSeq == (1L to rns.length).toSeq, s"$lang ranks not contiguous")
    }
  }

  test("export_shards: 16 shards cover every document exactly once") {
    val out = q("export_shards").select("shard", "n_docs").as[(Long, Long)].collect()
    assert(out.map(_._1).toSet.subsetOf((0L until 16L).toSet))
    val docs = sources.Tables.load(spark, sfDir, "documents").count()
    assert(out.map(_._2).sum == docs)
  }

  test("timeseries_ewma: first event per user is its own EWMA") {
    val e = sources.Tables.load(spark, sfDir, "events")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val firstIds = e.withColumn("rn",
        row_number().over(Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1).select("event_id").as[Long].collect().toSet
    val out = q("timeseries_ewma")
      .select("event_id", "value", "ewma").as[(Long, Double, Double)].collect()
    val firsts = out.filter(r => firstIds.contains(r._1))
    assert(firsts.nonEmpty)
    assert(firsts.forall(r => r._2 == r._3),
      "head-of-series EWMA must equal the raw value")
  }

  test("agg_corr: correlation bounded, covariances consistent") {
    val rows = q("agg_corr")
      .select("n", "corr_qty_price", "covar_pop", "covar_samp")
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, corr, cpop, csamp) =>
      assert(math.abs(corr) <= 1.0)
      // covar_samp = covar_pop * n/(n-1) up to the two independent round(6)s
      assert(math.abs(csamp - cpop * n / (n - 1.0)) < 2e-6)
    }
  }

  test("dq_checks: injected corruption is detected") {
    val r = q("dq_checks").head()
    assert(r.getAs[Long]("n_orphan_fk") > 0)
    assert(r.getAs[Long]("n_range_violations") > 0)
    assert(r.getAs[Long]("n_dup_pk") >= r.getAs[Long]("n_orphan_fk"),
      "dup count must include at least the injected duplicates")
  }

  test("agg_equidepth: buckets are balanced and ordered") {
    val rows = q("agg_equidepth")
      .select("bucket", "n_orders", "lo", "hi")
      .as[(Int, Long, Double, Double)].collect()
    assert(rows.length == 10)
    val ns = rows.map(_._2)
    assert(ns.max - ns.min <= 1, s"equi-depth buckets unbalanced: ${ns.toSeq}")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"bucket bounds overlap: $a vs $b")
    }
  }

  test("timeseries_autocorr and outlier_trim: statistics within bounds") {
    val ac = q("timeseries_autocorr")
      .select("autocorr_lag1").as[Double].collect()
    assert(ac.nonEmpty && ac.forall(v => math.abs(v) <= 1.0))
    val ot = q("outlier_trim")
      .select("n_total", "n_below", "n_above").as[(Long, Long, Long)].collect()
    // ~1% outside each fence by construction of the percentile bounds
    assert(ot.forall { case (n, lo, hi) => lo <= n / 50 && hi <= n / 50 })
  }

  test("timeseries_cusum: window formulation equals the sequential recurrence") {
    // S_t = max(0, S_{t-1} + dev_t) replayed per user on the driver must
    // match the prefix-min window formulation exactly (decimal-exact)
    val e = sources.Tables.load(spark, sfDir, "events")
      .select("user_id", "event_id", "ts", "value")
      .orderBy("user_id", "ts", "event_id")
      .collect()
    val perUser = e.groupBy(_.getLong(0)).map { case (u, rows) =>
      var s = BigDecimal(0)
      var maxS = BigDecimal(0)
      var alarms = 0L
      rows.foreach { r =>
        val dev = BigDecimal(r.getDouble(3)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) - BigDecimal("60.00")
        s = (s + dev).max(BigDecimal(0))
        if (s > maxS) maxS = s
        if (s > BigDecimal("300.00")) alarms += 1
      }
      u -> ((rows.length.toLong, maxS.toDouble, alarms))
    }
    val out = q("timeseries_cusum")
      .select("user_id", "n_events", "max_s", "n_alarms")
      .as[(Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (u, n, maxS, alarms) =>
      val (rn, rMax, rAlarms) = perUser(u)
      assert(n === rn)
      assert(math.abs(maxS - rMax) < 1e-9, s"user $u max_s $maxS vs $rMax")
      assert(alarms === rAlarms, s"user $u alarms")
    }
    assert(out.map(_._4).sum > 0, "fixture should produce some alarms")
  }

  test("agg_histogram: buckets cover all orders, revenue positive") {
    val out = q("agg_histogram")
      .select("bucket", "n_orders", "bucket_revenue")
      .as[(Long, Long, Double)].collect()
    val orders = sources.Tables.load(spark, sfDir, "orders").count()
    assert(out.map(_._2).sum == orders)
    assert(out.forall(r => r._1 >= 0 && r._3 > 0.0))
  }

  test("search_hybrid_rrf: ranks in window, fusion arithmetic exact, sorted") {
    val out = q("search_hybrid_rrf")
      .select("doc_id", "lex_rank", "dense_rank", "rrf")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toSeq
    assert(out.nonEmpty && out.size <= 10)
    assert(out.forall(_._1 != 0L), "query doc must not retrieve itself")
    out.foreach { case (id, lr, dr, rrf) =>
      assert(lr.forall(r => r >= 1 && r <= 20), s"doc $id lex_rank $lr")
      assert(dr.forall(r => r >= 1 && r <= 20), s"doc $id dense_rank $dr")
      assert(lr.isDefined || dr.isDefined, s"doc $id in neither leg")
      // fused score is exactly the fixed-point RRF of the two ranks
      val expect = lr.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        dr.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrf === expect, s"doc $id rrf $rrf vs $expect")
    }
    // result is the top of the fused ordering
    assert(out.map(r => (-r._4, r._1)) === out.map(r => (-r._4, r._1)).sorted)
    // a doc present in BOTH legs at equal rank beats one in a single leg
    val both = out.filter(r => r._2.isDefined && r._3.isDefined)
    val single = out.filter(r => r._2.isEmpty || r._3.isEmpty)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_._4).max > single.map(_._4).min)
  }

  test("graph_label_propagation: community mass conserved, sizes ordered") {
    val out = q("graph_label_propagation")
      .select("label", "size").as[(Long, Long)].collect().toSeq
    assert(out.nonEmpty && out.size <= 20)
    assert(out.forall(_._2 >= 1L))
    // sizes arrive in (size desc, label asc) order
    assert(out.map(r => (-r._2, r._1)) === out.map(r => (-r._2, r._1)).sorted)
    // labels are node ids from the encoded domain (supplier 2k / part 2k+1)
    val li = sources.Tables.load(spark, sfDir, "lineitem")
    val nNodes = li.select((($"l_suppkey" * 2).as("n"))).distinct().count() +
      li.select((($"l_partkey" * 2 + 1).as("n"))).distinct().count()
    assert(out.map(_._2).sum <= nNodes, "top-20 community mass exceeds node count")
  }

  test("agg_topk_merge: bounds contain the exact count, certain mass below it") {
    val out = q("agg_topk_merge")
      .select("l_partkey", "est_lo", "est_hi", "exact", "contained")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.size == 20)
    val direct = sources.Tables.load(spark, sfDir, "lineitem")
      .groupBy($"l_partkey").count()
      .as[(Long, Long)].collect().toMap
    out.foreach { case (k, lo, hi, ex, c) =>
      assert(ex == direct(k), s"key $k exact column drifted")
      assert(lo <= ex && ex <= hi, s"key $k bounds [$lo,$hi] miss exact $ex")
      assert(c == 1L)
    }
  }

  test("agg_hll_merge: merged registers equal direct, estimate near exact") {
    val r = q("agg_hll_merge")
      .select("n_exact", "est_merged", "est_direct", "n_register_diffs")
      .as[(Long, Double, Double, Long)].collect().head
    assert(r._4 == 0L, "bucket-max merge must equal the direct sketch")
    assert(r._2 == r._3, "merged and direct estimates must be bit-identical")
    // 4096 registers: standard error ~1.04/sqrt(4096) = 1.6%; allow 5%
    assert(math.abs(r._2 - r._1.toDouble) / r._1.toDouble < 0.05,
      s"estimate ${r._2} vs exact ${r._1}")
  }

  test("sample_reservoir_merge: shard-merged sample equals the direct sample") {
    val r = q("sample_reservoir_merge")
      .select("k", "n_merged", "n_direct", "n_diffs")
      .as[(Long, Long, Long, Long)].collect().head
    assert(r._1 == 100L && r._2 == 100L && r._3 == 100L)
    assert(r._4 == 0L, "top-k of shard top-ks must equal global top-k")
  }

  test("stats_xi_correlation: xi within [-1, 1], integer parts consistent") {
    val r = q("stats_xi_correlation")
      .select("n_days", "sum_dr", "denom", "xi_ppm")
      .as[(Long, Long, Long, Long)].collect().head
    assert(r._1 > 0 && r._3 > 0)
    assert(r._4 >= -1000000L && r._4 <= 1000000L)
    // xi_ppm is exactly the floored ratio of the emitted integer parts
    val expect = math.floor(1e6 *
      (1.0 - (r._1 * r._2).toDouble / r._3.toDouble)).toLong
    assert(r._4 == expect)
  }

  test("stats_benjamini_hochberg: rejections are a prefix of the p-value order") {
    val out = q("stats_benjamini_hochberg")
      .select("p_rank", "p_ppm", "rejected")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.nonEmpty)
    assert(out.map(_._1) == (1L to out.size.toLong))
    // p_ppm non-decreasing in rank; rejected rows form a prefix
    assert(out.map(_._2) == out.map(_._2).sorted)
    val firstKeep = out.indexWhere(_._3 == 0L)
    if (firstKeep >= 0)
      assert(out.drop(firstKeep).forall(_._3 == 0L),
        "step-up must reject a prefix of the ranked p-values")
  }

  test("timeseries_kalman_level: matches a driver-side recursion exactly") {
    val days = sources.Tables.load(spark, sfDir, "orders")
      .groupBy(to_date($"o_orderdate").as("day")).count()
      .orderBy("day").select($"count".cast("double"))
      .as[Double].collect()
    var x = 0.0; var p = 1000000.0
    days.foreach { y =>
      val pp = p + 25.0
      val k = pp / (pp + 100.0)
      x = x + k * (y - x)
      p = (1.0 - k) * pp
    }
    val r = q("timeseries_kalman_level")
      .select("n_days", "level_ppm", "p_var_ppm")
      .as[(Long, Long, Long)].collect().head
    assert(r._1 == days.length.toLong)
    assert(r._2 == math.floor(1e6 * x).toLong)
    assert(r._3 == math.floor(1e6 * p).toLong)
    // posterior variance sits in (0, steady-state+q]
    assert(r._3 > 0L && r._3 <= 65000000L)
  }

  test("graph_betweenness: dependencies non-negative, per-source bounds hold") {
    val out = q("graph_betweenness")
      .select("node", "n_seeds", "bw_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty && out.size <= 20)
    assert(out.forall(_._3 >= 0L), "Brandes dependency is non-negative")
    // a node may serve as intermediate for at most the 4 sources
    // (suppliers 0-3); self-exclusion per source holds by construction
    assert(out.forall(r => r._2 >= 1L && r._2 <= 4L))
    // arrives in (bw desc, node) order
    assert(out.map(r => (-r._3, r._1)) === out.map(r => (-r._3, r._1)).sorted)
  }

  test("graph_ppr: mass concentrates on seeds, encodings respected") {
    val out = q("graph_ppr")
      .select("node", "ppr", "degree", "is_seed")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty && out.size <= 20)
    assert(out.forall(_._2 >= 0L), "rank mass is non-negative")
    out.filter(_._4 == 1L).foreach { case (n, _, _, _) =>
      assert(n < 16 && n % 2 == 0, s"seed $n outside the seed predicate")
    }
    // teleport goes only to seeds, so the top entry must be a seed
    assert(out.head._4 == 1L, "highest personalized rank must be a seed")
  }

  test("train_epoch_plan: partition of the corpus, shares sum to one") {
    val out = q("train_epoch_plan")
      .select("shard", "n_docs", "sum_tokens", "share_ppm", "order_checksum")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == (0L to 7L))
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.map(_._2).sum == nDocs, "shards must partition the corpus")
    // floor-ppm shares sum to 1e6 minus at most one floor unit per shard
    val shareSum = out.map(_._4).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - 8L)
    // hash balance: no shard more than 2x the fair share of docs
    assert(out.map(_._2).max <= 2 * (nDocs / 8 + 1))
    assert(out.forall(_._5 > 0L), "order checksum pins the permutation")
  }

  test("embedding_quantization_error: int8 error within the theory bound") {
    val out = q("embedding_quantization_error")
      .select("dim", "n", "rel_err_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._1).sorted == (0L to 63L))
    assert(out.map(_._2).distinct.size == 1, "every dim sees every vector")
    // half-step rounding keeps relative MSE tiny: (amax/254)^2 / E[v^2]
    // is ~250 ppm for ~N(0,1) dims with amax ~ 4 sigma; 2000 is generous
    assert(out.forall(r => r._3 >= 0L && r._3 < 2000L),
      s"rel err out of bound: ${out.maxBy(_._3)}")
  }

  test("recsys_ndcg: rates bounded, NDCG defined exactly when hits exist") {
    val out = q("recsys_ndcg")
      .select("segment", "n_users", "hit_rate_bp", "mrr_ppm", "ndcg_bp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(out.nonEmpty && out.forall(_._2 > 0))
    out.foreach { case (seg, _, hr, mrr, ndcg) =>
      assert(hr >= 0L && hr <= 10000L, s"$seg hit rate")
      assert(mrr >= 0L && mrr <= 1000000L, s"$seg mrr")
      assert((hr > 0L) == ndcg.isDefined, s"$seg ndcg defined iff hits")
      ndcg.foreach(v => assert(v >= 0L && v <= 10000L, s"$seg ndcg"))
      // a hit at rank r contributes mrr >= 1e6/10 per hit user, diluted
      // by all users: mrr <= hit_rate (both as fractions of the user set)
      assert(mrr <= hr * 100L, s"$seg mrr cannot exceed hit share")
    }
  }

  test("stats_anderson_darling: matches a driver-side replay exactly") {
    val days = sources.Tables.load(spark, sfDir, "orders")
      .groupBy(to_date($"o_orderdate").as("day")).count()
      .orderBy("count", "day").select($"count".as[Long]).collect()
    val n = days.length
    val s1 = days.sum
    val s2 = days.map(x => x * x).sum
    val mu = s1.toDouble / n
    val sd = math.sqrt((s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1))
    var sFp = 0L
    for (i <- 1 to n) {
      val z = (days(i - 1).toDouble - mu) / sd
      val az = math.abs(z)
      val tt = 1.0 / (1.0 + 0.2316419 * az)
      val tail = (math.exp(-az * az / 2.0) / math.sqrt(2.0 * math.Pi)) *
        (((((1.330274429 * tt - 1.821255978) * tt + 1.781477937) * tt
          - 0.356563782) * tt + 0.319381530) * tt)
      val fz = math.max(1e-15,
        math.min(1.0 - 1e-15, if (z >= 0.0) 1.0 - tail else tail))
      sFp += math.floor(1000000.0 * ((2 * i - 1).toDouble * math.log(fz)
        + (2 * n - 2 * i + 1).toDouble * math.log(1.0 - fz))).toLong
    }
    val a2 = -n.toDouble - sFp.toDouble / 1000000.0 / n
    val a2s = a2 * (1.0 + 0.75 / n + 2.25 / (n.toDouble * n))
    val r = q("stats_anderson_darling")
      .select("n_days", "a2_ppm", "a2_star_ppm", "reject_5pct")
      .as[(Long, Long, Long, Long)].collect().head
    assert(r._1 == n.toLong)
    assert(r._2 == math.floor(1e6 * a2).toLong)
    assert(r._3 == math.floor(1e6 * a2s).toLong)
    assert(r._4 == (if (a2s > 0.787) 1L else 0L))
  }

  test("model_isotonic_calibration: monotone fit preserving pooled means") {
    val out = q("model_isotonic_calibration")
      .select("bin", "n", "n_pos", "raw_ppm", "iso_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.size == 10)
    val iso = out.map(_._5)
    assert(iso == iso.sorted, "isotonic fit must be non-decreasing")
    assert(iso.forall(v => v >= 0L && v <= 1000000L))
    // PAV preserves the weighted mean; each pool's floor loses < 1 ppm
    // per row, so the fixed-point totals differ by less than sum(n)
    val lhs = out.map(r => r._2 * r._5).sum
    val rhs = 1000000L * out.map(_._3).sum
    assert(math.abs(lhs - rhs) < out.map(_._2).sum,
      s"pooled mean drift: $lhs vs $rhs")
  }

  test("timeseries_dtw: matches a driver-side DP, self-pair is zero") {
    import org.apache.spark.sql.functions.{col, coalesce, count, date_trunc, lit}
    val o = sources.Tables.load(spark, sfDir, "orders")
    val c = sources.Tables.load(spark, sfDir, "customer")
    val mon = o.join(c, o("o_custkey") === c("c_custkey"))
      .filter(col("c_nationkey") <= 5)
      .groupBy(col("c_nationkey").cast("long").as("nk"),
        date_trunc("month", col("o_orderdate")).as("mon"))
      .agg(count(lit(1)).as("cnt"))
    val months = o.select(date_trunc("month", col("o_orderdate")).as("mon"))
      .distinct()
    val series = months.crossJoin(spark.range(6).select($"id".as("nk")))
      .join(mon, Seq("nk", "mon"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .orderBy("nk", "mon")
      .select("nk", "cnt").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
    def dtw(a: Seq[Long], b: Seq[Long]): Long = {
      val big = 1000000000000000L
      var prev = Array.fill(b.length + 1)(big); prev(0) = 0L
      for (av <- a) {
        val cur = Array.fill(b.length + 1)(big)
        for (j <- 1 to b.length)
          cur(j) = math.abs(av - b(j - 1)) +
            math.min(math.min(prev(j), prev(j - 1)), cur(j - 1))
        prev = cur
      }
      prev(b.length)
    }
    val out = q("timeseries_dtw")
      .select("nation_b", "dtw_cost")
      .as[(Long, Long)].collect().toMap
    assert(out(0L) == 0L, "self-alignment must cost zero")
    for (nb <- 0L to 5L)
      assert(out(nb) == dtw(series(0L).toSeq, series(nb).toSeq),
        s"nation $nb DP mismatch")
  }

  test("markov_stationary: a probability vector, floor-exact mass") {
    val out = q("markov_stationary")
      .select("state", "stationary_ppm", "empirical_ppm")
      .as[(String, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall(_._2 >= 0L))
    val mass = out.map(_._2).sum
    assert(mass <= 1000000L && mass > 1000000L - out.size,
      s"stationary mass $mass out of floor band")
    val emp = out.map(_._3).sum
    assert(emp <= 1000000L && emp > 1000000L - out.size)
  }

  test("timeseries_holt_winters: matches a driver-side recursion exactly") {
    val xs = sources.Tables.load(spark, sfDir, "orders")
      .groupBy(org.apache.spark.sql.functions.date_trunc("month",
        $"o_orderdate").as("mon"))
      .count().orderBy("mon").select($"count".cast("double"))
      .as[Double].collect()
    assert(xs.length >= 24)
    val m1 = xs.take(12).foldLeft(0.0)(_ + _) / 12.0
    val m2 = xs.slice(12, 24).foldLeft(0.0)(_ + _) / 12.0
    var st = Array(m1, (m2 - m1) / 12.0) ++ xs.take(12).map(_ - m1)
    for (x <- xs.drop(12)) {
      val l2 = 0.2 * (x - st(2)) + 0.8 * (st(0) + st(1))
      val b2 = 0.1 * ((0.2 * (x - st(2)) + 0.8 * (st(0) + st(1))) - st(0)) +
        0.9 * st(1)
      val sn = 0.3 * (x - (0.2 * (x - st(2)) + 0.8 * (st(0) + st(1)))) +
        0.7 * st(2)
      st = Array(l2, b2) ++ st.slice(3, 14) ++ Array(sn)
    }
    val out = q("timeseries_holt_winters")
      .select("h", "level_ppm", "trend_ppm", "forecast_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == (1L to 6L))
    out.foreach { case (h, lv, tr, fc) =>
      assert(lv == math.floor(1e6 * st(0)).toLong)
      assert(tr == math.floor(1e6 * st(1)).toLong)
      val expect = st(0) + h.toDouble * st(1) + st(h.toInt + 1)
      assert(fc == math.floor(1e6 * expect).toLong, s"h=$h")
    }
  }

  test("timeseries_haar_energy: shares partition, block counts halve") {
    val out = q("timeseries_haar_energy")
      .select("level", "n_blocks", "e_num", "share_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L))
    // truncation to a power of two makes block counts exact halvings
    for (i <- 1 until 4)
      assert(out(i)._2 * 2 == out(i - 1)._2, s"level ${i + 1} blocks")
    assert(out.forall(_._3 >= 0L))
    val shares = out.map(_._4).sum
    assert(shares <= 1000000L && shares > 1000000L - 4L)
  }

  test("stats_hodges_lehmann: is a genuine Walsh-average median") {
    val days = sources.Tables.load(spark, sfDir, "orders")
      .groupBy(to_date($"o_orderdate").as("day")).count()
      .select($"count".as[Long]).collect().sorted
    val walsh = (for {
      i <- days.indices; j <- i until days.length
    } yield days(i) + days(j)).sorted
    val k = (walsh.length + 1) / 2
    val r = q("stats_hodges_lehmann")
      .select("hl_x2", "n_pairs", "hl_ppm")
      .as[(Long, Long, Long)].collect().head
    assert(r._2 == walsh.length.toLong)
    assert(r._1 == walsh(k - 1), "lower median of doubled Walsh averages")
    assert(r._3 == r._1 * 500000L)
  }

  test("dq_reconciliation: bands partition the order set") {
    val out = q("dq_reconciliation")
      .select("band", "n_orders")
      .as[(String, Long)].collect().toMap
    val nOrders = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(out.values.sum == nOrders, "every order lands in one band")
    assert(out.keySet.subsetOf(
      Set("exact", "lt_100ppm", "lt_1pct", "gt_1pct", "no_lines")))
  }

  test("dedup_lsh_tuning: S-curve tradeoff is monotone in the band count") {
    val out = q("dedup_lsh_tuning")
      .select("b", "r", "n_cand", "exp_cand_fp", "n_dup", "exp_recall_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(-_._1)
    assert(out.map(t => (t._1, t._2)) ==
      Seq((16L, 1L), (8L, 2L), (4L, 4L), (2L, 8L)))
    assert(out.map(_._3).distinct.size == 1, "same candidate universe")
    assert(out.map(_._5).distinct.size == 1, "same dup stratum")
    // fewer, wider bands: fewer expected candidates AND lower recall
    assert(out.map(_._4) == out.map(_._4).sorted.reverse, "candidates")
    assert(out.map(_._6) == out.map(_._6).sorted.reverse, "recall")
    assert(out.forall(t => t._6 >= 0L && t._6 <= 1000000L))
  }

  test("multimodal_shard_manifest: shards tile each kind without overlap") {
    val out = q("multimodal_shard_manifest")
      .select("kind", "shard", "n_items", "shard_bytes", "first_id", "last_id")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1).toSet == Set("image", "audio", "video"))
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.map(_._3).sum == nDocs, "manifest covers every media row")
    out.groupBy(_._1).foreach { case (kind, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) == (0L until sorted.size.toLong),
        s"$kind shard ids contiguous")
      // id ranges are disjoint and ordered across consecutive shards
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._6 < b._5, s"$kind overlap")
        case _ =>
      }
      // every shard crossed the threshold when it closed, except the last
      sorted.dropRight(1).foreach { r =>
        assert(r._4 >= 1L, s"$kind empty shard") }
    }
  }

  test("stats_energy_distance: nonnegative and below the diameter bound") {
    val r = q("stats_energy_distance")
      .select("n_pairs_xy", "energy_ppm")
      .as[(Long, Long)].collect().head
    assert(r._1 > 0L)
    // E >= 0 always (energy distance is a metric), and E <= 2 E|X-Y|
    // <= 2 max|X-Y| <= 2 * max daily count
    val maxCnt = sources.Tables.load(spark, sfDir, "orders")
      .groupBy(to_date($"o_orderdate")).count()
      .agg(org.apache.spark.sql.functions.max("count")).as[Long]
      .collect().head
    assert(r._2 >= 0L, "energy distance is nonnegative")
    assert(r._2 <= 2000000L * maxCnt)
  }

  test("privacy_dp_mean: release = clipped mean + the emitted noise") {
    val r = q("privacy_dp_mean")
      .select("n", "clipped_mean_ppm", "noise_ppm", "released_mean_ppm")
      .as[(Long, Long, Long, Long)].collect().head
    assert(r._1 > 0L)
    // floor interplay allows 1 ppm of slack between the three floors
    assert(math.abs(r._4 - (r._2 + r._3)) <= 2L,
      s"release ${r._4} vs ${r._2} + ${r._3}")
    // clipping bounds the mean by C = $300k (ppm-of-dollar units)
    assert(r._2 <= 300000L * 1000000L)
  }

  test("embedding_outlier_score: the 5th-percentile fence flags at most ~5%") {
    val out = q("embedding_outlier_score")
      .select("label", "n", "fence_fp", "n_flagged", "worst_cos_fp")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { r =>
      // strictly-below-floor(p05) can flag at most ceil(5%) rows
      assert(r._4 <= r._2 / 20 + 1, s"label ${r._1} flags ${r._4} of ${r._2}")
      assert(r._5 <= r._3, s"label ${r._1} worst above its own fence")
    }
  }

  test("train_crossdup_audit: contamination counted only across splits") {
    val out = q("train_crossdup_audit")
      .select("s_lo", "s_hi", "n_pairs", "n_test_docs")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r._1 <= r._2, "pair labels canonicalized")
      assert(r._4 <= r._3, "distinct docs bounded by pairs")
      if (r._1 == r._2)
        assert(r._4 == 0L, s"within-split ${r._1} is not contamination")
      if (r._1 == "test" && r._2 != "test")
        assert(r._4 > 0L, "the augmented fixture plants cross-split twins")
    }
    // the fixture's planted near-dups must straddle the split somewhere
    assert(out.filter(r => r._1 != r._2).map(_._3).sum > 0L)
  }

  test("events_funnel_windows: conversions monotone in the window bound") {
    val out = q("events_funnel_windows")
      .select("window", "n_signup", "n_converted", "conv_bp")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == Seq("01_1h", "02_6h", "03_24h", "04_all"))
    assert(out.map(_._2).distinct.size == 1, "one signup cohort")
    val conv = out.map(_._3)
    assert(conv == conv.sorted, "wider window cannot lose conversions")
    assert(out.forall(r => r._4 >= 0L && r._4 <= 10000L))
  }

  test("recsys_ild: diversity is a bounded ppm with mean >= min") {
    val out = q("recsys_ild")
      .select("segment", "n_users", "mean_ild_ppm", "min_ild_ppm")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty && out.forall(_._2 > 0L))
    out.foreach { r =>
      assert(r._3 >= 0L && r._3 <= 1000000L, s"${r._1} mean bounds")
      assert(r._4 <= r._3, s"${r._1} min above mean")
    }
  }

  test("graph_sample_fidelity: HT edge estimate lands near truth") {
    val r = q("graph_sample_fidelity")
      .select("n_full", "n_samp", "e_full", "e_est_full", "ks_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r._2 <= r._1, "sampling cannot add nodes")
    assert(r._5 >= 0L && r._5 <= 1000000L)
    // 25% Bernoulli edge sample: the 1/p-rescaled edge count is an
    // unbiased estimator; 20% tolerance is ~10 sigma at this edge count
    assert(math.abs(r._4 - r._3).toDouble / r._3 < 0.2,
      s"estimate ${r._4} vs ${r._3}")
  }

  test("stats_mann_kendall: S bounded by the pair count, flag consistent") {
    val r = q("stats_mann_kendall")
      .select("n_days", "s_stat", "var18", "p_ppm", "trend")
      .as[(Long, Long, Long, Long, Long)].collect().head
    val maxS = r._1 * (r._1 - 1) / 2
    assert(math.abs(r._2) <= maxS)
    assert(r._3 > 0L)
    assert(Set(-1L, 0L, 1L).contains(r._5))
    assert((r._4 < 50000L) == (r._5 != 0L), "flag mirrors the p threshold")
  }

  test("text_novelty_curve: first decile all-new, uniques accumulate") {
    val out = q("text_novelty_curve")
      .select("decile", "n_grams", "n_new", "novelty_ppm", "cum_unique")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == (0L to 9L))
    assert(out.head._4 == 1000000L, "decile 0 has no earlier corpus")
    out.foreach(r => assert(r._3 <= r._2, s"decile ${r._1} new > present"))
    assert(out.map(_._3).sum == out.last._5, "cumulative matches the sum")
  }

  test("recsys_ips_eval: IPS reweighting keeps rates in range") {
    val out = q("recsys_ips_eval")
      .select("segment", "n_users", "hit_rate_bp", "ips_score_ppm")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r._3 >= 0L && r._3 <= 10000L, s"${r._1} hit rate")
      assert(r._4 >= 0L, s"${r._1} ips nonneg")
      // every hit's weight is >= 10 (top-10 item propensity <= 1/10 of
      // interactions only if ultra-dominant; at minimum 1/p >= 1), so
      // ips >= naive rate expressed in the same ppm scale
      assert(r._4 * 10L >= r._3 * 1000L || r._3 == 0L,
        s"${r._1} ips below the naive floor")
    }
  }

  test("customers_revenue_concentration: deciles partition, shares decay") {
    val out = q("customers_revenue_concentration")
      .select("decile", "n_customers", "revenue_share_ppm", "max_cents",
        "min_cents")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == (0L to 9L))
    val nCust = sources.Tables.load(spark, sfDir, "orders")
      .select("o_custkey").distinct().count()
    assert(out.map(_._2).sum == nCust, "deciles partition the customers")
    val shares = out.map(_._3)
    assert(shares == shares.sorted.reverse, "spend-ranked shares decay")
    val tot = shares.sum
    assert(tot <= 1000000L && tot > 1000000L - 10L)
    // decile boundaries respect the ranking
    out.sliding(2).foreach {
      case Seq(a, b) => assert(a._5 >= b._4, "rank boundary order")
      case _ =>
    }
  }

  test("dedup_shingle_sensitivity: longer shingles never raise similarity") {
    val out = q("dedup_shingle_sensitivity")
      .select("shingle_k", "n_pairs", "mean_j_ppm", "n_docs_doomed")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == Seq(2L, 3L, 5L))
    assert(out.forall(_._2 > 0L), "fixture plants near-dups at every k")
    val means = out.map(_._3)
    assert(means == means.sorted.reverse,
      "mean Jaccard is non-increasing in shingle size")
    out.foreach(r => assert(r._4 <= r._2, "doomed docs bounded by pairs"))
  }

  test("timeseries_ses_tuning: a unique argmin over the full grid") {
    val out = q("timeseries_ses_tuning")
      .select("alpha_pct", "sse_fp", "is_best")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == (1L to 9L).map(_ * 10L))
    assert(out.forall(_._2 > 0L))
    val best = out.map(_._2).min
    out.foreach(r => assert((r._3 == 1L) == (r._2 == best)))
    assert(out.count(_._3 == 1L) >= 1)
  }

  test("markov_absorption_time: matches a driver-side chain replay") {
    import org.apache.spark.sql.functions.{col, count, lead, lit}
    val e = sources.Tables.load(spark, sfDir, "events")
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = e.withColumn("nxt", lead(col("event_type"), 1).over(wu))
      .filter(col("nxt").isNotNull)
      .filter(col("event_type") =!= "purchase")
      .groupBy(col("event_type").as("a"), col("nxt").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .as[(String, String, Long)].collect()
    val sts = trans.map(_._1).distinct.sorted
    val k = sts.length
    val idx = sts.zipWithIndex.toMap
    val tot = trans.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val qMat = Array.ofDim[Double](k, k)
    for ((a, b, c) <- trans if b != "purchase" && idx.contains(b))
      qMat(idx(a))(idx(b)) = c.toDouble / tot(a)
    var u = Array.fill(k)(1.0)
    val st = Array.fill(k)(1.0)
    for (_ <- 1 to 59) {
      val nu = Array.tabulate(k) { jj =>
        var s2 = 0.0
        for (ii <- 0 until k) s2 += qMat(jj)(ii) * u(ii)
        s2
      }
      u = nu
      for (jj <- 0 until k) st(jj) += u(jj)
    }
    val out = q("markov_absorption_time")
      .select("state", "exp_steps_ppm", "survival_60_ppm")
      .as[(String, Long, Long)].collect()
      .map { case (a, b, c) => (a, (b, c)) }.toMap
    sts.zipWithIndex.foreach { case (name, i) =>
      val (steps, surv) = out(name)
      assert(steps == math.floor(1e6 * st(i)).toLong, s"$name steps")
      assert(surv == math.floor(1e6 * u(i)).toLong, s"$name survival")
      assert(steps >= 1000000L, s"$name at least one step")
    }
  }

  test("text_rake_keywords: phrases are stopword-free and support-bounded") {
    val out = q("text_rake_keywords")
      .select("phrase", "len", "n_occ", "score_fp")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty && out.size <= 15)
    val stop = Set("the", "a", "an", "and", "or", "of", "to", "in",
      "is", "it", "on", "for")
    out.foreach { r =>
      val words = r._1.split(" ")
      assert(words.length == r._2, s"'${r._1}' len mismatch")
      assert(words.forall(w => !stop(w)), s"'${r._1}' contains a stopword")
      assert(r._2 >= 1L && r._2 <= 4L)
      assert(r._3 >= 3L, "support threshold")
      assert(r._4 > 0L)
    }
    // arrives ranked
    val scores = out.map(_._4)
    assert(scores == scores.sorted.reverse)
  }

  test("timeseries_croston: matches a driver-side recursion exactly") {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum, to_date}
    val o = sources.Tables.load(spark, sfDir, "orders")
    val li = sources.Tables.load(spark, sfDir, "lineitem")
    val top = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("l_partkey")).limit(1)
      .select(col("l_partkey").as("pk"))
    val lines = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(top, li("l_partkey") === col("pk"))
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    val xs = o.select(to_date(col("o_orderdate")).as("day")).distinct()
      .join(lines, Seq("day"), "left")
      .withColumn("q", coalesce(col("q"), lit(0L)))
      .orderBy("day").select($"q".cast("double")).as[Double].collect()
    var z = 0.0; var p = 0.0; var since = 0.0; var started = false
    for (x <- xs) {
      if (!started && x > 0.0) { z = x; p = since + 1.0; since = 0.0; started = true }
      else if (!started) since += 1.0
      else if (x > 0.0) {
        z = z + 0.2 * (x - z); p = p + 0.2 * ((since + 1.0) - p); since = 0.0
      } else since += 1.0
    }
    val r = q("timeseries_croston")
      .select("n_days", "n_demand_days", "z_ppm", "p_ppm", "forecast_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r._1 == xs.length.toLong)
    assert(r._2 == xs.count(_ > 0.0).toLong)
    assert(r._3 == math.floor(1e6 * z).toLong)
    assert(r._4 == math.floor(1e6 * p).toLong)
    assert(r._5 == math.floor(1e6 * (if (p > 0) z / p else 0.0)).toLong)
  }

  test("dq_key_discovery: the declared key is unique, ratios bounded") {
    val out = q("dq_key_discovery")
      .select("candidate", "n_rows", "n_distinct", "uniqueness_ppm", "is_key")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out.size == 5)
    assert(out.map(_._2).distinct.size == 1)
    val byName = out.map(r => r._1 -> r).toMap
    assert(byName("o_orderkey")._5 == 1L, "orderkey is the declared key")
    out.foreach { r =>
      assert(r._3 <= r._2)
      assert(r._4 <= 1000000L)
      assert((r._5 == 1L) == (r._3 == r._2))
    }
  }

  test("timeseries_theta: forecast is the line/level blend at every h") {
    val out = q("timeseries_theta")
      .select("h", "slope_ppm", "level_ppm", "forecast_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == (1L to 6L))
    assert(out.map(_._2).distinct.size == 1, "one fitted slope")
    assert(out.map(_._3).distinct.size == 1, "one smoothed level")
    // successive forecasts differ by ~b/2 per step (ppm floor slack 1)
    val b = out.head._2
    out.sliding(2).foreach {
      case Seq(x, y) =>
        assert(math.abs((y._4 - x._4) - b / 2) <= 1500L,
          s"step ${y._1}: ${y._4 - x._4} vs ${b / 2}")
      case _ =>
    }
  }

  test("stats_turning_points: T bounded by interior points, flag consistent") {
    val r = q("stats_turning_points")
      .select("n_days", "t_stat", "p_ppm", "looks_random")
      .as[(Long, Long, Long, Long)].collect().head
    assert(r._2 >= 0L && r._2 <= r._1 - 2L)
    assert((r._4 == 1L) == (r._3 >= 50000L))
  }

  test("agg_f2_ams: driver replay of the sketch is bit-exact; exact F2 sane") {
    val r = q("agg_f2_ams")
      .select("n_rows", "f2_exact", "f2_est", "err_ppm")
      .as[(Long, Long, Long, Long)].collect().head
    // F2 = sum c^2 >= sum c = n
    assert(r._2 >= r._1)
    // replay the full sketch driver-side with the SAME hash chain
    val keys = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select("l_partkey").as[Long].collect()
    assert(keys.length.toLong == r._1)
    val z = new Array[Long](8)
    keys.foreach { k =>
      val h = graft.functions.HashOps.mix64(k)
      var j = 0
      while (j < 8) {
        z(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L); j += 1
      }
    }
    val est = z.map(v => v * v).sum / 8
    assert(est == r._3, s"driver replay $est vs query ${r._3}")
    assert(r._4 == math.abs(est - r._2) * 1000000L / r._2)
  }

  test("layout_bloom_prune: candidates contain truth; pruning is real") {
    val out = q("layout_bloom_prune")
      .select("probe_id", "n_candidate_files", "n_true_files",
        "n_false_pos", "scan_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == (0L to 4L))
    out.foreach { r =>
      assert(r._3 >= 1L, "probe doc's own file must contain it")
      assert(r._4 >= 0L, "bloom can never false-negative")
      assert(r._2 == r._3 + r._4)
      assert(r._5 < 1000000L, "no pruning at all would read every file")
    }
  }

  test("join_interval_overlap: versions tile the session; totals bounded") {
    val out = q("join_interval_overlap")
      .select("user_id", "session_id", "dur_us", "n_versions", "ov_total_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty && out.size <= 20)
    out.foreach { r =>
      assert(r._4 >= 1L)
      // validity intervals are disjoint per user, so their overlaps with
      // one session can never sum past the session's span
      assert(r._5 >= 0L && r._5 <= r._3,
        s"overlap ${r._5} outside [0, ${r._3}]")
    }
    // the interesting rows exist: some session straddles a version change
    assert(out.head._4 > 1L, "fixture should produce multi-version sessions")
    val nv = out.map(_._4)
    assert(nv == nv.sorted.reverse)
  }

  test("pack_bestfit_eval: packing identities hold per shard and strategy") {
    val out = q("pack_bestfit_eval")
      .select("strategy", "shard", "n_docs", "packed_tokens", "n_seqs",
        "padding_tokens", "waste_ppm", "n_oversize")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out.map(_._1).distinct.sorted == Seq("1_arrival", "2_sorted_desc"))
    out.foreach { r =>
      // capacity conservation: seqs * 512 = packed + padding exactly
      assert(r._5 * 512L == r._4 + r._6,
        s"${r._1}/${r._2}: ${r._5}*512 != ${r._4}+${r._6}")
      assert(r._5 >= (r._4 + 511L) / 512L, "fewer seqs than the LP bound")
      assert(r._7 >= 0L && r._7 < 1000000L)
    }
    // both strategies pack the same docs per shard
    val byShard = out.groupBy(_._2).values
    byShard.foreach { rs =>
      assert(rs.map(r => (r._3, r._4)).distinct.size == 1,
        "strategies disagree on the doc set")
    }
  }

  test("timeseries_stl_strength: strengths are valid shares") {
    val r = q("timeseries_stl_strength")
      .select("n_hours", "f_trend_ppm", "f_seasonal_ppm")
      .as[(Long, Long, Long)].collect().head
    assert(r._1 > 24L)
    assert(r._2 >= 0L && r._2 <= 1000000L)
    assert(r._3 >= 0L && r._3 <= 1000000L)
  }

  test("dedup_simhash_tuning: dup mass separates from the noise floor") {
    val out = q("dedup_simhash_tuning")
      .select("hamming", "n_pairs", "share_ppm")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.forall(r => r._1 >= 0L && r._1 <= 64L))
    assert(out.map(_._3).sum <= 1000000L, "floor shares cannot exceed 1")
    // the planted near-dup stratum shows up at distance 0
    val d0 = out.find(_._1 == 0L).map(_._2).getOrElse(0L)
    assert(d0 > 0L, "exact-dup pairs must collide at hamming 0")
    // the near range (<=3, exhaustive by pigeonhole) is sparser than the
    // far noise floor per distance value on this fixture
    val near = out.filter(_._1 <= 3L).map(_._2).sum
    val far = out.filter(r => r._1 >= 8L && r._1 <= 11L).map(_._2).sum
    assert(near < far, s"expected a valley between dup mass and noise: $near vs $far")
  }

  test("model_cost_curve: one argmin per regime, cost identity holds") {
    val out = q("model_cost_curve")
      .select("r", "thr", "fp", "fn", "cost", "is_best")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.size == 20)
    out.foreach(r => assert(r._5 == r._3 + r._1 * r._4))
    out.groupBy(_._1).foreach { case (r, rows) =>
      assert(rows.count(_._6 == 1L) == 1, s"regime $r needs one argmin")
      val best = rows.find(_._6 == 1L).get
      assert(rows.forall(_._5 >= best._5), s"regime $r argmin not minimal")
    }
    // economics move the operating point: as FN cost rises the argmin
    // threshold can only stay or DROP (accept more positives)
    val bestByR = out.filter(_._6 == 1L).sortBy(_._1).map(_._2)
    assert(bestByR == bestByR.sorted.reverse, s"argmin not monotone: $bestByR")
  }

  test("privacy_noisy_max: exactly one winner, near the true max") {
    val out = q("privacy_noisy_max")
      .select("priority", "n_exact", "noisy", "is_winner")
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(out.size == 5)
    assert(out.count(_._4 == 1L) == 1)
    val winner = out.find(_._4 == 1L).get
    assert(winner._3 == out.map(_._3).max)
    // Laplace(2) noise is tiny vs ~3k counts: the released winner must
    // be within noise range of the true max count
    assert(out.map(_._2).max - winner._2 < 50L)
  }

  test("agg_hll_intersection: inclusion-exclusion identities") {
    val r = q("agg_hll_intersection").collect().head
    val (ea, eb, eu, ei) = (r.getAs[Long]("n_exact_a"),
      r.getAs[Long]("n_exact_b"), r.getAs[Long]("n_exact_u"),
      r.getAs[Long]("n_exact_inter"))
    assert(ei == ea + eb - eu && ei >= 0L)
    assert(eu >= math.max(ea, eb))
    val (sa, sb, su, si) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
      r.getAs[Double]("est_u"), r.getAs[Double]("est_inter"))
    // union sketch is a register max: estimate dominates each side
    assert(su >= sa - 1e-9 && su >= sb - 1e-9)
    assert(math.abs(si - (sa + sb - su)) < 1e-3)
    assert(r.getAs[Long]("err_inter_ppm") < 100000L, "intersection est >10% off")
  }

  test("feature_hashing_tuning: collisions fall monotonically with width") {
    val out = q("feature_hashing_tuning")
      .select("w", "n_terms", "n_buckets_used", "n_colliding_terms",
        "collision_ppm", "occupancy_ppm", "colliding_token_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._1)
    assert(out.map(_._1) == Seq(64L, 256L, 1024L, 4096L))
    assert(out.map(_._2).distinct.size == 1)
    out.foreach { r =>
      assert(r._3 <= math.min(r._1, r._2))
      assert(r._4 <= r._2 && r._4 != 1L, "colliding terms come in groups >=2")
      assert(r._6 <= 1000000L)
    }
    // wider table => no more colliding terms (same hash, more buckets)
    val coll = out.map(_._4)
    assert(coll == coll.sorted.reverse, s"collisions not monotone: $coll")
  }

  test("stats_g_test: G close to Pearson X2 on the same table") {
    val g = q("stats_g_test").select("n", "dof", "g_stat", "reject_at_05")
      .as[(Long, Long, Double, Long)].collect().head
    assert(g._2 == 8L && g._3 >= 0.0)
    assert((g._4 == 1L) == (g._3 > 15.507))
    // the two independence statistics agree to first order
    val chi = q("stats_chi_square").select("chi2").as[Double].collect().head
    assert(math.abs(g._3 - chi) < 0.2 * math.max(1.0, chi),
      s"G ${g._3} vs X2 $chi diverge beyond first-order agreement")
  }

  test("text_js_divergence: symmetric-bounded divergence over all pairs") {
    val out = q("text_js_divergence")
      .select("sa", "sb", "n_terms_union", "jsd_nats")
      .as[(String, String, Long, Double)].collect().toSeq
    val nSrc = (out.map(_._1) ++ out.map(_._2)).distinct.size
    assert(out.size == nSrc * (nSrc - 1) / 2, "one row per unordered pair")
    out.foreach { r =>
      assert(r._1 < r._2)
      assert(r._4 >= -1e-12 && r._4 <= math.log(2.0) + 1e-9,
        s"JSD ${r._4} outside [0, ln 2]")
      assert(r._3 >= 1L)
    }
  }

  test("dedup_impact_audit: election keeps originals, removes copies, misses near-dups") {
    val out = q("dedup_impact_audit")
      .select("stratum", "n_docs", "n_removed", "removed_ppm")
      .as[(String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == Seq("1_original", "2_exact_copy", "3_near_dup"))
    val Seq(orig, copies, near) = out
    assert(orig._3 == 0L, "min-id election must keep every original")
    assert(copies._3 == copies._2 && copies._4 == 1000000L,
      "every exact copy must be removed")
    assert(near._3 == 0L,
      "exact dedup must NOT catch near-dups - that blind spot is the readout")
  }

  test("similarity_range_search: hits respect the radius and contain self") {
    val out = q("similarity_range_search")
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.forall(_._3 >= 0.9 - 1e-9))
    // every query's own vector lives in its best cell: self-hit at cos 1
    (0L until 8L).foreach { qid =>
      val self = out.find(r => r._1 == qid && r._2 == qid)
      assert(self.exists(_._3 > 0.999999), s"query $qid missing self-hit")
    }
  }

  test("embedding_intrinsic_dim: accounting closes, estimate in-range") {
    val r = q("embedding_intrinsic_dim")
      .select("n_points", "n_used", "n_too_few", "n_zero_d1", "id_hat")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(r._1 == r._2 + r._3 + r._4, "every point used or excluded")
    assert(r._2 > 0L)
    // TwoNN cannot exceed the ambient dimension by much, nor be <1
    assert(r._5 >= 1.0 && r._5 <= 64.0 * 1.5, s"implausible ID ${r._5}")
  }

  test("stats_gini_monthly: valid Gini per month, full calendar") {
    val out = q("stats_gini_monthly")
      .select("mon", "n_customers", "gini")
      .as[(java.sql.Timestamp, Long, Double)].collect().toSeq
    assert(out.size >= 24)
    out.foreach { r =>
      assert(r._2 > 0L)
      assert(r._3 >= 0.0 && r._3 < 1.0, s"Gini out of range at ${r._1}")
    }
  }

  test("agg_cms_heavy_change: per-epoch estimates never undercount") {
    val out = q("agg_cms_heavy_change")
      .select("user_id", "exact_a", "exact_b", "exact_delta",
        "est_a", "est_b", "est_delta")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.size == 10)
    out.foreach { r =>
      assert(r._4 == r._2 - r._3 && r._7 == r._5 - r._6)
      assert(r._5 >= r._2, s"user ${r._1} epoch-a undercount")
      assert(r._6 >= r._3, s"user ${r._1} epoch-b undercount")
    }
  }

  test("agg_bloom_cardinality: unsaturated estimate near exact; flag consistent") {
    val r = q("agg_bloom_cardinality")
      .select("n_exact", "bits_set", "m", "saturated", "est", "err_ppm")
      .collect().head
    val (exact, bits, m, sat) = (r.getAs[Long]("n_exact"),
      r.getAs[Long]("bits_set"), r.getAs[Long]("m"), r.getAs[Long]("saturated"))
    assert(bits <= math.min(4L * exact, m), "at most k bits per distinct key")
    assert((sat == 1L) == (bits == m))
    if (sat == 0L) {
      assert(r.getAs[Long]("err_ppm") < 100000L,
        s"fill-ratio estimate >10% off: ${r.getAs[Double]("est")} vs $exact")
    } else assert(r.isNullAt(r.fieldIndex("est")))
  }

  test("survival_weibull_fit: plausible parameters, strong linearity") {
    val r = q("survival_weibull_fit")
      .select("n_points", "k_shape", "lambda_hours", "r2")
      .as[(Long, Double, Double, Double)].collect().head
    assert(r._1 >= 10L)
    assert(r._2 > 0.0 && r._2 < 10.0, s"shape ${r._2} implausible")
    assert(r._3 > 0.0)
    assert(r._4 >= 0.0 && r._4 <= 1.0 + 1e-12)
    // the ECDF transform of a monotone CDF should fit a line well
    assert(r._4 > 0.8, s"Weibull plot badly nonlinear: r2=${r._4}")
  }

  test("orders_mix_drift: one row per consecutive-month pair, JSD bounded") {
    val out = q("orders_mix_drift")
      .select("mon", "n_month", "n_next", "jsd_nats")
      .as[(java.sql.Timestamp, Long, Long, Double)].collect().toSeq
    val nMonths = q("stats_gini_monthly").count()
    assert(out.size == nMonths - 1, "every consecutive pair, nothing else")
    out.foreach { r =>
      assert(r._2 > 0L && r._3 > 0L)
      assert(r._4 >= -1e-12 && r._4 <= math.log(2.0) + 1e-9)
    }
  }

  test("similarity_ivf_cell_stats: worst case dominates the uniform model") {
    val out = q("similarity_ivf_cell_stats")
      .select("nprobe", "k", "n", "avg_scan_ppm", "worst_scan_ppm", "cv2_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._1)
    assert(out.map(_._1) == Seq(1L, 2L, 4L, 8L))
    assert(out.map(r => (r._2, r._3, r._6)).distinct.size == 1)
    out.foreach { r =>
      // top-p cells hold at least p/k of the mass (floor slack 1 ppm each)
      assert(r._5 + 1 >= r._4, s"worst < avg at nprobe ${r._1}")
      assert(r._6 >= 0L, "cv2 is nonnegative by Cauchy-Schwarz")
    }
    // worst-case scan share grows with nprobe
    val ws = out.map(_._5)
    assert(ws == ws.sorted)
  }

  test("text_code_detect: classifies EXACTLY the injected docs") {
    val out = q("text_code_detect")
      .select("doc_id", "is_code", "kw_hits", "sym_bp")
      .as[(Long, Boolean, Long, Long)].collect().toSeq
    val flagged = out.filter(_._2).map(_._1).toSet
    val injected = out.map(_._1).filter(_ % 6 == 0).toSet
    assert(flagged == injected,
      s"false pos ${(flagged -- injected).size}, false neg ${(injected -- flagged).size}")
    // the injected snippet carries int/for/return → ≥3 keyword hits and
    // a symbol fraction well past the 1% gate; clean docs read zero
    out.foreach { case (id, _, kw, bp) =>
      if (id % 6 == 0) assert(kw >= 3L && bp >= 100L, s"doc $id: kw=$kw bp=$bp")
    }
  }

  test("sample_ess: ESS formula bounds and exact recomputation") {
    val rows = q("sample_ess")
      .select("source", "n_docs", "sum_w", "sum_w2", "ess", "ess_ratio")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, sw, sw2, ess, ratio) =>
      // 1 ≤ ESS ≤ n (Cauchy-Schwarz), with equality at uniform weights
      assert(ess >= 1.0 - 1e-9 && ess <= n.toDouble + 1e-9, s"$src: ess=$ess n=$n")
      val raw = sw.toDouble * sw.toDouble / sw2.toDouble
      assert(ess == BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, src)
      assert(ratio == BigDecimal(raw / n.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, src)
    }
  }

  test("similarity_kcenter_coreset: greedy invariants") {
    val rows = q("similarity_kcenter_coreset")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq.sortBy(_._1)
    assert(rows.map(_._1) == (1L to 8L))
    assert(rows.map(_._2).distinct.size == 8, "selected ids must be distinct")
    assert(rows.head._3.isEmpty && rows.tail.forall(_._3.nonEmpty))
    // the max-min distance can only SHRINK as centers are added —
    // the defining invariant of the greedy farthest-point walk
    val radii = rows.tail.map(_._3.get)
    assert(radii == radii.sorted.reverse, radii.toString)
    assert(radii.last > 0L, "degenerate selection (all points identical)")
  }

  test("embedding_isotropy: bounds and direct recomputation") {
    val row = q("embedding_isotropy").head()
    val n = row.getLong(row.fieldIndex("n"))
    val cos = row.getDouble(row.fieldIndex("avg_pairwise_cos"))
    val rl = row.getDouble(row.fieldIndex("resultant_len"))
    // hard bounds: mean pairwise cosine of unit vectors ∈ [−1/(n−1), 1],
    // resultant length ∈ [0, 1]
    assert(cos >= -1.0 / (n - 1) - 1e-9 && cos <= 1.0 + 1e-9, cos)
    assert(rl >= 0.0 && rl <= 1.0 + 1e-9, rl)
    // identity linking the two: cos = (n²·rl² − n)/(n(n−1)), up to the
    // two independent 1e-6 output roundings
    val viaRl = (n.toDouble * n * rl * rl - n) / (n.toDouble * (n - 1))
    assert(math.abs(cos - viaRl) < 1e-3, s"$cos vs $viaRl")
    // the synthetic embeddings are isotropic by construction
    assert(math.abs(cos) < 0.01, s"unexpected anisotropy: $cos")
  }

  test("mixture_temperature_sweep: shares are a flattening family") {
    val rows = q("mixture_temperature_sweep")
      .select("tau", "domain", "n_docs", "share")
      .as[(Double, String, Long, Double)].collect().toSeq
    val byTau = rows.groupBy(_._1)
    assert(byTau.keySet == Set(1.0, 0.75, 0.5, 0.25))
    // each temperature's shares sum to 1 (up to the 1e-6 rounding grid)
    byTau.foreach { case (tau, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-4, s"tau=$tau")
      assert(rs.map(_._2).toSet.size == 5, s"tau=$tau domains")
    }
    // flattening is monotone: the head domain's share shrinks as tau
    // drops, the smallest domain's share grows — toward uniform 1/5
    val head = byTau.map { case (tau, rs) => tau -> rs.maxBy(_._3)._4 }
    val tail = byTau.map { case (tau, rs) => tau -> rs.minBy(_._3)._4 }
    for (Seq(lo, hi) <- Seq(0.25, 0.5, 0.75, 1.0).sliding(2).toSeq) {
      assert(head(lo) < head(hi), s"head share must shrink: $lo vs $hi")
      assert(tail(lo) > tail(hi), s"tail share must grow: $lo vs $hi")
    }
    assert(head(0.25) > 0.2 && tail(0.25) < 0.2, "tau>0 never reaches uniform")
  }

  test("decontaminate_ngram_overlap: designed contamination flagged, domain complete") {
    val rows = q("decontaminate_ngram_overlap").collect()
    val byId = rows.map(r => r.getAs[Long]("train_id") -> r).toMap
    val baseIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // domain completeness: every augmented train doc reports, even clean ones
    val expectedTrain = baseIds.map(_ + 1000000L) ++
      baseIds.filter(_ % 5 == 0).map(_ + 2000000L)
    assert(byId.keySet == expectedTrain,
      s"missing=${(expectedTrain -- byId.keySet).take(5)} extra=${(byId.keySet -- expectedTrain).take(5)}")
    rows.foreach { r =>
      val (ng, nh, ppm) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"),
        r.getAs[Long]("hit_ppm"))
      assert(ng >= 1 && nh >= 0 && nh <= ng && ppm == nh * 1000000L / ng, r.toString)
      assert(r.getAs[Long]("flag_any") == (if (nh >= 1) 1L else 0L), r.toString)
      assert(r.getAs[Long]("flag_high") == (if (ppm >= 500000L) 1L else 0L), r.toString)
    }
    // recall 1.0 on the designed contamination: every EXACT COPY of a
    // bench doc (%97 slice) is fully contaminated...
    for (b <- baseIds if b % 97 == 0) {
      assert(byId(b + 1000000L).getAs[Long]("hit_ppm") == 1000000L, s"copy of bench $b")
      // ...and its near-dup tail (if generated) is flagged but < 100%
      // contaminated: the appended tail manufactures fresh mixed grams
      if (b % 5 == 0) {
        val t = byId(b + 2000000L)
        assert(t.getAs[Long]("flag_any") == 1L && t.getAs[Long]("hit_ppm") < 1000000L, t.toString)
      }
    }
  }

  test("decontaminate_multi_bench: per-bench attribution, fixture discriminates at the gate SF") {
    // sf0.01: the %97 and %89 slices share only doc 0, so the fixture
    // has b1-only and b2-only contamination to attribute (at sf0.001
    // both slices collapse to {0} and nothing discriminates)
    val gate = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("decontaminate_multi_bench")(spark, gate).collect()
    val byId = rows.map(r => r.getAs[Long]("train_id") -> r).toMap
    rows.foreach { r =>
      val (ng, h1, h2) = (r.getAs[Long]("n_grams"),
        r.getAs[Long]("hit_b1"), r.getAs[Long]("hit_b2"))
      assert(ng >= 1 && h1 >= 0 && h1 <= ng && h2 >= 0 && h2 <= ng, r.toString)
      assert(r.getAs[Long]("flag_b1") == (if (h1 >= 1) 1L else 0L), r.toString)
      assert(r.getAs[Long]("flag_b2") == (if (h2 >= 1) 1L else 0L), r.toString)
    }
    val baseIds = spark.read.parquet(s"$gate/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // exact copies of single-bench docs attribute to THAT bench only
    for (b <- baseIds if b % 97 == 0 ^ b % 89 == 0) {
      val r = byId(b + 1000000L)
      val (expect1, expect2) = (if (b % 97 == 0) (1L, 0L) else (0L, 1L))
      assert(r.getAs[Long]("flag_b1") == expect1 &&
        r.getAs[Long]("flag_b2") == expect2, s"doc $b: $r")
    }
    // doc 0 sits in both slices: its copy is fully double-contaminated
    val r0 = byId(1000000L)
    assert(r0.getAs[Long]("hit_b1") == r0.getAs[Long]("n_grams") &&
      r0.getAs[Long]("hit_b2") == r0.getAs[Long]("n_grams"), r0.toString)
    // both single-bench cases actually occur in the fixture
    assert(baseIds.exists(b => b % 97 == 0 && b % 89 != 0) &&
      baseIds.exists(b => b % 89 == 0 && b % 97 != 0))
  }

  test("provenance_license_gate: counts conserve, gate matches the ppm policy") {
    val rows = q("provenance_license_gate").collect()
    val nSources = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source").distinct().count()
    assert(rows.length.toLong == nSources)
    rows.foreach { r =>
      def g(c: String) = r.getAs[Long](c)
      // license composition partitions the source
      assert(g("n_pd") + g("n_ccby") + g("n_ccbysa") + g("n_ccnc") + g("n_prop") == g("n_docs"), r.toString)
      assert(g("n_license_ok") == g("n_pd") + g("n_ccby") + g("n_ccbysa"), r.toString)
      // trainable/conflict partition the license-ok docs
      assert(g("n_trainable") + g("n_conflict") == g("n_license_ok"), r.toString)
      assert(g("n_trainable") <= g("n_robots_ok"), r.toString)
      assert(g("conflict_ppm") == g("n_conflict") * 1000000L / g("n_docs"), r.toString)
      val expected = if (g("conflict_ppm") >= 150000L) "drop"
        else if (g("conflict_ppm") >= 50000L) "review" else "keep"
      assert(r.getAs[String]("source_gate") == expected, r.toString)
    }
    // the per-source fnv64 robots band must actually differentiate the
    // fixture: at least two distinct gate verdicts across sources
    assert(rows.map(_.getAs[String]("source_gate")).toSet.size >= 2)
  }
}
