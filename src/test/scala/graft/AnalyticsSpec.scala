package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.unsafe.types.UTF8String

/** Semantic invariants / third-implementation recomputes for the
  * round-8 fifth-sitting analytics batch (cohort LTV, closeness,
  * hashing trick, bootstrap, spatial grid, Theil–Sen, Kruskal–Wallis)
  * on sf0.001 — properties the DuckDB oracle alone would not prove. */
class AnalyticsSpec extends SparkSpec {

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  private def fnv(s: String): Long =
    functions.HashOps.fnv64(UTF8String.fromString(s))

  test("orders_cohort_ltv: running sums close, cohort month 0 holds every member") {
    val rows = q("orders_cohort_ltv")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, rs) =>
      val sorted = rs.sortBy(_._2)
      // offset 0 exists and contains the whole cohort (everyone's first
      // order lands there by construction of the cohort)
      assert(sorted.head._2 == 0, s"cohort $cohort missing offset 0")
      assert(sorted.head._3 == sorted.head._6,
        s"cohort $cohort offset-0 actives != cohort size")
      // cum_rev_cents is exactly the running sum of rev_cents
      var cum = 0L
      sorted.foreach { case (_, _, active, rev, cumGot, size, ltv) =>
        cum += rev
        assert(cumGot == cum, s"cohort $cohort cumulative drift")
        assert(active >= 1L && active <= size)
        assert(ltv == cum / size)
      }
    }
  }

  test("graph_closeness: equals a driver BFS from the 8 seeds") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_suppkey", "l_partkey")
      .collect().map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1)).distinct
    val adj = (li ++ li.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => (n, es.map(_._2).toSet) }
    val seeds = li.map(_._1).filter(_ < 16).distinct
    assert(seeds.nonEmpty)
    val dist = scala.collection.mutable.Map[(Long, Long), Long]()
    seeds.foreach { s0 =>
      var frontier = Set(s0)
      dist((s0, s0)) = 0L
      for (d <- 1L to 4L) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .filter(n => !dist.contains((n, s0)))
        frontier.foreach(n => dist((n, s0)) = d)
      }
    }
    val harm = dist.toSeq.filter(_._2 > 0)
      .groupBy(_._1._1)
      .map { case (n, ds) =>
        (n, ds.size.toLong, ds.map(d => 1000000L / d._2).sum)
      }.toSeq
    val expected = harm.sortBy(t => (-t._3, -t._2, t._1)).take(20)
    val got = q("graph_closeness")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"${got.take(3)} vs ${expected.take(3)}")
  }

  test("feature_hashing: equals a driver recompute over raw tokens") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val perDoc = docs.flatMap { case (id, text) =>
      val t = Option(text).map(_.trim).getOrElse("")
      val toks = if (t.isEmpty) Array.empty[String]
                 else t.toLowerCase.split("\\s+")
      toks.map { term =>
        val h = fnv(term)
        val bucket = ((h % 64) + 64) % 64
        val sgn = if (math.floorMod(h >> 6, 2L) == 0L) 1L else -1L
        ((id, bucket), (sgn, term))
      }
    }.groupBy(_._1).map { case ((id, b), vs) =>
      ((id, b), (vs.map(_._2._1).sum, vs.map(_._2._2).distinct.size.toLong))
    }.filter(_._2._1 != 0L)
    val expected = perDoc.toSeq.groupBy(_._1._2).map { case (b, vs) =>
      (b, (vs.size.toLong, vs.map(_._2._1).sum, vs.map(_._2._1.abs).sum,
        vs.map(_._2._1.abs).max, vs.map(_._2._2).max))
    }
    val got = q("feature_hashing")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, s"${got.size} buckets vs ${expected.size}")
    assert(got.keys.forall(b => b >= 0 && b < 64))
  }

  test("stats_bootstrap: rank order sane, full mean and one replicate replayed") {
    val r = q("stats_bootstrap").head()
    def g(c: String) = r.getLong(r.fieldIndex(c))
    assert(g("n_reps") == 32L)
    assert(g("boot_min") <= g("boot_lo") && g("boot_lo") <= g("boot_med"))
    assert(g("boot_med") <= g("boot_hi") && g("boot_hi") <= g("boot_max"))
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .collect().map(x => (x.getLong(0), math.round(x.getDouble(1) * 100))).toSeq
    assert(g("mean_centi_full") == 100L * o.map(_._2).sum / o.size)
    // replay replicate 0's Poisson weights and mean; it must land inside
    // the emitted min/max envelope
    def w(u: Long): Long =
      if (u < 367879) 0 else if (u < 735759) 1 else if (u < 919699) 2
      else if (u < 981012) 3 else if (u < 996340) 4 else if (u < 999406) 5
      else if (u < 999917) 6 else 7
    val ws = o.map { case (k, c) =>
      (w(math.floorMod(fnv(s"$k|0"), 1000000L)), c) }
    val m0 = 100L * ws.map(p => p._1 * p._2).sum / ws.map(_._1).sum
    assert(m0 >= g("boot_min") && m0 <= g("boot_max"),
      s"replicate-0 mean $m0 outside [${g("boot_min")}, ${g("boot_max")}]")
    // weights look Poisson(1): mean within 10% of 1 at n=1500
    val wbar = ws.map(_._1).sum.toDouble / ws.size
    assert(math.abs(wbar - 1.0) < 0.1, s"weight mean $wbar")
  }

  test("join_spatial_grid: equals the brute-force radius join") {
    val p = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_retailprice", "p_size")
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 100),
        r.getInt(2).toLong)).toSeq
    val expected = (for {
      (ia, xa, ya) <- p; (ib, xb, yb) <- p
      if ia < ib && math.abs(xa - xb) <= 100 && math.abs(ya - yb) <= 1
    } yield (ia, ib, xb - xa, yb - ya)).toSet
    val got = q("join_spatial_grid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == expected, s"${got.size} vs ${expected.size}")
    assert(got.nonEmpty)
  }

  test("timeseries_theil_sen: equals the brute-force pairwise-slope median") {
    val e = sources.Tables.load(spark, sfDir, "events")
      .selectExpr("user_id", "event_id", "unix_millis(ts) AS tms",
        "CAST(round(value * 100) AS BIGINT) AS vc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val expected = e.groupBy(_._1).flatMap { case (u, rows) =>
      val pairs = for {
        (_, ia, ta, va) <- rows; (_, ib, tb, vb) <- rows
        if (ta < tb || (ta == tb && ia < ib)) && ta != tb
      } yield (((vb - va) * 1000000000L) / (tb - ta), ia, ib)
      if (pairs.isEmpty) None
      else {
        val sorted = pairs.sortBy(p => (p._1, p._2, p._3))
        val m = sorted.size
        Some((u, (rows.size.toLong, m.toLong, sorted((m + 1) / 2 - 1)._1)))
      }
    }
    val got = q("timeseries_theil_sen")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == expected.toMap, s"${got.size} vs ${expected.size}")
    assert(got.nonEmpty)
  }

  test("stats_anova_f: F and eta2 recomputed directly; group sizes exact") {
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_mktsegment", "c_acctbal")
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .toSeq
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    val n = c.size.toDouble
    val by = segs.map(s => c.filter(_._1 == s).map(_._2))
    val sterm = by.map(xs =>
      xs.sum.toDouble * xs.sum.toDouble / xs.size.toDouble).sum
    val stot = c.map(_._2).sum.toDouble
    val qtot = c.map(x => x._2.toDouble * x._2.toDouble).sum
    val ssb = sterm - stot * stot / n
    val ssw = qtot - sterm
    val f = ssb * (n - 5.0) / (ssw * 4.0)
    val eta2 = ssb / (qtot - stot * stot / n)
    val row = q("stats_anova_f").head()
    def g(cn: String) = row.getLong(row.fieldIndex(cn))
    assert(g("n") == c.size.toLong)
    assert(segs.indices.forall(i =>
      g(s"n${i + 1}") == by(i).size.toLong))
    assert(math.abs(g("f_ppm") / 1e6 - f) < 1e-3, s"${g("f_ppm")} vs $f")
    assert(math.abs(g("eta2_ppm") / 1e6 - eta2) < 1e-3)
    assert(g("eta2_ppm") >= 0L && g("eta2_ppm") <= 1000000L)
  }

  test("stats_permutation_test: observed gap replayed; p-value well-formed") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getString(1),
        math.round(r.getDouble(2) * 100)))
      .filter(r => r._2 == "1-URGENT" || r._2 == "5-LOW").toSeq
    val (as, bs) = o.partition(_._2 == "1-URGENT")
    val obs = math.abs(100L * as.map(_._3).sum / as.size -
      100L * bs.map(_._3).sum / bs.size)
    val row = q("stats_permutation_test").head()
    def g(cn: String) = row.getLong(row.fieldIndex(cn))
    assert(g("n") == o.size.toLong && g("n_a") == as.size.toLong)
    assert(g("obs_diff_centi") == obs)
    assert(g("n_perms") == 64L)
    assert(g("n_ge") >= 0L && g("n_ge") <= 64L)
    assert(g("p_ppm") == g("n_ge") * 1000000L / 64L)
    // replicate 0 replayed end-to-end must produce a gap the engine
    // could have counted (sanity on the weight threshold arithmetic)
    val thr = as.size.toLong * 1000000L / o.size
    val (pa, pb) = o.partition(r =>
      math.floorMod(fnv(s"${r._1}#0"), 1000000L) < thr)
    assert(pa.nonEmpty && pb.nonEmpty)
  }

  test("timeseries_changepoint: equals the driver argmax of the exact CUSUM") {
    val e = sources.Tables.load(spark, sfDir, "events")
      .selectExpr("CAST(date_trunc('day', ts) AS TIMESTAMP_NTZ) AS d",
        "CAST(round(value * 100) AS BIGINT) AS vc")
      .collect().map(r => (r.getAs[java.time.LocalDateTime](0),
        r.getLong(1))).toSeq
    val daily = e.groupBy(_._1).map { case (d, xs) =>
      (d, xs.map(_._2).sum) }.toSeq.sortBy(_._1)
    val n = daily.size.toLong
    val total = daily.map(_._2).sum
    var cum = 0L
    val gs = daily.zipWithIndex.init.map { case ((d, x), i) =>
      cum += x
      (d, i + 1L, n * cum - (i + 1L) * total, cum)
    }
    val best = gs.minBy(t => (-math.abs(t._3), t._1))
    val row = q("timeseries_changepoint").head()
    assert(row.getAs[java.time.LocalDateTime]("split_day") == best._1)
    assert(row.getAs[Long]("t_split") == best._2)
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Long]("g_abs") == math.abs(best._3))
    assert(row.getAs[Long]("pre_mean_centi") == 100L * best._4 / best._2)
    assert(row.getAs[Long]("post_mean_centi") ==
      100L * (total - best._4) / (n - best._2))
  }

  test("events_user_lifecycle: growth accounting closes over the user set") {
    val rows = q("events_user_lifecycle")
      .collect().map(r => (r.getAs[java.time.LocalDateTime](0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toSeq
    assert(rows.nonEmpty)
    // actives decompose exactly; churn never negative
    rows.foreach { case (w, (act, nw, ret, res, chu)) =>
      assert(act == nw + ret + res, s"week $w decomposition")
      assert(chu >= 0L, s"week $w negative churn")
    }
    // every user is new exactly once
    val users = sources.Tables.load(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_._2._2).sum == users)
    // churn bookkeeping: actives(prev week) - retained(w)
    val byW = rows.toMap
    rows.foreach { case (w, (_, _, ret, _, chu)) =>
      val prev = byW.get(w.minusDays(7)).map(_._1).getOrElse(0L)
      assert(chu == prev - ret, s"week $w churn vs $prev - $ret")
    }
  }

  test("orders_abc_analysis: classes recomputed; shares close to one million") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_partkey", "l_extendedprice")
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .toSeq
    val rev = li.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      .toSeq.sortBy(t => (-t._2, t._1))
    val total = rev.map(_._2).sum
    var cum = 0L
    val classed = rev.map { case (p, rc) =>
      cum += rc
      val cls = if (cum * 100 <= total * 80) "A"
                else if (cum * 100 <= total * 95) "B" else "C"
      (cls, rc)
    }
    val expected = classed.groupBy(_._1).map { case (c, xs) =>
      (c, (xs.size.toLong, xs.map(_._2).sum,
        xs.map(_._2).sum * 1000000L / total))
    }
    val got = q("orders_abc_analysis")
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected, s"$got vs $expected")
    // floor-ppm shares can only undershoot one million
    val s = got.values.map(_._3).sum
    assert(s > 999000L && s <= 1000000L, s"shares sum $s")
  }

  test("text_lexical_diversity: per-doc profile equals raw token counts") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = docs.flatMap { case (id, text) =>
      val t = Option(text).map(_.trim).getOrElse("")
      val toks = if (t.isEmpty) Array.empty[String]
                 else t.toLowerCase.split("\\s+")
      if (toks.isEmpty) None
      else {
        val tf = toks.groupBy(identity).map { case (_, v) => v.length }
        val nTok = toks.length.toLong
        val nTyp = tf.size.toLong
        val nHap = tf.count(_ == 1).toLong
        Some((id, (nTok, nTyp, nHap,
          nTyp * 1000000L / nTok, nHap * 1000000L / nTyp)))
      }
    }.toMap
    val got = q("text_lexical_diversity")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, s"${got.size} vs ${expected.size}")
  }

  test("events_anomaly_rate_spike: z replayed from exact counts; flags consistent") {
    val e = sources.Tables.load(spark, sfDir, "events")
      .selectExpr("event_type", "CAST(date_trunc('day', ts) AS TIMESTAMP_NTZ) AS d")
      .collect().map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1)))
      .toSeq
    val daily = e.groupBy(identity).map { case ((t, d), v) =>
      (t, d, v.size.toLong) }.toSeq
    val expected = daily.groupBy(_._1).flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.zipWithIndex.collect { case ((t, d, x), i) if i >= 7 =>
        val s7 = sorted.slice(i - 7, i).map(_._3).sum
        val z = math.floor(1000000.0 * (x.toDouble - s7.toDouble / 7.0) /
          math.sqrt(s7.toDouble / 7.0)).toLong
        ((t, d), (x, s7, z, z > 3000000L))
      }
    }
    val got = q("events_anomaly_rate_spike")
      .collect().map(r => ((r.getString(0), r.getAs[java.time.LocalDateTime](1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got == expected.toMap, s"${got.size} vs ${expected.size}")
    assert(got.nonEmpty)
  }

  test("orders_interarrival: gap statistics equal a driver replay") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey",
        "CAST(o_orderdate AS DATE) AS d")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.sql.Date](2).toLocalDate)).toSeq
    val expected = o.groupBy(_._1).flatMap { case (c, rows) =>
      val sorted = rows.sortBy(r => (r._3.toEpochDay, r._2))
      val gaps = sorted.sliding(2).collect {
        case Seq(a, b) => b._3.toEpochDay - a._3.toEpochDay }.toSeq
      val sum = gaps.sum
      if (gaps.size < 2 || sum <= 0) None
      else {
        val n = gaps.size.toLong
        val sumsq = gaps.map(g => g * g).sum
        val cv = math.floor(1000000.0 *
          math.sqrt((n.toDouble * sumsq.toDouble -
            sum.toDouble * sum.toDouble) / n.toDouble) /
          (sum.toDouble / n.toDouble)).toLong
        Some(c -> ((n, sum, gaps.min, gaps.max, sum * 1000L / n, cv)))
      }
    }
    val got = q("orders_interarrival")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expected.toMap, s"${got.size} vs ${expected.size}")
    assert(got.nonEmpty)
  }

  test("features_point_in_time: no feature reads past its label; values replayed") {
    val e = sources.Tables.load(spark, sfDir, "events")
      .selectExpr("user_id", "event_id", "unix_millis(ts) AS tms",
        "event_type", "CAST(round(value * 100) AS BIGINT) AS vc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSeq
    val labels = e.filter(_._4 == "purchase")
    val expected = labels.map { case (u, id, lms, _, _) =>
      val clicks = e.filter(r => r._4 == "click" && r._1 == u && r._3 <= lms)
      val last = if (clicks.isEmpty) None
        else Some(clicks.maxBy(r => (r._3, r._5))._5)
      val n7 = e.count(r => r._1 == u && r._3 < lms &&
        r._3 >= lms - 7L * 86400000L).toLong
      id -> ((u, last, n7))
    }.toMap
    val got = q("features_point_in_time")
      .collect().map(r => (r.getLong(0), (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4)))).toMap
    assert(got == expected, s"${got.size} vs ${expected.size}")
    assert(got.nonEmpty)
    // the fixture must exercise both a real match and a no-history label,
    // and some labels must have genuine prior-week activity
    assert(got.values.exists(_._2.isDefined))
    assert(got.values.exists(_._3 > 0L))
  }

  test("graph_assortativity: r recomputed from raw degrees; bipartite sign sane") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_suppkey", "l_partkey")
      .collect().map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1)).distinct
    val und = li ++ li.map(e => (e._2, e._1))
    val deg = und.groupBy(_._1).map { case (n, es) => (n, es.size.toLong) }
    val xs = und.map { case (s, d) => (deg(s), deg(d)) }
    val n = xs.size.toDouble
    val sx = xs.map(_._1).sum.toDouble
    val sxx = xs.map(p => p._1 * p._1).sum.toDouble
    val sxy = xs.map(p => p._1 * p._2).sum.toDouble
    val r = (n * sxy - sx * sx) / (n * sxx - sx * sx)
    val row = q("graph_assortativity").head()
    assert(row.getAs[Long]("n_edges") == und.size.toLong)
    assert(row.getAs[Long]("sum_deg") == xs.map(_._1).sum)
    assert(math.abs(row.getAs[Long]("r_ppm") / 1e6 - r) < 1e-3)
    assert(math.abs(r) <= 1.0)
  }

  test("graph_modularity: Q recomputed exactly; planted structure detected") {
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_nationkey")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toSeq
    val nation = c.toMap
    val e0 = (for {
      (a, na) <- c; (b2, nb) <- c
      if (b2 > a && b2 <= a + 100 && nb == na) || b2 == a + 1
    } yield (a, b2)).distinct
    val und = e0 ++ e0.map(e => (e._2, e._1))
    val m2 = und.size.toLong
    val intra = und.count(e => nation(e._1) == nation(e._2)).toLong
    val deg = und.groupBy(_._1).map { case (n, es) => (n, es.size.toLong) }
    val degC = deg.toSeq.groupBy(p => nation(p._1))
      .map { case (_, v) => v.map(_._2).sum }
    val sumDegSq = degC.map(d => d * d).sum
    val qPpm = (BigInt(1000000) * (BigInt(intra) * m2 - sumDegSq) /
      (BigInt(m2) * m2)).toLong
    val row = q("graph_modularity").head()
    assert(row.getAs[Long]("m2") == m2)
    assert(row.getAs[Long]("intra") == intra)
    assert(row.getAs[Long]("n_communities") == degC.size.toLong)
    assert(row.getAs[Long]("sum_deg_sq") == sumDegSq)
    assert(row.getAs[Long]("q_ppm") == qPpm)
    // the nation partition genuinely beats random wiring on the planted
    // graph, and the chain noise keeps it honestly below perfect
    assert(row.getAs[Long]("q_ppm") > 500000L, s"q=${row.getAs[Long]("q_ppm")}")
    assert(row.getAs[Long]("q_ppm") < 1000000L)
  }

  test("stats_levene: Brown-Forsythe F recomputed from raw deviations") {
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_mktsegment", "c_acctbal")
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .toSeq
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    // Spark percentile(x, .5): sorted, pos = .5(n-1), linear interp
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val p = 0.5 * (s.size - 1)
      val lo = s(p.toInt); val hi = s(math.ceil(p).toInt)
      math.round(2.0 * (lo + (p - p.toInt) * (hi - lo)))
    }
    val zBySeg = segs.map { sg =>
      val xs = c.filter(_._1 == sg).map(_._2)
      val m2 = med2(xs)
      xs.map(x => math.abs(2 * x - m2))
    }
    val n = zBySeg.map(_.size).sum.toDouble
    val sterm = zBySeg.map(z =>
      z.sum.toDouble * z.sum.toDouble / z.size.toDouble).sum
    val stot = zBySeg.map(_.sum).sum.toDouble
    val qtot = zBySeg.flatMap(_.map(z => z.toDouble * z.toDouble)).sum
    val f = (sterm - stot * stot / n) * (n - 5.0) / ((qtot - sterm) * 4.0)
    val row = q("stats_levene").head()
    def g(cn: String) = row.getLong(row.fieldIndex(cn))
    assert(g("n") == c.size.toLong)
    assert(segs.indices.forall(i =>
      g(s"n${i + 1}") == zBySeg(i).size.toLong))
    assert(math.abs(g("f_ppm") / 1e6 - f) < 1e-3, s"${g("f_ppm")} vs $f")
  }

  test("stats_runs_test: runs replayed from the daily sign sequence") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(date_trunc('day', o_orderdate) AS DATE) AS d",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getAs[java.sql.Date](0).toLocalDate,
        r.getLong(1))).toSeq
    val daily = o.groupBy(_._1).map { case (d, xs) => (d, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1.toEpochDay)
    val signs = daily.sliding(2).collect {
      case Seq((_, a), (_, b)) if a != b => if (b > a) 1L else 0L }.toSeq
    val n = signs.size.toLong
    val nPlus = signs.count(_ == 1L).toLong
    val nMinus = n - nPlus
    val r = 1L + signs.sliding(2).count {
      case Seq(a, b) => a != b; case _ => false }
    val mu = 2.0 * nPlus * nMinus / n + 1.0
    val sig = math.sqrt(2.0 * nPlus * nMinus *
      (2.0 * nPlus * nMinus - n) / (n.toDouble * n * (n - 1.0)))
    val z = (r - mu) / sig
    val row = q("stats_runs_test").head()
    def g(cn: String) = row.getLong(row.fieldIndex(cn))
    assert(g("n") == n && g("n_plus") == nPlus && g("n_minus") == nMinus)
    assert(g("r_runs") == r)
    assert(math.abs(g("z_ppm") / 1e6 - z) < 1e-3)
  }

  test("stats_cohens_kappa: exact-integer kappa replayed with the langid rule") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val stop = Seq(
      "en" -> Set("the", "and", "of", "to", "is", "in"),
      "es" -> Set("el", "la", "de", "que", "y", "los"),
      "fr" -> Set("le", "la", "de", "et", "les", "des"),
      "de" -> Set("der", "die", "und", "das", "ist", "von"))
    val pairs = docs.map { case (actual, text) =>
      val t = Option(text).map(_.trim).getOrElse("")
      val toks = if (t.isEmpty) Array.empty[String]
                 else t.toLowerCase.split("\\s+")
      val scores = stop.map { case (l, ws) => (l, toks.count(ws)) }
      val mx = scores.map(_._2).max
      val pred = if (mx <= 0) "und" else scores.find(_._2 == mx).get._1
      (pred, actual)
    }
    val nDocs = pairs.size.toLong
    val diag = pairs.count(p => p._1 == p._2).toLong
    val rows = pairs.groupBy(_._1).map { case (k, v) => (k, v.size.toLong) }
    val cols = pairs.groupBy(_._2).map { case (k, v) => (k, v.size.toLong) }
    val pChance = (rows.keySet ++ cols.keySet).toSeq
      .map(k => rows.getOrElse(k, 0L) * cols.getOrElse(k, 0L)).sum
    val kappa = 1000000L * (nDocs * diag - pChance) /
      (nDocs * nDocs - pChance)
    val row = q("stats_cohens_kappa").head()
    def g(cn: String) = row.getLong(row.fieldIndex(cn))
    assert(g("n_docs") == nDocs && g("diag") == diag)
    assert(g("p_chance") == pChance)
    assert(g("kappa_ppm") == kappa)
    // the corpus text carries no language signal, so the chance-
    // corrected score must sit at ~0 even though raw accuracy (~32%)
    // looks non-trivial — kappa is the metric that exposes that
    assert(math.abs(g("kappa_ppm")) < 100000L, s"kappa=${g("kappa_ppm")}")
    assert(diag * 4 > nDocs, "raw accuracy should still look non-trivial")
  }

  /** Deterministic rater model shared by the two multi-rater agreement
    * queries: rater r shifts the base category (doc_id mod 4) by r when
    * a doc_id+rater-keyed hash lands below r in [0, 10). */
  private def raterCat(id: Long, r: Int): Long = {
    val base = id % 4
    val h = ((id % 1000003L) * 2654435761L + r * 40503L) % 10
    if (h < r) (base + r) % 4 else base
  }

  test("stats_fleiss_kappa equals a direct in-JVM recomputation") {
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val cats = ids.map(id => Seq(raterCat(id, 1), raterCat(id, 2), raterCat(id, 3)))
    val n = cats.size.toLong
    val sumPairs = cats.map(c =>
      Seq((c(0), c(1)), (c(0), c(2)), (c(1), c(2)))
        .count { case (a, b) => a == b }.toLong).sum
    val catCnt = (0 to 3).map(j => cats.map(_.count(_ == j).toLong).sum)
    // same written order as the engine: pb, then p_e as ((p0²+p1²)+p2²)+p3²
    val pb = sumPairs.toDouble / (n * 3).toDouble
    val pe = catCnt.map(c => c.toDouble / (n * 3).toDouble)
      .map(p => p * p).reduce(_ + _)
    val kappa = (pb - pe) / (1.0 - pe)
    val row = q("stats_fleiss_kappa").head()
    def g(cn: String) = row.getLong(row.fieldIndex(cn))
    assert(g("n_items") == n && g("sum_pairs") == sumPairs)
    // exact: every engine-side double derives from the same integers;
    // outputs are truncated ppm (floor, not round — ADVICE r13)
    assert(g("p_bar_ppm") == math.floor(pb * 1000000.0).toLong)
    assert(g("kappa_ppm") == math.floor(kappa * 1000000.0).toLong)
    // the rater model disagrees ~10/20/30% of the time, so agreement
    // must be positive but imperfect — kappa in (0.2, 0.8)
    assert(g("kappa_ppm") > 200000L && g("kappa_ppm") < 800000L,
      s"kappa_ppm=${g("kappa_ppm")}")
  }

  test("stats_krippendorff_alpha equals a direct in-JVM recomputation") {
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val rated = ids.map { id =>
      val c3 = if (id % 5 == 0) None else Some(raterCat(id, 3))
      (raterCat(id, 1), raterCat(id, 2), c3)
    }
    val nRatings = rated.map { case (_, _, c3) => if (c3.isEmpty) 2L else 3L }.sum
    val doSum = rated.map {
      case (a, b, None) => if (a != b) 2L else 0L
      case (a, b, Some(c)) =>
        3L - Seq((a, b), (a, c), (b, c)).count { case (x, y) => x == y }
    }.sum
    val catCnt = (0 to 3).map(j => rated.map { case (a, b, c3) =>
      Seq(Some(a), Some(b), c3).flatten.count(_ == j).toLong }.sum)
    val alpha = 1.0 - (doSum * (nRatings - 1)).toDouble /
      (nRatings * nRatings - catCnt.map(c => c * c).reduce(_ + _)).toDouble
    val row = q("stats_krippendorff_alpha").head()
    def g(cn: String) = row.getLong(row.fieldIndex(cn))
    assert(g("n_items") == ids.size.toLong && g("n_ratings") == nRatings)
    assert(g("do_sum") == doSum)
    // truncated ppm (floor, not round — ADVICE r13)
    assert(g("alpha_ppm") == math.floor(alpha * 1000000.0).toLong)
    // missingness shrinks the pairable base but must not flip the sign:
    // the same rater model keeps alpha positive and imperfect
    assert(g("alpha_ppm") > 200000L && g("alpha_ppm") < 800000L,
      s"alpha_ppm=${g("alpha_ppm")}")
  }

  test("stats_kruskal_wallis: H recomputed directly; integer stats exact") {
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_mktsegment", "c_acctbal")
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .toSeq
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    val n = c.size
    // doubled midranks: value v at 1-indexed positions [cb+1, cb+t] has
    // doubled midrank 2*cb + t + 1
    val byV = c.groupBy(_._2).toSeq.sortBy(_._1)
    var cb = 0L
    var r2 = Map[String, Long]().withDefaultValue(0L)
    var tie = 0L
    byV.foreach { case (_, rows) =>
      val t = rows.size.toLong
      rows.foreach { case (s, _) => r2 += s -> (r2(s) + 2 * cb + t + 1) }
      tie += t * t * t - t
      cb += t
    }
    val ns = segs.map(s => c.count(_._1 == s).toLong)
    val sumTerm = segs.zip(ns).map { case (s, nsz) =>
      r2(s).toDouble * r2(s).toDouble / nsz.toDouble }.sum
    val h = 3.0 * sumTerm / (n.toDouble * (n + 1.0)) - 3.0 * (n + 1.0)
    val hCorr = h / (1.0 - tie.toDouble /
      (n.toDouble * n.toDouble * n.toDouble - n.toDouble))
    val row = q("stats_kruskal_wallis").head()
    def g(cn: String) = row.getLong(row.fieldIndex(cn))
    assert(g("n") == n.toLong)
    assert(segs.indices.forall(i => g(s"n${i + 1}") == ns(i)))
    assert(g("tie_term") == tie)
    assert(math.abs(g("h_ppm") / 1e6 - h) < 1e-3, s"${g("h_ppm")} vs $h")
    assert(math.abs(g("h_corr_ppm") / 1e6 - hCorr) < 1e-3)
    // with 5 groups H should be positive on organic data
    assert(g("h_ppm") > 0L)
  }

  test("stats_mcnemar: b/c equal a driver recompute of per-user period bits") {
    val half = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val ev = sources.Tables.load(spark, sfDir, "events")
      .select("user_id", "event_type", "ts")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val byUser = ev.groupBy(_._1).map { case (u, rows) =>
      val early = rows.exists(r => r._2 == "purchase" && r._3.before(half))
      val late = rows.exists(r => r._2 == "purchase" && !r._3.before(half))
      (u, early, late)
    }
    val b = byUser.count(r => r._2 && !r._3).toLong
    val c = byUser.count(r => !r._2 && r._3).toLong
    val row = q("stats_mcnemar").head()
    assert(row.getLong(row.fieldIndex("n_users")) == byUser.size.toLong)
    assert(row.getLong(row.fieldIndex("b")) == b)
    assert(row.getLong(row.fieldIndex("c")) == c)
    // sf0.001 has no discordant users — the b+c=0 guard must yield NULL
    if (b + c == 0) assert(row.isNullAt(row.fieldIndex("chi2_ppm")))
    else assert(row.getLong(row.fieldIndex("chi2_ppm")) ==
      1000000L * (b - c) * (b - c) / (b + c))
  }

  test("stats_kendall_tau: pair counts close and tau matches driver recompute") {
    val row = q("stats_kendall_tau").head()
    def g(cn: String) = row.getLong(row.fieldIndex(cn))
    val n = g("n_pairs")
    // C + D + pairs tied in x or y (union) = all pairs
    assert(g("conc") + g("disc") <= n)
    assert(n == 25L * 24L / 2L || n > 0L)
    val tau = (g("conc") - g("disc")).toDouble /
      math.sqrt((n - g("tie_x")).toDouble * (n - g("tie_y")).toDouble)
    assert(g("tau_ppm") == math.floor(1000000.0 * tau).toLong)
    assert(math.abs(tau) <= 1.0)
  }

  test("timeseries_acf: exact-integer form equals the double estimator") {
    val ev = sources.Tables.load(spark, sfDir, "events")
    val daily = ev.groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("d"))
      .count().collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay).toSeq
    val xs = daily.map(_._2.toDouble)
    val mean = xs.sum / xs.length
    val den = xs.map(x => (x - mean) * (x - mean)).sum
    val byDay = daily.map { case (d, x) => d.toEpochDay -> x.toDouble }.toMap
    val rows = q("timeseries_acf").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 7))
    rows.foreach { r =>
      val k = r.getInt(0)
      val num = daily.collect { case (d, x)
        if byDay.contains(d.toEpochDay + k) =>
          (x - mean) * (byDay(d.toEpochDay + k) - mean) }.sum
      val acf = num / den
      assert(math.abs(r.getLong(2) / 1e6 - acf) < 2e-6,
        s"lag $k: ${r.getLong(2)} vs $acf")
    }
  }

  test("graph_hits: equals a driver power iteration on the same graph") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = li.map { case (ok, p) => (ord(ok), p) }.distinct
    val byC = edges.groupBy(_._1); val byP = edges.groupBy(_._2)
    val a1 = byP.map { case (p, es) => p -> BigInt(es.size) }
    val h1 = byC.map { case (cst, es) => cst -> es.map(e => a1(e._2)).sum }
    val a2 = byP.map { case (p, es) => p -> es.map(e => h1(e._1)).sum }
    val h2 = byC.map { case (cst, es) => cst -> es.map(e => a2(e._2)).sum }
    val as = a2.values.sum; val hs = h2.values.sum
    def top10(m: Map[Long, BigInt], tot: BigInt) =
      m.toSeq.map { case (id, v) => (id, (v * BigInt(1000000000000L) / tot).toLong) }
        .sortBy { case (id, sc) => (-sc, id) }.take(10)
    val expect = top10(h2, hs).map(t => ("hub", t._1, t._2)) ++
      top10(a2, as).map(t => ("authority", t._1, t._2))
    val got = q("graph_hits").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.toSet == expect.toSet, s"$got vs $expect")
  }

  test("text_dsir_weights: en-marker synthetic doc outranks matched non-en text") {
    // the corpus text itself carries no language signal (pinned lesson),
    // so grade the CONSTRUCTION: weights are finite, docs-covered, and
    // the per-doc sum equals a driver recompute for a sample of docs
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] =
      if (t == null || t.trim.isEmpty) Seq.empty
      else t.trim.toLowerCase.split("\\s+").toSeq
    val V = 4096
    def bucket(w: String): Long = {
      val h = fnv(w) % V
      if (h < 0) h + V else h
    }
    val all = docs.flatMap { case (id, lang, t) => toks(t).map(w => (id, lang, bucket(w))) }
    val nt = all.filter(_._2 == "en").groupBy(_._3).map { case (b, r) => b -> r.size.toLong }
    val nr = all.filter(_._2 != "en").groupBy(_._3).map { case (b, r) => b -> r.size.toLong }
    val tt = nt.values.sum; val tr = nr.values.sum
    def lr(b: Long): Double =
      math.log((nt.getOrElse(b, 0L) + 1).toDouble / (tt + V)) -
        math.log((nr.getOrElse(b, 0L) + 1).toDouble / (tr + V))
    val got = q("text_dsir_weights").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.size == docs.count(d => toks(d._3).nonEmpty))
    docs.take(20).filter(d => toks(d._3).nonEmpty).foreach { case (id, _, t) =>
      val bs = toks(t).map(bucket)
      val (nf, w) = got(id)
      assert(nf == bs.size.toLong)
      assert(math.abs(w - bs.map(lr).sum) < 1e-4, s"doc $id")
    }
  }

  test("similarity_mmr_topk: greedy invariants and driver recompute") {
    val rows = q("similarity_mmr_topk").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == (1 to 8))
    assert(rows.map(_._2).distinct.length == 8)
    assert(rows.head._4.isEmpty && rows.tail.forall(_._4.nonEmpty))
    // driver recompute on the raw embeddings
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dt = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dt += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      if (na == 0 || nb == 0) 0.0 else dt / math.sqrt(na * nb)
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val qv = embs(0L)
    val cands = embs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, r6(cos(v, qv)), v) }
      .sortBy { case (id, rel, _) => (-rel, id) }.take(30)
    var sel = Vector.empty[Long]
    val expect = collection.mutable.ArrayBuffer[Long]()
    for (_ <- 1 to 8) {
      val rem = cands.filterNot(c => sel.contains(c._1))
      val pick = if (sel.isEmpty) rem.minBy(c => (-c._2, c._1))._1
        else rem.map { c =>
          val ms = sel.map(s => r6(cos(c._3, embs(s)))).max
          (c._1, 0.7 * c._2 - 0.3 * ms)
        }.minBy(p => (-p._2, p._1))._1
      expect += pick
      sel :+= pick
    }
    assert(rows.map(_._2).toSeq == expect.toSeq)
  }

  test("curriculum_interleave: round-robin order replayed from raw docs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ranked = docs.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      ds.sortBy(d => (d._3, d._1)).zipWithIndex
        .map { case (d, i) => (d._1, d._2, d._3, i + 1) }
    }
    val expect = ranked.sortBy { case (id, src, _, r) => (r, src, id) }.take(60)
    val got = q("curriculum_interleave").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSeq
    assert(got == expect)
    // interleave property: ranks non-decreasing, sources cycle within rank
    assert(got.map(_._4).sliding(2).forall(p => p.head <= p.last))
  }

  test("feature_standardize: z and robust z replayed per segment") {
    val rows = q("feature_standardize").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment",
        "CAST(round(c_acctbal * 100) AS BIGINT) AS cents").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == cust.length)
    val bySeg = cust.groupBy(_._2)
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    bySeg.foreach { case (seg, cs) =>
      val xs = cs.map(_._3)
      val n = xs.length.toLong
      val sm = xs.sum
      val q2 = xs.map(x => BigInt(x) * x).sum
      val m2 = med2(xs)
      val mad4 = med2(cs.map(c => math.abs(c._3 * 2 - m2)))
      val mine = rows.filter(_._2 == seg)
      mine.take(25).foreach { case (ck, _, cents, z, rz) =>
        val zExp = math.floor(1000000.0 * (n * cents - sm).toDouble /
          math.sqrt((BigInt(n) * q2 - BigInt(sm) * BigInt(sm)).toDouble)).toLong
        assert(z.contains(zExp), s"cust $ck z")
        val d2 = cents * 2 - m2
        if (mad4 == 0) assert(rz.isEmpty)
        else assert(rz.contains(d2 * 2 * 1000000 / mad4), s"cust $ck rz")
      }
      // z-scores are centred: Σz over the segment within rounding slack
      val zsum = mine.flatMap(_._4).sum
      assert(math.abs(zsum) <= mine.size.toLong, s"seg $seg z not centred")
    }
  }

  test("stats_cochran_q: incidence moments replayed; degenerate guard") {
    val ev = sources.Tables.load(spark, sfDir, "events")
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ls = ev.groupBy(_._1).map(_._2.size.toLong).toSeq
    val gs = ev.groupBy(_._2).map(_._2.size.toLong).toSeq
    val row = q("stats_cochran_q").head()
    def g(cn: String) = row.getLong(row.fieldIndex(cn))
    assert(g("n_users") == ls.size.toLong)
    assert(g("sum_l") == ls.sum && g("sum_l2") == ls.map(l => l * l).sum)
    assert(g("sum_g") == gs.sum)
    val den = 5 * ls.sum - ls.map(l => l * l).sum
    if (den <= 0) assert(row.isNullAt(row.fieldIndex("q_ppm")))
    else {
      val num = BigInt(4000000) * (BigInt(5) * gs.map(x => BigInt(x) * x).sum
        - BigInt(gs.sum) * BigInt(gs.sum))
      assert(g("q_ppm") == (num / BigInt(den)).toLong)
    }
  }

  test("graph_clustering_coeff: lcc replayed from a driver triangle count") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 % 2 == 0)
    val edges = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.distinct
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._2).toSet }
    val lcc = adj.filter(_._2.size >= 2).map { case (n, nbrs) =>
      val t = nbrs.toSeq.combinations(2)
        .count(p => adj(p(0)).contains(p(1)))
      val d = nbrs.size.toLong
      (n, d, t.toLong, 2000000L * t / (d * (d - 1)))
    }
    val expect = lcc.toSeq.sortBy { case (n, _, _, l) => (-l, n) }.take(20)
      .map { case (n, d, t, l) => (n, d, t, l) }
    val got = q("graph_clustering_coeff").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"$got vs $expect")
  }

  test("timeseries_ccf: per-lag Pearson replayed from daily counts") {
    val ev = sources.Tables.load(spark, sfDir, "events")
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toLocalDateTime.toLocalDate))
    def daily(t: String) = ev.filter(_._1 == t).groupBy(_._2)
      .map { case (d, rs) => d.toEpochDay -> rs.size.toLong }
    val x = daily("click"); val y = daily("purchase")
    val rows = q("timeseries_ccf").collect()
    assert(rows.map(_.getInt(0)).toSeq == (-7 to 7))
    rows.foreach { r =>
      val k = r.getInt(0)
      val pairs = x.toSeq.collect { case (d, xv) if y.contains(d + k) =>
        (xv.toDouble, y(d + k).toDouble) }
      assert(r.getLong(1) == pairs.size.toLong)
      if (!r.isNullAt(2)) {
        val n = pairs.size.toDouble
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val num = n * pairs.map(p => p._1 * p._2).sum - sx * sy
        val den = math.sqrt((n * pairs.map(p => p._1 * p._1).sum - sx * sx) *
          (n * pairs.map(p => p._2 * p._2).sum - sy * sy))
        assert(math.abs(r.getLong(2) / 1e6 - num / den) < 2e-6, s"lag $k")
      }
    }
  }

  test("stats_jarque_bera: moments and statistic replayed from raw dollars") {
    val ds = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("CAST(round(o_totalprice) AS BIGINT) d").collect()
      .map(_.getLong(0))
    val n = ds.length.toDouble
    val mu = ds.sum / n
    def cm(p: Int) = ds.map(d => math.pow(d - mu, p)).sum / n
    val (m2, m3, m4) = (cm(2), cm(3), cm(4))
    val skew = m3 / (m2 * math.sqrt(m2))
    val kurt = m4 / (m2 * m2) - 3.0
    val jb = n * (skew * skew / 6.0 + kurt * kurt / 24.0)
    val row = q("stats_jarque_bera").head()
    def g(cn: String) = row.getLong(row.fieldIndex(cn))
    assert(g("n") == ds.length.toLong)
    assert(math.abs(g("skew_ppm") / 1e6 - skew) < 1e-4, s"${g("skew_ppm")} vs $skew")
    assert(math.abs(g("kurt_ppm") / 1e6 - kurt) < 1e-4)
    assert(math.abs(g("jb_ppm") / 1e6 - jb) < jb.abs * 1e-3 + 1e-3)
  }

  test("orders_size_poisson_fit: histogram and chi2 replayed") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey").collect().map(_.getLong(0))
    val sizes = li.groupBy(identity).map(_._2.size)
    val n = sizes.size.toDouble
    val tl = li.length.toDouble
    val lam = tl / n
    def fact(k: Int): Double = (1 to k).product.toDouble
    def e(k: Int): Double = n * math.exp(-lam) * math.pow(lam, k) / fact(k)
    val obs = (1 to 7).map(k => sizes.count(_ == k).toLong)
    val obsTail = sizes.count(_ >= 8).toLong
    val eTail = n - (0 to 7).map(e).sum
    val chi2 = (0 to 7).map { k =>
      val o = if (k == 0) 0.0 else obs(k - 1).toDouble
      (o - e(k)) * (o - e(k)) / e(k)
    }.sum + (obsTail - eTail) * (obsTail - eTail) / eTail
    val row = q("orders_size_poisson_fit").head()
    def g(cn: String) = row.getLong(row.fieldIndex(cn))
    assert(g("n") == sizes.size.toLong && g("tl") == li.length.toLong)
    (1 to 7).foreach(k => assert(g(s"obs_$k") == obs(k - 1), s"obs_$k"))
    assert(g("obs_8p") == obsTail)
    assert(g("lambda_ppm") == (1000000L * li.length / sizes.size))
    assert(math.abs(g("chi2_ppm") / 1e6 - chi2) < chi2 * 1e-6 + 1e-3,
      s"${g("chi2_ppm")} vs $chi2")
    // the histogram closes over all orders once the tail bucket exists
    assert(obs.sum + obsTail == sizes.size.toLong)
  }

  test("orders_discount_response: band stats replayed; shares close") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("CAST(round(l_discount * 100) AS BIGINT) d",
        "CAST(round(l_quantity * 100) AS BIGINT) q",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) r")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val byD = li.groupBy(_._1)
    val tr = li.map(x => BigInt(x._3)).sum
    val got = q("orders_discount_response").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet == byD.keySet)
    byD.foreach { case (d, rs) =>
      val qs = rs.map(_._2).sorted
      val n = qs.length
      val med2 = if (n % 2 == 1) 2 * qs(n / 2) else qs(n / 2 - 1) + qs(n / 2)
      val (gn, gm, gmean, gshare) = got(d)
      assert(gn == n.toLong && gm == med2, s"band $d")
      assert(gmean == (BigInt(1000000) * qs.map(BigInt(_)).sum /
        BigInt(n)).toLong)
      assert(gshare == (BigInt(1000000) * rs.map(x => BigInt(x._3)).sum /
        tr).toLong)
    }
  }

  test("graph_richclub: phi replayed; density grows toward the club") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 % 2 == 0)
    val edges = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.distinct
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (n, o) => n -> o.size.toLong }
    val got = q("graph_richclub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(2L, 4L, 8L, 16L, 32L))
    got.foreach { case (k, nk, ek2, phi) =>
      val nkE = deg.values.count(_ > k).toLong
      val ekE = edges.count(e => deg(e._1) > k && deg(e._2) > k).toLong
      assert(nk == nkE && ek2 == ekE, s"k=$k")
      if (nkE >= 2)
        assert(phi == 1000000L * 2 * ekE / (nkE * (nkE - 1)), s"k=$k")
      else assert(phi == -1L)
    }
  }

  test("stats_bartlett: statistic replayed from raw per-segment variances") {
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("c_mktsegment", "CAST(round(c_acctbal * 100) AS BIGINT) x")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val segs = c.groupBy(_._1).values.map(_.map(_._2.toDouble)).toSeq
    val k = segs.length
    val nT = c.length.toDouble
    def svar(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    val pooled = segs.map(g => (g.length - 1) * svar(g)).sum / (nT - k)
    val num = (nT - k) * math.log(pooled) -
      segs.map(g => (g.length - 1) * math.log(svar(g))).sum
    val corr = 1.0 + (segs.map(g => 1.0 / (g.length - 1)).sum -
      1.0 / (nT - k)) / (3.0 * (k - 1))
    val t0 = num / corr
    val row = q("stats_bartlett").head()
    assert(row.getLong(0) == c.length.toLong)
    assert(math.abs(row.getLong(row.fieldIndex("t_ppm")) / 1e6 - t0)
      < math.abs(t0) * 1e-6 + 1e-3, s"${row.getLong(6)} vs $t0")
  }

  test("graph_conductance: cut/volume replayed on the planted graph") {
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nation = c.toMap
    val ids = c.map(_._1).toSet
    val near = for {
      (id, nat) <- c
      id2 <- (id + 1) to (id + 100) if ids.contains(id2) &&
        nation(id2) == nat
    } yield (id, id2)
    val chain = c.collect { case (id, _) if ids.contains(id + 1) =>
      (id, id + 1) }
    val e0 = (near ++ chain).distinct
    val und = e0 ++ e0.map(_.swap)
    val m2 = und.size.toLong
    val byLabel = und.groupBy(e => nation(e._1))
    val got = q("graph_conductance").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == byLabel.keySet.map(identity))
    byLabel.foreach { case (lab, es) =>
      val vol = es.size.toLong
      val cut = es.count(e => nation(e._2) != lab).toLong
      assert(got(lab) == (vol, cut,
        1000000L * cut / math.min(vol, m2 - vol)), s"label $lab")
    }
    // the planted structure is real: median conductance well below 1/2
    val phis = got.values.map(_._3).toSeq.sorted
    assert(phis(phis.length / 2) < 500000L, phis.toString)
  }

  test("orders_customer_migration: matrix closes over both-half customers") {
    val rows = q("orders_customer_migration").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
    assert(rows.forall { case ((a, b), _) =>
      a >= 1 && a <= 3 && b >= 1 && b <= 3 })
    val total = rows.map(_._2._1).sum
    rows.foreach { case (_, (n, share)) =>
      assert(share == 1000000L * n / total)
    }
    // terciles are ~equal-mass: each terc1 row-group holds ~n/3
    val byT1 = rows.groupBy(_._1._1).view.mapValues(_.map(_._2._1).sum)
    byT1.values.foreach(v =>
      assert(math.abs(v - total / 3.0) <= total * 0.1 + 3, byT1.toString))
  }

  test("part_supplier_herfindahl: HHI replayed; bounded by (1/n, 1]") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_partkey", "l_suppkey", "CAST(l_quantity AS BIGINT) q")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPart = li.groupBy(_._1).view.mapValues { rs =>
      rs.groupBy(_._2).map { case (_, ss) => ss.map(_._3).sum }.toSeq
    }.toMap.filter(_._2.size >= 2)
    val expect = byPart.map { case (p, qs) =>
      val tq = qs.sum
      (p, qs.size.toLong, tq,
        (BigInt(1000000) * qs.map(x => BigInt(x) * x).sum /
          (BigInt(tq) * tq)).toLong)
    }.toSeq.sortBy { case (p, _, _, h) => (-h, p) }.take(20)
    val got = q("part_supplier_herfindahl").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"$got vs $expect")
    got.foreach { case (_, n, _, h) =>
      assert(h <= 1000000L && h >= 1000000L / n - 1)
    }
  }

  test("model_auc: equals a direct pairwise AUC count") {
    val scored = q("quality_model_score").collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("margin")))
    val lang = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val pos = scored.filter(s => lang(s._1) == "en").map(_._2)
    val neg = scored.filter(s => lang(s._1) != "en").map(_._2)
    // direct O(n1·n0) definition: P(pos > neg) + ½P(tie)
    var wins = 0L; var ties = 0L
    for (p <- pos; ng <- neg) {
      if (p > ng) wins += 1 else if (p == ng) ties += 1
    }
    val u2 = 2 * wins + ties
    val row = q("model_auc").head()
    def g(cn: String) = row.getLong(row.fieldIndex(cn))
    assert(g("n_pos") == pos.length.toLong && g("n_neg") == neg.length.toLong)
    assert(g("u2") == u2, s"${g("u2")} vs $u2")
    assert(g("auc_ppm") == 1000000L * u2 / (2L * pos.length * neg.length))
    assert(g("gini_ppm") == 2 * g("auc_ppm") - 1000000L)
  }

  test("embedding_norm_audit: fences and outliers replayed") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val sq = embs.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 10000)).map(q => q * q).sum
    }
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    val m2 = med2(sq.map(_._2).toSeq)
    val devs = sq.map { case (id, x) => (id, x, math.abs(2 * x - m2)) }
    val m4 = med2(devs.map(_._3).toSeq)
    val nOut = devs.count(d => d._3 * 2 > m4 * 10).toLong
    val expect = devs.sortBy { case (id, _, d) => (-d, id) }.take(10)
      .map { case (id, x, d) => (id, x, d) }.toSeq
    val got = q("embedding_norm_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.map(r => (r._1, r._2, r._3)).toSeq == expect)
    got.foreach { r =>
      assert(r._4 == embs.length.toLong && r._5 == m2 && r._6 == m4 &&
        r._7 == nOut)
    }
  }

  test("events_user_stickiness: ratio bounded and replayed per week") {
    val ev = sources.Tables.load(spark, sfDir, "events")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toLocalDateTime.toLocalDate))
      .distinct
    val byWk = ev.map { case (u, d) =>
      (d.minusDays(d.getDayOfWeek.getValue - 1L), u, d)
    }.distinct.groupBy(_._1)
    val got = q("events_user_stickiness").collect()
      .map(r => (r.getDate(0).toLocalDate,
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == byWk.keySet)
    byWk.foreach { case (wk, rows) =>
      val days = rows.map(_._3).distinct.size.toLong
      val sumDau = rows.map(r => (r._3, r._2)).distinct.size.toLong
      val wau = rows.map(_._2).distinct.size.toLong
      val (gd, gs, gw, gp) = got(wk)
      assert(gd == days && gs == sumDau && gw == wau, s"week $wk")
      assert(gp == 1000000L * sumDau / (days * wau))
      // stickiness is a ratio of actives: at most 1
      assert(gp <= 1000000L)
    }
  }

  test("supplier_return_wilson: bound replayed; ordering by the bound") {
    def wilson(ret: Long, n: Long): Double = {
      val p = ret.toDouble / n
      (p + 3.8416 / (2.0 * n) -
        1.96 * math.sqrt(p * (1 - p) / n + 3.8416 / (4.0 * n * n))) /
        (1.0 + 3.8416 / n)
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_suppkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val agg = li.groupBy(_._1).map { case (sup, rs) =>
      (sup, rs.size.toLong, rs.count(_._2 == "R").toLong) }
    val expect = agg.map { case (sup, n, ret) =>
      (sup, n, ret, math.floor(1000000.0 * wilson(ret, n)).toLong) }
      .toSeq.sortBy { case (sup, _, _, w) => (-w, sup) }.take(20)
    val got = q("supplier_return_wilson").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"$got vs $expect")
    // the bound is below the naive rate (it is a LOWER bound)
    got.foreach { case (_, n, ret, w) =>
      assert(w <= 1000000L * ret / n + 1)
    }
  }

  test("dedup_minhash_pr: confusion matrix closes and moves monotonically") {
    val rows = q("dedup_minhash_pr").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(rows.map(_._1).toSeq == Seq(8, 10, 12, 14))
    // tp + fn = total truth pairs, constant across thresholds
    val totals = rows.map(r => r._2 + r._4).distinct
    assert(totals.length == 1 && totals.head > 0L)
    // raising the threshold can only drop detections
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3 && b._4 >= a._4)
    }
    rows.foreach { case (_, tp, fp, fn, p, r) =>
      if (tp + fp > 0) assert(p == 1000000L * tp / (tp + fp))
      if (tp + fn > 0) assert(r == 1000000L * tp / (tp + fn))
    }
  }

  test("events_session_stats: sessions replayed with the 30-min gap rule") {
    val ev = sources.Tables.load(spark, sfDir, "events")
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val ts = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val cuts = ts.indices.filter(i =>
        i == 0 || ts(i) - ts(i - 1) > 1800000L)
      (cuts :+ ts.length).sliding(2).map { w =>
        val seg = ts.slice(w(0), w(1))
        (seg.length, (seg.max - seg.min) / 1000L)
      }
    }.toSeq
    def bucket(n: Int) = if (n == 1) "a_bounce" else if (n <= 4) "b_2_4"
      else if (n <= 9) "c_5_9" else "d_10_plus"
    val byB = sessions.groupBy(s => bucket(s._1))
    val total = sessions.size.toLong
    val got = q("events_session_stats").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == byB.keySet)
    byB.foreach { case (b, ss) =>
      val ds = ss.map(_._2).sorted
      val n = ds.length
      val med2 = if (n % 2 == 1) 2 * ds(n / 2) else ds(n / 2 - 1) + ds(n / 2)
      assert(got(b) == (n.toLong, 1000000L * n / total, med2), b)
    }
  }

  test("events_entropy_rate: H and perplexity replayed from the chain") {
    val ev = sources.Tables.load(spark, sfDir, "events")
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
        r.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { rows =>
      val seq2 = rows.sortBy(r => (r._3, r._2)).map(_._4)
      seq2.sliding(2).filter(_.size == 2).map(p => (p(0), p(1)))
    }.toSeq
    val c = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cs = trans.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val tt = trans.size.toDouble
    val h = c.toSeq.sortBy(_._1).map { case ((i, _), cij) =>
      -(cij / tt) * math.log(cij.toDouble / cs(i))
    }.sum
    val row = q("events_entropy_rate").head()
    assert(row.getLong(0) == trans.size.toLong)
    assert(math.abs(row.getDouble(1) - h) < 1e-5)
    assert(math.abs(row.getDouble(2) - math.exp(h)) < 1e-4)
    // entropy rate of a 5-symbol chain is bounded by ln 5
    assert(row.getDouble(1) >= 0.0 && row.getDouble(1) <= math.log(5.0) + 1e-9)
  }

  test("orders_backlog_aging: buckets and shares replayed") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") =!= "F")
      .selectExpr("o_orderdate",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) cents")
      .collect().map(r =>
        (r.getAs[java.time.LocalDateTime](0).toLocalDate, r.getLong(1)))
    val ref = o.map(_._1.toEpochDay).max
    def bucket(age: Long) =
      if (age <= 30) "a_0_30" else if (age <= 60) "b_31_60"
      else if (age <= 90) "c_61_90" else "d_90_plus"
    val byB = o.groupBy(r => bucket(ref - r._1.toEpochDay))
      .map { case (b, rs) => b -> (rs.size.toLong, rs.map(_._2).sum) }
    val tv = o.map(_._2).sum
    val got = q("orders_backlog_aging").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == byB.keySet)
    byB.foreach { case (b, (n, v)) =>
      assert(got(b) == (n, v, 1000000L * v / tv), b)
    }
  }

  test("events_hourly_heatmap: full grid, counts close, Monday-zero dow") {
    val rows = q("events_hourly_heatmap").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
    assert(rows.forall { case ((d, h), _) =>
      d >= 0 && d <= 6 && h >= 0 && h <= 23 })
    val total = sources.Tables.load(spark, sfDir, "events").count()
    assert(rows.map(_._2._1).sum == total)
    // spot-check one cell against a driver recompute
    val ev = sources.Tables.load(spark, sfDir, "events")
      .select("ts").collect().map(_.getTimestamp(0).toLocalDateTime)
    val cell = ev.groupBy(t =>
      (t.getDayOfWeek.getValue - 1, t.getHour))
      .map { case (k, o) => k -> o.size.toLong }
    rows.foreach { case (k, (n, share)) =>
      assert(cell(k) == n, s"cell $k")
      assert(share == 1000000L * n / total)
    }
  }

  test("orders_priority_sla: gap stats replayed per priority") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderpriority", "o_orderdate").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getAs[java.time.LocalDateTime](2).toLocalDate))
      .toMap
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_shipdate").collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toLocalDate))
    val gaps = li.map { case (ok, sd) =>
      val (p, od) = o(ok); (p, sd.toEpochDay - od.toEpochDay)
    }
    val got = q("orders_priority_sla").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    gaps.groupBy(_._1).foreach { case (p, rs) =>
      val gs = rs.map(_._2).sorted
      val n = gs.length
      val med2 = if (n % 2 == 1) 2 * gs(n / 2) else gs(n / 2 - 1) + gs(n / 2)
      val w = gs.count(_ <= 60).toLong
      assert(got(p) == (n.toLong, med2, 1000000L * w / n), p)
    }
  }

  test("graph_ktruss: three peel rounds replayed on the driver") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 % 4 == 0)
    var edges = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    for (_ <- 1 to 3) {
      val es = edges
      def tri(e: (Long, Long)): Int = {
        val (u, v) = e
        // support = common neighbors of u and v in the current graph
        val nu = es.collect { case (a, b) if a == u => b
                              case (a, b) if b == u => a }
        nu.count(w => w != v &&
          es.contains((math.min(w, v), math.max(w, v))))
      }
      edges = es.filter(e => tri(e) >= 2)
    }
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, o) => (n, o.size.toLong) }
    val expect = deg.toSeq.sortBy { case (n, d) => (-d, n) }.take(30)
    val got = q("graph_ktruss").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect, s"$got vs $expect")
  }

  test("model_calibration: bin accounting closes; rates exact") {
    val rows = q("model_calibration").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_._2).sum == total)
    val en = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("lang") === "en").count()
    assert(rows.map(_._3).sum == en)
    rows.foreach { case (b, n, pos, mn, mx, rate) =>
      assert(pos >= 0 && pos <= n)
      assert(mn <= mx)
      assert(rate == 1000000L * pos / n, s"bin $b")
    }
    // margin ranges are non-overlapping and ordered across bins
    val sorted = rows.sortBy(_._1)
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      assert(a._5 <= b._4, s"bins ${a._1}/${b._1} overlap")
    }
  }

  test("text_readability: word/sentence/syllable counts replayed") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Seq[String] =
      if (t == null || t.trim.isEmpty) Seq.empty
      else t.trim.toLowerCase.split("\\s+").toSeq
    val got = q("text_readability").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    val withToks = docs.filter(d => toks(d._2).nonEmpty)
    assert(got.size == withToks.length)
    withToks.take(30).foreach { case (id, text) =>
      val ws = toks(text)
      val syl = ws.map(w =>
        math.max(1, "[aeiouy]+".r.findAllIn(w).length).toLong).sum
      val sents = math.max(1L, text.count(c => ".!?".contains(c)).toLong)
      val flesch = 206.835 - 1.015 * (ws.length.toDouble / sents) -
        84.6 * (syl.toDouble / ws.length)
      val (gw, gs, gy, gf) = got(id)
      assert(gw == ws.length.toLong && gs == sents && gy == syl, s"doc $id")
      assert(math.abs(gf - flesch) < 1e-5, s"doc $id flesch")
    }
  }

  test("timeseries_granger: F matches an independent OLS fit both directions") {
    val ev = sources.Tables.load(spark, sfDir, "events")
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toLocalDateTime.toLocalDate))
    def daily(t: String) = ev.filter(_._1 == t).groupBy(_._2)
      .map { case (d, rs) => d.toEpochDay -> rs.size.toDouble }
    val x = daily("click"); val y = daily("purchase")
    val days = x.keySet.intersect(y.keySet)
    val rows = days.toSeq.sorted.collect {
      case d if days.contains(d - 1) =>
        (x(d), y(d), x(d - 1), y(d - 1))
    }
    def ols(ys: Seq[Double], xs: Seq[Seq[Double]]): Double = {
      // RSS of least squares with intercept, via normal equations
      val n = ys.length
      val k = xs.length
      val cols = Seq.fill(n)(1.0) +: xs
      val m = Array.tabulate(k + 1, k + 2) { (i, j) =>
        if (j == k + 1) cols(i).zip(ys).map(p => p._1 * p._2).sum
        else cols(i).zip(cols(j)).map(p => p._1 * p._2).sum
      }
      for (c <- 0 to k) {
        val piv = (c to k).maxBy(r => math.abs(m(r)(c)))
        val tmp = m(c); m(c) = m(piv); m(piv) = tmp
        for (r <- 0 to k if r != c) {
          val f = m(r)(c) / m(c)(c)
          for (j <- c to k + 1) m(r)(j) -= f * m(c)(j)
        }
      }
      val beta = (0 to k).map(i => m(i)(k + 1) / m(i)(i))
      ys.indices.map { t =>
        val pred = (0 to k).map(i => beta(i) * cols(i)(t)).sum
        val e = ys(t) - pred; e * e
      }.sum
    }
    def f(tgt: Seq[Double], own: Seq[Double], other: Seq[Double]): Double = {
      val rssR = ols(tgt, Seq(own))
      val rssU = ols(tgt, Seq(own, other))
      (rssR - rssU) / (rssU / (tgt.length - 3))
    }
    val got = q("timeseries_granger").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (xs, ys2, xls, yls) = (rows.map(_._1), rows.map(_._2),
      rows.map(_._3), rows.map(_._4))
    assert(got("click_to_purchase")._1 == rows.length.toLong)
    val f1 = f(ys2, yls, xls)
    val f2 = f(xs, xls, yls)
    assert(math.abs(got("click_to_purchase")._2 / 1e6 - f1) < 1e-3,
      s"${got("click_to_purchase")._2} vs $f1")
    assert(math.abs(got("purchase_to_click")._2 / 1e6 - f2) < 1e-3)
    // F is non-negative by construction (restricted RSS >= unrestricted)
    assert(got.values.forall(_._2 >= 0L))
  }

  test("search_prf_rocchio: two-pass PRF replayed from raw text") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Seq[String] =
      if (t == null || t.trim.isEmpty) Seq.empty
      else t.trim.toLowerCase.split("\\s+").toSeq
    val tk = docs.map { case (id, t) => (id, toks(t)) }
    val n = tk.length.toDouble
    val sdl = tk.map(_._2.length.toLong).sum.toDouble
    def bm25(terms: Seq[(String, Double)]): Map[Long, Double] = {
      val df = terms.map { case (w, _) =>
        w -> tk.count(_._2.contains(w)).toDouble }.toMap
      tk.map { case (id, ts) =>
        val dl = ts.length.toDouble
        val sc = terms.sortBy(_._1).map { case (w, wt) =>
          val tf = ts.count(_ == w).toDouble
          wt * (((n - df(w) + 0.5) / (df(w) + 0.5)) *
            ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / (sdl / n))))))
        }.sum
        id -> sc
      }.toMap
    }
    val orig = Seq("join", "stream", "vector")
    val s1 = bm25(orig.map(_ -> 1.0))
    val fb = s1.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(10)
      .map(_._1).toSet
    val fbtf = tk.filter(t => fb(t._1)).flatMap(_._2)
      .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val dfAll = tk.flatMap { case (id, ts) => ts.distinct.map(w => (w, id)) }
      .groupBy(_._1).map { case (w, o) => w -> o.size.toLong }
    val exp = fbtf.toSeq.filterNot(t => orig.contains(t._1))
      .map { case (w, f) => (w, f * (1000000L / (dfAll(w) + 1))) }
      .sortBy { case (w, wgt) => (-wgt, w) }.take(5).map(_._1)
    val s2 = bm25(orig.map(_ -> 1.0) ++ exp.map(_ -> 0.5))
    val expectTop = s2.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(10)
    val got = q("search_prf_rocchio").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (1 to 10))
    assert(got.map(_._2).toSeq == expectTop.map(_._1))
    got.zip(expectTop).foreach { case ((_, _, sc), (_, exp2)) =>
      assert(math.abs(sc - exp2) < 1e-5) }
    // scores non-increasing
    assert(got.map(_._3).sliding(2).forall(p => p.head >= p.last))
  }

  test("feature_woe_iv: bins, odds, and IV replayed from raw balances") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("c_custkey", "CAST(round(c_acctbal * 100) AS BIGINT) cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val buyers = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    // exact interpolated percentiles, Spark's percentile() convention
    val sorted = cust.map(_._2.toDouble).sorted
    def pct(q: Double): Double = {
      val pos = q * (sorted.length - 1)
      val lo = pos.toInt
      if (lo == sorted.length - 1) sorted(lo)
      else sorted(lo) + (pos - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val edges = (1 to 9).map(i => pct(i / 10.0))
    val binned = cust.map { case (ck, c) =>
      (edges.count(e => c.toDouble > e), if (buyers(ck)) 1L else 0L)
    }
    val byBin = binned.groupBy(_._1).map { case (b, rs) =>
      b -> (rs.size.toLong, rs.map(_._2).sum)
    }
    val tg = binned.map(_._2).sum
    val tb = binned.length - tg
    val rows = q("feature_woe_iv").collect()
    val got = rows.map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
      r.getLong(3))).toMap
    assert(got.keySet == byBin.keySet)
    if (tb == 0 || tg == 0) {
      // sf0.001 is degenerate (every customer buys) — guards must fire
      assert(rows.forall(r => r.isNullAt(4) && r.isNullAt(5)))
      byBin.foreach { case (b, (n, g)) =>
        assert(got(b) == (n, g, n - g), s"bin $b")
      }
    } else {
      val woeGot = rows.map(r => r.getInt(0) ->
        (r.getDouble(4), r.getDouble(5))).toMap
      var iv = 0.0
      byBin.toSeq.sortBy(_._1).foreach { case (b, (n, g)) =>
        val bad = n - g
        val woe = math.log(((g + 0.5) / tg) / ((bad + 0.5) / tb))
        iv += (g.toDouble / tg - bad.toDouble / tb) * woe
        assert(got(b) == (n, g, bad), s"bin $b")
        assert(math.abs(woeGot(b)._1 - woe) < 1e-5, s"bin $b woe")
      }
      woeGot.values.foreach(v => assert(math.abs(v._2 - iv) < 1e-5))
    }
  }

  test("timeseries_periodogram: spectral shares replayed; shares sum to ~1e6") {
    val ev = sources.Tables.load(spark, sfDir, "events")
      .select("ts").collect()
      .map(_.getTimestamp(0).toLocalDateTime.toLocalDate)
    val daily = ev.groupBy(identity).map { case (d, rs) =>
      d.toEpochDay -> rs.size.toDouble }.toSeq.sortBy(_._1)
    val dmin = daily.map(_._1).min
    val mean = daily.map(_._2).sum / daily.length
    def power(p: Int): Double = {
      val sc = daily.map { case (d, x) =>
        (x - mean) * math.cos(2 * math.Pi * (d - dmin) / p) }.sum
      val ss = daily.map { case (d, x) =>
        (x - mean) * math.sin(2 * math.Pi * (d - dmin) / p) }.sum
      sc * sc + ss * ss
    }
    val pows = (2 to 10).map(p => p -> power(p))
    val tp = pows.map(_._2).sum
    val rows = q("timeseries_periodogram").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (2 to 10))
    assert(rows.forall(_._2 == daily.length.toLong))
    rows.foreach { case (p, _, share) =>
      val exp = pows.find(_._1 == p).get._2 / tp
      assert(math.abs(share / 1e6 - exp) < 1e-4, s"period $p")
    }
    assert(rows.map(_._3).sum <= 1000000L)
  }

  test("text_heaps_law: log-log fit replayed from cumulative trigram vocab") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def tris(t: String): Seq[String] =
      if (t == null || t.trim.isEmpty) Seq.empty
      else t.trim.toLowerCase.split("\\s+").toSeq
        .sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
    val ids = docs.map(_._1.toDouble).sorted
    def pct(q: Double): Double = {
      val pos = q * (ids.length - 1)
      val lo = pos.toInt
      if (lo == ids.length - 1) ids(lo)
      else ids(lo) + (pos - lo) * (ids(lo + 1) - ids(lo))
    }
    val fences = (1 to 10).map(i => pct(i / 10.0))
    val grams = docs.flatMap { case (id, t) => tris(t).map(g => (id, g)) }
    val fdoc = grams.groupBy(_._2).map { case (g, o) => g -> o.map(_._1).min }
    val pts = fences.map { f =>
      val v = fdoc.values.count(_.toDouble <= f).toDouble
      val n = grams.count(_._1.toDouble <= f).toDouble
      (math.log(n), math.log(v))
    }
    val m = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    val k = math.exp((sy - beta * sx) / m)
    val row = q("text_heaps_law").head()
    assert(row.getLong(0) == 10L)
    assert(math.abs(row.getLong(1) / 1e6 - beta) < 1e-4,
      s"${row.getLong(1)} vs $beta")
    assert(math.abs(row.getLong(2) / 1e3 - k) < k * 1e-4 + 1e-2)
    // a growing (non-saturated) vocabulary: 0 < beta <= 1
    assert(row.getLong(1) > 0L && row.getLong(1) <= 1000000L)
  }

  test("events_error_pchart: limits and flags replayed per day") {
    val ev = sources.Tables.load(spark, sfDir, "events")
      .select("ts", "event_type").collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate,
        r.getString(1)))
    val daily = ev.groupBy(_._1).map { case (d, rs) =>
      (d, rs.size.toLong, rs.count(_._2 == "error").toLong) }.toSeq
    val tn = daily.map(_._2).sum.toDouble
    val te = daily.map(_._3).sum.toDouble
    val pbar = te / tn
    val got = q("events_error_pchart").collect()
      .map(r => (r.getDate(0).toLocalDate,
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6)))).toMap
    assert(got.size == daily.size)
    daily.foreach { case (d, n, e) =>
      val sigma = math.sqrt(pbar * (1 - pbar) / n)
      val (gn, ge, gp, gu, gl, gf) = got(d)
      assert(gn == n && ge == e, s"day $d")
      assert(gp == 1000000L * e / n)
      assert(gu == math.floor(1000000.0 * (pbar + 3 * sigma)).toLong)
      assert(gl == math.floor(1000000.0 * (pbar - 3 * sigma)).toLong)
      val p = e.toDouble / n
      assert(gf == (p > pbar + 3 * sigma || p < pbar - 3 * sigma), s"day $d")
    }
  }

  test("attribution_shapley: full replay + the efficiency identity") {
    val ev = sources.Tables.load(spark, sfDir, "events")
      .select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toLocalDateTime.toLocalDate,
        r.getString(2)))
    val sets = ev.groupBy(_._1).values.map { rows =>
      val d0 = rows.map(_._2).min
      val day1 = rows.filter(_._2 == d0)
      val subset = day1.map(_._3).filter(_ != "purchase").distinct.sorted
        .mkString(",")
      (subset, if (day1.exists(_._3 == "purchase")) 1L else 0L)
    }.toSeq
    val tab = sets.groupBy(_._1).map { case (k, rs) =>
      k -> (rs.size.toLong, rs.map(_._2).sum) }
    def v(sub: Seq[String]): Double = tab.get(sub.sorted.mkString(",")) match {
      case Some((n, c)) if n > 0 => c.toDouble / n
      case _ => 0.0
    }
    val chans = Seq("click", "error", "signup", "view")
    def fact(k: Int): Long = (1 to k).map(_.toLong).product
    val expect = chans.map { ch =>
      val others = chans.filterNot(_ == ch)
      val subs = (0 to 3).flatMap(k => others.combinations(k).toSeq)
        .sortBy(_.sorted.mkString(","))
      ch -> subs.foldLeft(0.0) { (acc, sub) =>
        acc + (fact(sub.size) * fact(3 - sub.size)).toDouble / 24.0 *
          (v(sub :+ ch) - v(sub))
      }
    }.toMap
    val got = q("attribution_shapley").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    chans.foreach(ch =>
      assert(math.abs(got(ch) - expect(ch)) < 1e-5, ch))
    // efficiency: Σ φ_i = v(grand coalition) − v(∅) — the Shapley axiom
    val eff = v(chans) - v(Seq.empty)
    assert(math.abs(got.values.sum - eff) < 1e-4,
      s"${got.values.sum} vs $eff")
  }

  test("attribution_markov: matches an exact (I-Q)a=r linear solve") {
    val ev = sources.Tables.load(spark, sfDir, "events")
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
    val chans = Seq("click", "error", "signup", "view")
    // independent journey construction + transition counts
    val trans = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._3.getTime, r._2)).map(_._4)
      val cut = sorted.indexOf("purchase")
      val j = if (cut >= 0) sorted.take(cut + 1) else sorted
      val steps = ("start" +: j).sliding(2).map(p => (p(0), p(1))).toSeq
      if (cut >= 0) steps else steps :+ (j.last, "null")
    }.filter(_._1 != "purchase").toSeq
    val c = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .withDefaultValue(0L)
    val rsum = (chans :+ "start").map(sr =>
      sr -> (chans ++ Seq("purchase", "null")).map(d => c((sr, d))).sum).toMap
    def pr(sr: String, d: String): Double =
      if (rsum(sr) == 0L) 0.0 else c((sr, d)).toDouble / rsum(sr)
    // exact absorption: solve (I - Q) a = r by Gaussian elimination
    def solve(removed: Option[String]): Double = {
      val act = chans.filterNot(removed.contains)
      val n = act.length
      val m = Array.tabulate(n, n + 1) { (i, j) =>
        if (j == n) pr(act(i), "purchase")
        else (if (i == j) 1.0 else 0.0) - pr(act(i), act(j))
      }
      for (col0 <- 0 until n) {
        val piv = (col0 until n).maxBy(r => math.abs(m(r)(col0)))
        val tmp = m(col0); m(col0) = m(piv); m(piv) = tmp
        for (r <- 0 until n if r != col0) {
          val f = m(r)(col0) / m(col0)(col0)
          for (j2 <- col0 to n) m(r)(j2) -= f * m(col0)(j2)
        }
      }
      val a = act.indices.map(i => m(i)(n) / m(i)(i))
      pr("start", "purchase") +
        act.indices.map(i => pr("start", act(i)) * a(i)).sum
    }
    val got = q("attribution_markov").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val pBase = solve(None)
    assert(math.abs(got("base")._1 - pBase) < 1e-3,
      s"${got("base")._1} vs $pBase")
    assert(got("base")._2 == 0.0)
    chans.foreach { ch =>
      val pc = solve(Some(ch))
      assert(math.abs(got(ch)._1 - pc) < 1e-3, s"$ch: ${got(ch)._1} vs $pc")
      assert(math.abs(got(ch)._2 - (1.0 - pc / pBase)) < 2e-3, ch)
      assert(got(ch)._1 >= 0.0 && got(ch)._1 <= 1.0)
    }
  }

  test("embedding_pca_top2: components orthogonal-ish, spectrum ordered") {
    val rows = q("embedding_pca_top2").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 128)
    val v1 = rows.filter(_._1 == 1).sortBy(_._2).map(_._3)
    val v2 = rows.filter(_._1 == 2).sortBy(_._2).map(_._3)
    val (l1, l2) = (rows.find(_._1 == 1).get._4, rows.find(_._1 == 2).get._4)
    // λ1 from the deflated pass can't exceed the top eigenvalue
    assert(l1 >= l2 && l2 > 0.0, s"$l1 vs $l2")
    // pc1 matches the single-component query exactly
    val pc1 = q("embedding_pca_power").collect()
      .sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(v1.toSeq == pc1.toSeq)
    // deflation removes v1: the iterates stay near-orthogonal to it
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    val n1 = math.sqrt(v1.map(x => x * x).sum)
    val n2 = math.sqrt(v2.map(x => x * x).sum)
    assert(math.abs(dot / (n1 * n2)) < 0.05, s"cos(v1,v2)=${dot / (n1 * n2)}")
  }

  test("stats_friedman: doubled midranks and statistic replayed") {
    val ev = sources.Tables.load(spark, sfDir, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val types = Seq("click", "error", "purchase", "signup", "view")
    val byUser = ev.groupBy(_._1).map { case (u, rs) =>
      u -> types.map(tp => rs.count(_._2 == tp).toLong)
    }
    val r2ByUser = byUser.map { case (u, vs) =>
      u -> vs.map(v => 2L * vs.count(_ < v) + vs.count(_ == v) + 1L)
    }
    val colSums = types.indices.map(j => r2ByUser.values.map(_(j)).sum)
    val a22 = r2ByUser.values.flatten.map(r => BigInt(r) * r).sum
    val n = byUser.size.toLong
    val row = q("stats_friedman").head()
    def g(cn: String) = row.getLong(row.fieldIndex(cn))
    assert(g("n_users") == n)
    types.zipWithIndex.foreach { case (tp, j) =>
      assert(g(s"r2_$tp") == colSums(j), tp)
    }
    val den = a22 - BigInt(180) * n
    if (den <= 0) assert(row.isNullAt(row.fieldIndex("chi2_ppm")))
    else {
      val num = BigInt(4000000) *
        colSums.map(rj => BigInt(rj - 6 * n) * BigInt(rj - 6 * n)).sum
      assert(g("chi2_ppm") == (num / den).toLong)
    }
  }

  test("text_novelty: df=1 share replayed from raw trigrams") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Seq[String] =
      if (t == null || t.trim.isEmpty) Seq.empty
      else t.trim.toLowerCase.split("\\s+").toSeq
    val grams = docs.map { case (id, t) =>
      val w = toks(t)
      id -> w.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val df = grams.flatMap { case (id, gs) => gs.map(g => (g, id)) }
      .groupBy(_._1).map { case (g, rs) => g -> rs.size }
    val got = q("text_novelty").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.size == grams.length)
    grams.foreach { case (id, gs) =>
      val uniq = gs.count(df(_) == 1).toLong
      assert(got(id) == (gs.size.toLong, uniq,
        1000000L * uniq / gs.size), s"doc $id")
    }
  }

  test("embedding_pca_power: eigen residual small, gram partition-invariant") {
    val rows = q("embedding_pca_power").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 64)
    val lam = rows.head._3
    assert(rows.forall(_._3 == lam) && lam > 0.0)
    // max-abs normalization leaves one component at ±1
    assert(math.abs(rows.map(r => math.abs(r._2)).max - 1.0) < 1e-6)
    // residual: G x ≈ λ' x for the quantized gram (λ' = λ·1e8)
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(_.getSeq[Float](1).toArray)
    val d = 64
    val g = Array.ofDim[Double](d, d)
    embs.foreach { v =>
      val qv = v.map(x => math.round(x.toDouble * 10000).toDouble)
      for (i <- 0 until d; j <- 0 until d) g(i)(j) += qv(i) * qv(j)
    }
    val x = rows.map(_._2)
    val gx = (0 until d).map(i => (0 until d).map(j => g(i)(j) * x(j)).sum)
    val xn = math.sqrt(x.map(v => v * v).sum)
    // synthetic embeddings are near-isotropic (λ2/λ1 close to 1), so 24
    // rounds leave a few-percent residual — the gate's value is the
    // BIT-IDENTICAL cross-engine iterate, not deep convergence; assert
    // the residual is small-ish and λ strictly tops the spectrum mean
    val res = math.sqrt((0 until d).map(i =>
      math.pow(gx(i) - lam * 1e8 * x(i), 2)).sum) / (lam * 1e8 * xn)
    assert(res < 0.05, s"relative eigen residual $res")
    val trace = (0 until d).map(i => g(i)(i)).sum
    assert(lam * 1e8 > trace / d,
      s"Rayleigh ${lam * 1e8} not above spectrum mean ${trace / d}")
    // gram aggregation is partition-count-invariant (exact integers)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def gram(parts: Int) = e.repartition(parts)
      .select(org.apache.spark.sql.functions.expr(
        "transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT))").as("q"))
      .agg(functions.GramMatrix.gramMatrix(
        org.apache.spark.sql.functions.col("q"), d).as("g"))
      .head().getSeq[Long](0).toSeq
    assert(gram(1) == gram(13))
  }

  test("stats_wilcoxon_signed_rank: W+ and z replayed with midranks") {
    val r = q("stats_wilcoxon_signed_rank").head()
    val evs = spark.read.parquet(s"$sfDir/events.parquet")
      .filter("event_type = 'purchase'")
      .select("user_id", "ts").collect()
      .map(row => (row.getLong(0),
        row.getAs[java.time.LocalDateTime](1)))
    val half = java.time.LocalDateTime.parse("2024-01-16T00:00:00")
    val ds = evs.groupBy(_._1).values.map { es =>
      es.count(_._2.isAfter(half.minusNanos(1))) -
        es.count(_._2.isBefore(half))
    }.filter(_ != 0).toSeq
    assert(r.getLong(0) == ds.length)
    if (ds.length >= 2) {
      // average ranks of |d| (doubled to stay integer)
      val sorted = ds.map(math.abs).sorted
      def rank2(ad: Int): Long = {
        val lt = sorted.count(_ < ad); val t = sorted.count(_ == ad)
        2L * lt + t + 1L
      }
      val w2 = ds.filter(_ > 0).map(d => rank2(math.abs(d))).sum
      assert(r.getLong(1) == w2, "doubled W+ mismatch")
      val n = ds.length.toLong
      val tie3 = sorted.distinct.map { v =>
        val t = sorted.count(_ == v).toLong; t * t * t - t
      }.sum
      assert(r.getLong(2) == tie3)
      val z = (2.0 * w2 - n * (n + 1)) /
        math.sqrt((2.0 * n * (n + 1) * (2 * n + 1) - tie3) / 3.0)
      assert(math.abs(r.getDouble(3) - z) < 1e-5, s"z ${r.getDouble(3)} vs $z")
    }
  }

  test("stats_durbin_watson: DW replayed from a double OLS fit") {
    val r = q("stats_durbin_watson").head()
    val days = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("CAST(ts AS DATE) AS day").groupBy("day").count()
      .orderBy("day").collect().map(_.getLong(1).toDouble)
    val n = days.length
    assert(r.getLong(0) == n.toLong)
    if (n >= 3) {
      val xs = (1 to n).map(_.toDouble)
      val sx = xs.sum; val sy = days.sum
      val sxx = xs.map(x => x * x).sum
      val sxy = xs.zip(days).map { case (x, y) => x * y }.sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = (sy - b * sx) / n
      val e = xs.zip(days).map { case (x, y) => y - a - b * x }
      val dw = e.sliding(2).map(p => math.pow(p(1) - p(0), 2)).sum /
        e.map(v => v * v).sum
      assert(math.abs(r.getLong(2) / 1e6 - dw) < 1e-4,
        s"dw ${r.getLong(2) / 1e6} vs $dw")
      // un-autocorrelated daily noise sits near 2; sanity-band it
      assert(r.getLong(2) > 0L && r.getLong(2) < 4000000L)
    }
  }

  test("timeseries_pacf: Durbin–Levinson replayed from a driver ACF") {
    val r = q("timeseries_pacf").head()
    val days = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("CAST(ts AS DATE) AS day").groupBy("day").count()
      .orderBy("day").collect().map(d => (d.getDate(0).toLocalDate, d.getLong(1)))
    val byDay = days.toMap
    val n = days.length.toDouble
    val sm = days.map(_._2).sum.toDouble
    val qq = days.map(d => d._2.toDouble * d._2).sum
    def acf(k: Int): Double = {
      val pts = days.flatMap { case (d0, x) =>
        byDay.get(d0.plusDays(k)).map(y => (x.toDouble, y.toDouble))
      }
      val pk = pts.length.toDouble
      val pkSum = pts.map(p => p._1 * p._2).sum
      val ak = pts.map(_._1).sum; val bk = pts.map(_._2).sum
      (n * n * pkSum - n * sm * (ak + bk) + pk * sm * sm) /
        (n * n * qq - n * sm * sm)
    }
    val (r1, r2, r3) = (acf(1), acf(2), acf(3))
    val p11 = r1
    val p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val a21 = r1 - p22 * r1
    val p33 = (r3 - a21 * r2 - p22 * r1) / (1.0 - a21 * r1 - p22 * r2)
    assert(math.abs(r.getDouble(0) - p11) < 1e-5)
    assert(math.abs(r.getDouble(1) - p22) < 1e-5)
    assert(math.abs(r.getDouble(2) - p33) < 1e-5)
    // pacf1 must equal acf1 by definition
    assert(math.abs(r.getDouble(0) - r1) < 1e-6)
  }

  private def scoredDocs(): Seq[(Long, Long)] = {
    import org.apache.spark.sql.functions.{col, lower, when, lit}
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(when(col("lang") === "en", 1L).otherwise(0L).as("is_a"),
        functions.HashFunctions.linearMargin(
          functions.TextFunctions.tokens(lower(col("text")))).as("margin"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("model_ks: statistic replayed as a max over empirical CDF gaps") {
    val r = q("model_ks").head()
    val sc = scoredDocs()
    val nPos = sc.count(_._1 == 1L).toLong
    val nNeg = sc.size - nPos
    assert(r.getLong(0) == nPos && r.getLong(1) == nNeg)
    val margins = sc.map(_._2).distinct.sorted
    val best = margins.map { m =>
      val cpos = sc.count(p => p._1 == 1L && p._2 <= m).toLong
      val cneg = sc.count(p => p._1 == 0L && p._2 <= m).toLong
      (1000000L * math.abs(cpos * nNeg - cneg * nPos) / (nPos * nNeg), m)
    }.maxBy(p => (p._1, -p._2))
    assert(r.getLong(2) == best._1, s"ks ${r.getLong(2)} vs ${best._1}")
    assert(r.getLong(3) == best._2)
    assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L)
  }

  test("model_lift_gain: deciles partition, gain monotone, last decile closes") {
    val rows = q("model_lift_gain").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val sc = scoredDocs()
    assert(rows.map(_._2).sum == sc.size.toLong)
    assert(rows.map(_._3).sum == sc.count(_._1 == 1L).toLong)
    // cumulative positives are a running sum; gain is monotone to 1e6
    var cum = 0L
    rows.foreach { r => cum += r._3; assert(r._4 == cum) }
    assert(rows.last._5 == 1000000L, "final gain must be 100%")
    assert(rows.map(_._5).sliding(2).forall(p => p(0) <= p(1)))
    // lift_ppm of the full population is exactly 1e6
    assert(rows.last._6 == 1000000L)
    // decile sizes differ by at most 1 (ntile contract)
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1L)
  }

  test("model_pr_auc: average precision replayed from the scored list") {
    val r = q("model_pr_auc").head()
    val sc = scoredDocs()
    val nPos = sc.count(_._1 == 1L).toLong
    assert(r.getLong(0) == nPos)
    assert(r.getLong(1) == sc.size - nPos)
    // group by margin, walk thresholds descending
    val groups = sc.groupBy(_._2).toSeq.sortBy(-_._1)
    var cpos = 0L; var call = 0L
    val ap = groups.map { case (_, g) =>
      val ca = g.count(_._1 == 1L).toLong
      cpos += ca; call += g.size
      if (nPos == 0) 0.0
      else (ca.toDouble / nPos) * (cpos.toDouble / call)
    }.sum
    assert(math.abs(r.getDouble(2) - ap) < 1e-5, s"ap ${r.getDouble(2)} vs $ap")
    // AP of a classifier must be >= the positive base rate achieved at
    // full recall times... just sanity-band (0, 1]
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0)
  }

  test("recsys_item_cf: cosines replayed from driver baskets") {
    val rows = q("recsys_item_cf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val e = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
        org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .select("o_custkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = e.groupBy(_._2).map { case (p, xs) => (p, xs.length.toLong) }
    val byC = e.groupBy(_._1).map { case (c, xs) => (c, xs.map(_._2).toSet) }
    rows.foreach { case (p1, deg1, rnk, p2, common, cosPpm) =>
      assert(deg(p1) == deg1)
      val exp = byC.values.count(b => b.contains(p1) && b.contains(p2)).toLong
      assert(exp == common, s"common($p1,$p2) $common vs $exp")
      val expCos = math.floor(1000000.0 * common /
        math.sqrt(deg(p1).toDouble * deg(p2).toDouble)).toLong
      assert(cosPpm == expCos)
      assert(rnk >= 1 && rnk <= 5)
    }
    // per-part neighbour lists are cosine-descending
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._6).sliding(2).forall(p =>
        p.length < 2 || p(0) >= p(1)))
    }
  }

  test("graph_eigenvector: two power rounds replayed on the driver") {
    val rows = q("graph_eigenvector").collect()
      .map(r => (r.getLong(0), BigInt(r.getLong(1)).bigInteger, r.getLong(2)))
    assert(rows.length == 20)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_suppkey", "l_partkey").collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1)).distinct
    val und = li ++ li.map(e => (e._2, e._1))
    val adj = und.groupBy(_._1).map { case (n, es) => (n, es.map(_._2)) }
    val x1 = adj.map { case (n, ns) => (n, BigInt(ns.length)) }
    def round(x: Map[Long, BigInt]): Map[Long, BigInt] =
      und.groupBy(_._2).map { case (v, es) =>
        (v, es.map(e => x.getOrElse(e._1, BigInt(0))).sum)
      }
    val x3 = round(round(x1))
    val total = x3.values.sum
    val top = x3.toSeq.sortBy { case (n, x) => (-x, n) }.take(20)
    rows.zip(top).foreach { case ((node, x3got, ppm), (expN, expX)) =>
      assert(node == expN, s"node order $node vs $expN")
      assert(BigInt(x3got) == expX)
      assert(ppm == (BigInt(1000000) * expX / total).toLong)
    }
  }

  test("layout_compaction_plan: bins partition files; sizes close") {
    val rows = q("layout_compaction_plan").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id % 197 AS f", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // totals close over all bins
    assert(rows.map(_._2).sum == d.map(_._1).distinct.length.toLong)
    assert(rows.map(_._3).sum == d.length.toLong)
    assert(rows.map(_._4).sum == d.map(_._2).sum)
    // bins are contiguous, non-overlapping file-key ranges
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach { p =>
      if (p.length == 2) assert(p(0)._6 < p(1)._5,
        "bin file ranges must not overlap")
    }
    // every bin except possibly the last holds >= target bytes once its
    // first file lands past the boundary: fill_ppm is bytes/target
    rows.foreach { r => assert(r._7 == 1000000L * r._4 / 131072L) }
  }

  test("timeseries_holt: recursion replayed from weekly counts") {
    val rows = q("timeseries_holt").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))
    assert(rows.length >= 2)
    val wk = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("CAST(date_trunc('week', ts) AS DATE) AS week")
      .groupBy("week").count().orderBy("week").collect()
      .map(_.getLong(1).toDouble)
    assert(rows.length == wk.length)
    var l = wk(0); var b = wk(1) - wk(0)
    rows.zipWithIndex.foreach { case ((i, y, lg, bg, f), ix) =>
      assert(i == ix + 1 && y == wk(ix).toLong)
      if (ix > 0) {
        val nl = 0.3 * wk(ix) + 0.7 * (l + b)
        b = 0.3 * (nl - l) + 0.7 * b
        l = nl
      }
      assert(math.abs(lg - l) < 1e-4, s"level $lg vs $l at $ix")
      assert(math.abs(bg - b) < 1e-4)
      assert(math.abs(f - (l + b)) < 1e-4)
    }
  }

  test("stats_fisher_exact: p matches an exact BigInt hypergeometric") {
    val r = q("stats_fisher_exact").head()
    val (a, b, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (r1, r2, c1, n) = (a + b, c + d, a + c, a + b + c + d)
    assert(n > 0)
    def fact(m: Long): BigInt = (BigInt(1) to BigInt(m)).product
    def choose(nn: Long, kk: Long): BigInt =
      if (kk < 0 || kk > nn) BigInt(0)
      else fact(nn) / (fact(kk) * fact(nn - kk))
    val denom = choose(n, c1)
    def pK(k: Long): Double =
      (BigDecimal(choose(r1, k) * choose(r2, c1 - k)) /
        BigDecimal(denom)).toDouble
    val pUpper = (a to math.min(r1, c1)).map(pK).sum
    assert(math.abs(r.getDouble(5) - pUpper) < 1e-5,
      s"p_upper ${r.getDouble(5)} vs $pUpper")
    assert(math.abs(r.getDouble(4) - pK(a)) < 1e-5)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.000001)
    // tail sum dominates the point probability
    assert(r.getDouble(5) >= r.getDouble(4) - 1e-9)
  }

  test("timeseries_hurst: R/S replayed for w=8; H consistent with points") {
    val rows = q("timeseries_hurst").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val days = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("CAST(ts AS DATE) AS day").groupBy("day").count()
      .orderBy("day").collect().map(_.getLong(1))
    def rsAvg(w: Int): (Long, Double) = {
      val blocks = days.grouped(w).filter(_.length == w).toSeq
      val vals = blocks.map { blk =>
        val sy = blk.sum
        val syy = blk.map(y => BigInt(y) * BigInt(y)).sum
        var cum = 0L
        val zs = blk.zipWithIndex.map { case (y, j) =>
          cum += y; w * cum - (j + 1).toLong * sy
        }
        val den = BigInt(w) * syy - BigInt(sy) * BigInt(sy)
        (zs.max - zs.min).toDouble / math.sqrt(den.toDouble)
      }
      (blocks.length.toLong, vals.sum / vals.length)
    }
    rows.foreach { case (w, nb, avg, _) =>
      val (enb, eavg) = rsAvg(w.toInt)
      assert(nb == enb)
      assert(math.abs(avg - eavg) < 1e-5, s"rs_avg($w) $avg vs $eavg")
    }
    // H from the emitted points reproduces h_est
    val pts = rows.map(r => (math.log(r._1.toDouble), math.log(r._3)))
    val np = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val h = (np * sxy - sx * sy) / (np * sxx - sx * sx)
    assert(math.abs(rows.head._4 - h) < 1e-3, s"h ${rows.head._4} vs $h")
  }

  test("timeseries_ljung_box: Q replayed; positive and finite") {
    val r = q("timeseries_ljung_box").head()
    val days = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("CAST(ts AS DATE) AS day").groupBy("day").count()
      .orderBy("day").collect().map(d => (d.getDate(0).toLocalDate, d.getLong(1)))
    val byDay = days.toMap
    val n = days.length.toDouble
    val sm = days.map(_._2).sum.toDouble
    val qq = days.map(d => d._2.toDouble * d._2).sum
    def acf(k: Int): Double = {
      val pts = days.flatMap { case (d0, x) =>
        byDay.get(d0.plusDays(k)).map(y => (x.toDouble, y.toDouble))
      }
      val pk = pts.length.toDouble
      val pkSum = pts.map(p => p._1 * p._2).sum
      val ak = pts.map(_._1).sum; val bk = pts.map(_._2).sum
      (n * n * pkSum - n * sm * (ak + bk) + pk * sm * sm) /
        (n * n * qq - n * sm * sm)
    }
    val expQ = n * (n + 2) *
      (1 to 7).map(k => math.pow(acf(k), 2) / (n - k)).sum
    assert(r.getLong(0) == n.toLong && r.getLong(1) == 7L)
    assert(math.abs(r.getDouble(2) - expQ) < 1e-4,
      s"Q ${r.getDouble(2)} vs $expQ")
    assert(r.getDouble(2) >= 0.0)
  }

  test("model_brier: exact decomposition replayed with BigInt floors") {
    val r = q("model_brier").head()
    val sc = scoredDocs().map { case (y, m) =>
      (y, math.min(math.max(500000L + 100L * m, 0L), 1000000L))
    }
    val n = BigInt(sc.size)
    val nPos = BigInt(sc.count(_._1 == 1L))
    val sq = sc.map { case (y, p) =>
      val d = BigInt(p) - BigInt(1000000) * y; d * d
    }.sum
    val bins = sc.groupBy { case (_, p) => math.min(p / 100000L, 9L) }
    val rel = bins.values.map { g =>
      val d = BigInt(g.map(_._2).sum) - BigInt(1000000) * g.count(_._1 == 1L)
      d * d / g.size
    }.sum
    val res = bins.values.map { g =>
      val d = BigInt(g.count(_._1 == 1L)) * n - BigInt(g.size) * nPos
      d * d * BigInt(1000000) * BigInt(1000000) / (BigInt(g.size) * n * n)
    }.sum
    val unc = nPos * (n - nPos) * BigInt(1000000) * BigInt(1000000) /
      (n * n) / n
    assert(r.getLong(0) == n.toLong && r.getLong(1) == nPos.toLong)
    assert(r.getLong(2) == (sq / n).toLong, "brier")
    assert(r.getLong(3) == (rel / n).toLong, "reliability")
    assert(r.getLong(4) == (res / n).toLong, "resolution")
    assert(r.getLong(5) == unc.toLong, "uncertainty")
    // NOTE: brier = rel − res + unc holds only for discrete forecasts;
    // binned continuous p leaves a within-bin variance/covariance
    // residual, so the identity is deliberately NOT asserted here.
  }

  test("model_fairness_slices: per-slice confusions replayed, gaps vs pooled") {
    import org.apache.spark.sql.functions.{col, lower, when}
    val sc = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"),
        when(col("lang") === "en", 1L).otherwise(0L).as("is_a"),
        functions.HashFunctions.linearMargin(
          functions.TextFunctions.tokens(lower(col("text")))).as("margin"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2) >= 0L))
    val per = sc.groupBy(_._1).view.mapValues { g =>
      (g.count(x => x._3 && x._2 == 1L).toLong,
       g.count(x => x._3 && x._2 == 0L).toLong,
       g.count(x => !x._3 && x._2 == 1L).toLong,
       g.count(x => !x._3 && x._2 == 0L).toLong)
    }.toMap
    val gtp = per.values.map(_._1).sum; val gfp = per.values.map(_._2).sum
    val gfn = per.values.map(_._3).sum; val gtn = per.values.map(_._4).sum
    val rows = q("model_fairness_slices").collect()
    assert(rows.length == per.size)
    rows.foreach { r =>
      val (tp, fp, fn, tn) = per(r.getString(0))
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        == ((tp, fp, fn, tn)))
      assert(r.getLong(1) == tp + fp + fn + tn)
      if (tp + fn > 0) {
        assert(r.getLong(6) == Math.floorDiv(1000000L * tp, tp + fn))
        assert(r.getLong(9) == Math.floorDiv(1000000L * tp, tp + fn)
          - Math.floorDiv(1000000L * gtp, gtp + gfn))
      }
      if (fp + tn > 0)
        assert(r.getLong(7) == Math.floorDiv(1000000L * fp, fp + tn))
    }
  }

  test("dq_psi_drift: bins partition orders, smoothed terms replayed") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_totalprice", "o_orderdate").collect()
      .map(r => (math.min(math.floor(r.getDouble(0) / 50000.0).toLong, 9L),
        r.getAs[java.time.LocalDateTime](1)
          .isBefore(java.time.LocalDateTime.parse("1998-01-01T00:00"))))
    val rows = q("dq_psi_drift").collect()
    assert(rows.length == 10 && rows.map(_.getLong(0)).toSeq == (0L to 9L))
    assert(rows.map(_.getLong(1)).sum == o.count(_._2).toLong)
    assert(rows.map(_.getLong(2)).sum == o.count(!_._2).toLong)
    val nRef = o.count(_._2).toDouble; val nCur = o.size - nRef
    rows.foreach { r =>
      val cr = o.count(x => x._1 == r.getLong(0) && x._2).toLong
      val cc = o.count(x => x._1 == r.getLong(0) && !x._2).toLong
      assert(r.getLong(1) == cr && r.getLong(2) == cc)
      val p = (cr + 1.0) / (nRef + 10.0); val qq = (cc + 1.0) / (nCur + 10.0)
      val term = BigDecimal((p - qq) * math.log(p / qq))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - term) < 1e-9)
    }
  }

  test("text_boilerplate: license flagged everywhere, newsletter below bar") {
    val rows = q("text_boilerplate").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(5)))
    val bySource = rows.groupBy(_._1)
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rs) =>
      val lic = rs.filter(_._2.contains("licensed under"))
      assert(lic.length == 1, s"$src license row")
      assert(lic.head._3 == lic.head._4 && lic.head._5 == 1L,
        s"$src license df=${lic.head._3} n=${lic.head._4}")
      rs.filter(_._2.contains("newsletter")).foreach { nl =>
        assert((nl._5 == 1L) == (10 * nl._3 >= 3 * nl._4))
      }
    }
  }

  test("text_boilerplate_apply: full driver replay of the strip") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val assembled = docs.map { case (id, src, txt) =>
      val parts = Seq(txt.take(120),
        "this content is licensed under the terms of the example license",
        txt.drop(120)) ++
        (if (id % 7 == 0) Seq("subscribe to our newsletter for updates")
         else Seq.empty)
      (id, src, parts.filter(_.trim.nonEmpty))
    }
    def key(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
    val nDocs = assembled.groupBy(_._2).view.mapValues(_.length).toMap
    val dfm = assembled.flatMap { case (id, src, ls) =>
      ls.map(l => (src, key(l), id))
    }.distinct.groupBy(x => (x._1, x._2)).view.mapValues(_.length).toMap
    val expect = assembled.map { case (id, src, ls) =>
      val kept = ls.filterNot(l => 10 * dfm((src, key(l))) >= 3 * nDocs(src))
      (id, (kept.length.toLong, kept.mkString("\n\n")))
    }.toMap
    val rows = q("text_boilerplate_apply").collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (nk, txt) = expect(r.getLong(0))
      assert(r.getLong(1) == nk && r.getString(2) == txt,
        s"doc ${r.getLong(0)}")
    }
  }

  test("layout_zonemap_prune: sorted layout dominates, match counts agree") {
    val rows = q("layout_zonemap_prune").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.map(_._1).toSeq == Seq("natural", "sorted"))
    val Seq(nat, srt) = rows.toSeq
    // same data, same predicate: identical totals and match counts
    assert(nat._4 == srt._4 && nat._6 == srt._6)
    // zone maps never under-scan: scanned rows cover every matching row
    assert(nat._5 >= nat._6 && srt._5 >= srt._6)
    // the point of sorting: strictly better row pruning than natural
    assert(srt._8 >= nat._8, s"sorted ${srt._8} vs natural ${nat._8}")
    assert(srt._3 <= srt._2 && nat._3 <= nat._2)
  }

  test("agg_weighted_median: replayed from the value domain") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2).toLong))
    val rows = q("agg_weighted_median").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = li.filter(_._1 == r.getString(0))
      val tot = g.map(_._3).sum
      val dom = g.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      var cum = 0L
      val med = dom.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
      assert(r.getDouble(1) == med && r.getLong(2) == tot)
    }
  }

  test("agg_hll_estimate: registers and estimate replayed with HashOps.mix64") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_partkey").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val rows = q("agg_hll_estimate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      val keys = li.filter(_._1 == flag).map(_._2)
      assert(r.getLong(1) == keys.distinct.length.toLong)
      val regs = scala.collection.mutable.Map[Long, Long]()
      keys.foreach { k =>
        val h = functions.HashOps.mix64(k)
        val bucket = h >>> 52
        val rest = h & ((1L << 52) - 1)
        val rho = if (rest == 0) 53L
          else 53L - (64 - java.lang.Long.numberOfLeadingZeros(rest))
        regs(bucket) = math.max(regs.getOrElse(bucket, 0L), rho)
      }
      val vZero = 4096L - regs.size
      assert(r.getLong(3) == vZero)
      val hsum = regs.toSeq.sortBy(_._1).map(x => 1.0 / (1L << x._2)).sum
      val eRaw = (0.7213 / (1.0 + 1.079 / 4096)) * 4096.0 * 4096.0 /
        (hsum + vZero.toDouble)
      val est = if (eRaw <= 2.5 * 4096 && vZero > 0)
        4096 * math.log(4096.0 / vZero) else eRaw
      assert(math.abs(r.getDouble(5) - est) < 1e-3, s"$flag est")
      // an HLL at p=12 on thousands of keys should sit within ~5%
      assert(math.abs(est / r.getLong(1) - 1.0) < 0.05, s"$flag accuracy")
    }
  }

  test("dq_referential_integrity: clean star edges, events orphans replayed") {
    val rows = q("dq_referential_integrity").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(rows.size == 6)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(rows(("lineitem", "l_orderkey"))._1 == li)
    // the star edges are referentially clean by construction
    Seq(("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
      ("lineitem", "l_suppkey"), ("orders", "o_custkey"),
      ("customer", "c_nationkey")).foreach { e =>
      assert(rows(e)._3 == 0L, s"$e orphans")
    }
    val custs = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id").collect().map(_.getLong(0))
    assert(rows(("events", "user_id"))._1 == ev.length.toLong)
    assert(rows(("events", "user_id"))._3 ==
      ev.count(u => !custs.contains(u)).toLong)
  }

  test("sample_systematic: evenly spaced positions over the date order") {
    val rows = q("sample_systematic").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(rows.length == ((n + 249) / 250).toInt)
    assert(rows.map(_._1).toSeq ==
      rows.indices.map(i => 1L + 250L * i))
    // replay the total order on the driver
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderdate", "o_orderkey").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getLong(1)))
      .sortBy(identity).map(_._2)
    rows.foreach { case (rn, ok) =>
      assert(ord((rn - 1).toInt) == ok, s"rank $rn")
    }
  }

  test("privacy_dp_counts: noise replayed from the seeded inverse CDF") {
    val rows = q("privacy_dp_counts").collect()
    val byNation = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_nationkey").collect().map(_.getInt(0).toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.length == byNation.size)
    rows.foreach { r =>
      val nation = r.getLong(0)
      assert(r.getLong(1) == byNation(nation))
      val h = functions.HashOps.mix64(nation)
      val u = ((h >>> 12).toDouble + 0.5) / (1L << 52).toDouble
      val noise = -2.0 * (if (u >= 0.5) 1.0 else -1.0) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5))
      assert(math.abs(r.getDouble(2) - noise) < 1e-4)
      assert(r.getLong(3) == math.round(r.getLong(1) + noise))
    }
  }

  test("join_bloom_prefilter: identical to the plain semi join, bloom admits all true keys") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val hotKeys = o.filter(col("o_totalprice") > 400000.0)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val plain = li.collect()
      .filter(r => hotKeys.contains(r.getAs[Long]("l_orderkey")))
      .groupBy(_.getAs[String]("l_returnflag"))
      .view.mapValues(_.length.toLong).toMap
    val rows = q("join_bloom_prefilter").collect()
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == plain)
    // revenue positive and flags complete
    rows.foreach(r => assert(r.getDouble(2) > 0.0))
  }

  test("timeseries_sax: z-normalized PAA symbols replayed on the driver") {
    val days = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("day"))
      .count().collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1).map(_._2)
    val n = days.length.toDouble
    val sy = days.sum.toDouble; val syy = days.map(d => d * d).sum.toDouble
    val mean = sy / n
    val sd = math.sqrt(n * syy - sy * sy) / n
    val z = days.map(y => (y - mean) / sd)
    val rows = q("timeseries_sax").collect()
    assert(rows.length == (days.length + 2) / 3)
    rows.foreach { r =>
      val seg = r.getLong(0).toInt
      val zs = z.slice(seg * 3, seg * 3 + 3)
      assert(r.getLong(1) == zs.length.toLong)
      val paa = zs.sum / zs.length
      assert(math.abs(r.getDouble(2) - paa) < 1e-6)
      val sym = if (paa < -0.6745) "a" else if (paa < 0.0) "b"
        else if (paa < 0.6745) "c" else "d"
      assert(r.getString(3) == sym)
    }
  }

  test("recsys_coverage: closing audit consistent with the item-CF rec lists") {
    val cf = q("recsys_item_cf").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    val r = q("recsys_coverage").head()
    assert(r.getLong(0) == cf.length.toLong, "n_recs")
    assert(r.getLong(1) == cf.map(_._3).distinct.length.toLong)
    val catalogN = spark.read.parquet(s"$sfDir/part.parquet").count()
    assert(r.getLong(2) == catalogN)
    assert(r.getLong(3) ==
      Math.floorDiv(1000000L * r.getLong(1), r.getLong(2)))
    // novelty is a mean of −log2(share) over shares < 1 → positive
    assert(r.getDouble(4) > 0.0)
    assert(r.getLong(5) > 0L && r.getLong(5) < 1000000L)
  }

  test("events_cep_match: matches replayed with a driver scan") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[java.time.LocalDateTime](2)))
    def replay(a: String, b: String): (Long, Long, Long) = {
      val ta = ev.filter(_._2 == a)
      val tb = ev.filter(_._2 == b)
      val byUser: Map[Long, Seq[java.time.LocalDateTime]] =
        tb.groupBy(_._1).view.mapValues(_.map(_._3).toSeq).toMap
      val matched = ta.filter { case (u, _, t0) =>
        byUser.getOrElse(u, Seq.empty).exists(t1 =>
          t1.isAfter(t0) && !t1.isAfter(t0.plusMinutes(30)))
      }
      (ta.length.toLong, matched.length.toLong,
        matched.map(_._1).distinct.length.toLong)
    }
    val rows = q("events_cep_match").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val Array(a, b) = r.getString(0).split("->")
      val (nt, nm, nu) = replay(a, b)
      assert(r.getLong(1) == nt && r.getLong(2) == nm && r.getLong(3) == nu,
        r.getString(0))
      assert(r.getLong(4) == Math.floorDiv(1000000L * nm, nt))
    }
  }

  test("stats_power_analysis: per-arm n replayed from the closed form") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_type").collect().map(_.getString(0))
    val n = ev.length.toDouble
    val pos = ev.count(_ == "purchase").toDouble
    val rows = q("stats_power_analysis").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(10000L, 20000L, 50000L))
    var prev = Long.MaxValue
    rows.foreach { r =>
      val delta = r.getLong(0).toDouble / 1e6
      val p1 = pos / n; val p2 = p1 + delta; val pbar = (p1 + p2) / 2.0
      val z = 1.959963984540054 * math.sqrt(2.0 * pbar * (1.0 - pbar)) +
        0.8416212335729143 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
      assert(r.getLong(2) == math.ceil(z * z / (delta * delta)).toLong)
      // bigger detectable effect → smaller experiment
      assert(r.getLong(2) < prev); prev = r.getLong(2)
    }
  }

  test("ab_srm_check: hash split is balanced and chi-square replays") {
    val keys = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0))
    val nA = keys.count(k => (functions.HashOps.mix64(k) & 1L) == 0L).toLong
    val nB = keys.length - nA
    val r = q("ab_srm_check").head()
    assert(r.getLong(0) == nA && r.getLong(1) == nB)
    val e = (nA + nB).toDouble / 2.0
    val chi2 = (nA - e) * (nA - e) / e + (nB - e) * (nB - e) / e
    assert(math.abs(r.getDouble(2) - chi2) < 1e-6)
    assert(r.getLong(3) == (if (chi2 > 3.841) 1L else 0L))
    // a healthy stable-hash split must not trip its own guardrail
    assert(r.getLong(3) == 0L)
  }

  test("tokenizer_fertility: per-source rollup of the per-doc encode stats") {
    val perDoc = q("tokenizer_bpe_apply").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val bySource = perDoc.toSeq.groupBy(x => src(x._1))
    val rows = q("tokenizer_fertility").collect()
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val g = bySource(r.getString(0)).map(_._2)
      val words = g.map(_._1).sum; val syms = g.map(_._3).sum
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == words && r.getLong(3) == syms)
      assert(r.getLong(4) == Math.floorDiv(1000000L * syms, words))
      // BPE merges only ever shrink: fertility ≤ chars per word
      assert(r.getLong(4) >= 1000000L, "at least one symbol per word")
    }
  }

  test("timeseries_forecast_eval: backtest errors replayed on the driver") {
    val days = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("day"))
      .count().collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1).map(_._2)
    val evalIdx = days.indices.drop(7)
    val n = evalIdx.length.toDouble
    def score(fc: Int => Double): (Double, Double) = {
      val es = evalIdx.map(i => (math.abs(days(i) - fc(i)), days(i)))
      (es.map(_._1).sum / n, es.map(e => e._1 / e._2).sum / n)
    }
    val exp = Map(
      "naive" -> score(i => days(i - 1).toDouble),
      "seasonal_naive" -> score(i => days(i - 7).toDouble),
      "expanding_mean" -> score(i => days.take(i).sum.toDouble / i))
    val rows = q("timeseries_forecast_eval").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (mae, mape) = exp(r.getString(0))
      assert(r.getLong(1) == evalIdx.length.toLong)
      assert(math.abs(r.getDouble(2) - mae) < 1e-5, s"${r.getString(0)} mae")
      assert(math.abs(r.getDouble(3) - mape) < 1e-5, s"${r.getString(0)} mape")
    }
  }

  test("feature_corr_matrix: cells match the built-in corr within 1e-6") {
    import org.apache.spark.sql.functions.corr
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val names = Map("qty" -> "l_quantity", "price" -> "l_extendedprice",
      "disc" -> "l_discount", "tax" -> "l_tax")
    val rows = q("feature_corr_matrix").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val ref = li.agg(corr(names(r.getString(0)), names(r.getString(1))))
        .head().getDouble(0)
      assert(math.abs(r.getDouble(3) - ref) < 1e-6,
        s"${r.getString(0)}/${r.getString(1)}")
    }
  }
}
