package graft

import org.apache.spark.sql.DataFrame

/** Oracle-independent recomputation of the statistics / experimentation
  * family on sf0.001: each test collects the RAW table(s), recomputes
  * the statistic in plain in-JVM Scala (a third implementation,
  * independent of both the Spark plan and the DuckDB SQL), and compares
  * exactly — plus the closed-form invariants (CUPED mean preservation,
  * CCDF monotonicity) that no engine-vs-engine diff can prove.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  /** (cents, isA) rows of the two-priority order sample. */
  private lazy val twoSample: Seq[(Long, Boolean)] = {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderpriority", "o_totalprice")
      .as[(String, Double)].collect().toSeq
    o.collect {
      case (p, v) if p == "1-URGENT" || p == "5-LOW" =>
        (math.round(v * 100), p == "1-URGENT")
    }
  }

  test("stats_ks_test equals a direct in-JVM KS computation") {
    val a = twoSample.filter(_._2).map(_._1).sorted
    val b = twoSample.filterNot(_._2).map(_._1).sorted
    val values = (a ++ b).distinct.sorted
    def cdfCount(s: Seq[Long], v: Long): Long = s.count(_ <= v).toLong
    val diffs = values.map(v =>
      (v, math.abs(cdfCount(a, v) * b.size - cdfCount(b, v) * a.size)))
    val dmax = diffs.map(_._2).max
    val dAt = diffs.filter(_._2 == dmax).map(_._1).min
    val expPpm = 1000000L * dmax / (a.size.toLong * b.size.toLong)

    val row = q("stats_ks_test").head()
    assert(row.getLong(row.fieldIndex("n_a")) == a.size.toLong)
    assert(row.getLong(row.fieldIndex("n_b")) == b.size.toLong)
    assert(row.getLong(row.fieldIndex("d_ppm")) == expPpm)
    assert(row.getLong(row.fieldIndex("d_at_cents")) == dAt)
    assert(expPpm > 0L && expPpm < 1000000L) // fixture is neither equal nor disjoint
  }

  test("stats_mann_whitney equals direct midrank computation; U symmetry") {
    val a = twoSample.filter(_._2).map(_._1)
    val b = twoSample.filterNot(_._2).map(_._1)
    val all = (a.map((_, true)) ++ b.map((_, false))).sortBy(_._1)
    // tie-corrected midranks, doubled to stay integral
    val byVal = all.groupBy(_._1).toSeq.sortBy(_._1)
    var cumBefore = 0L
    var r2a = 0L
    var tie = 0L
    byVal.foreach { case (_, rows) =>
      val t = rows.size.toLong
      val ca = rows.count(_._2).toLong
      r2a += ca * (2 * cumBefore + t + 1)
      tie += t * t * t - t
      cumBefore += t
    }
    val na = a.size.toLong
    val nb = b.size.toLong
    val u2a = r2a - na * (na + 1)

    val row = q("stats_mann_whitney").head()
    assert(row.getLong(row.fieldIndex("n_a")) == na)
    assert(row.getLong(row.fieldIndex("n_b")) == nb)
    assert(row.getLong(row.fieldIndex("u2_a")) == u2a)
    assert(row.getLong(row.fieldIndex("tie_term")) == tie)
    // U_A + U_B = nA·nB  ⇒  2U_A ∈ [0, 2·nA·nB]
    assert(u2a >= 0L && u2a <= 2 * na * nb)
    val z = (u2a - na * nb).toDouble / 2.0 /
      math.sqrt(na.toDouble * nb / 12.0 *
        ((na + nb + 1).toDouble - tie.toDouble /
          ((na + nb).toDouble * (na + nb - 1))))
    assert(row.getLong(row.fieldIndex("z_ppm")) == math.floor(1000000.0 * z).toLong)
  }

  test("stats_chi_square equals direct contingency computation, includes empty cells") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderpriority", "o_orderstatus")
      .as[(String, String)].collect().toSeq
    val n = o.size.toLong
    val obs = o.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val rs = o.groupBy(_._1).map { case (k, v) => (k, v.size.toLong) }
    val cs = o.groupBy(_._2).map { case (k, v) => (k, v.size.toLong) }
    // fold in (priority, status) order — the query's deterministic order
    val chi2 = (for {
      (p, rn) <- rs.toSeq.sortBy(_._1)
      (c, cn) <- cs.toSeq.sortBy(_._1)
    } yield {
      val ob = obs.getOrElse((p, c), 0L)
      val d = (ob * n - rn * cn).toDouble
      ((p, c), d * d / (n.toDouble * rn * cn))
    }).sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _)
    val dof = (rs.size - 1).toLong * (cs.size - 1).toLong

    val row = q("stats_chi_square").head()
    assert(row.getLong(row.fieldIndex("n")) == n)
    assert(row.getLong(row.fieldIndex("dof")) == dof)
    assert(row.getDouble(row.fieldIndex("chi2")) ==
      BigDecimal(chi2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the direct recompute above iterates the FULL r×c grid (obs
    // defaulted to 0), so the equality check covers the empty-cell
    // algebra whether or not this sf's fixture happens to have one
    assert(chi2 > 0.0)
  }

  test("ab_cuped_lift: mean preservation identity and variance-reduction bounds") {
    val rows = q("ab_cuped_lift").collect()
    assert(rows.length == 2)
    val byArm = rows.map(r => (r.getString(r.fieldIndex("arm")), r)).toMap
    assert(byArm.keySet == Set("control", "treatment"))
    val nTot = rows.map(_.getLong(1)).sum
    // Σ_arm n_arm·(x̄_arm − x̄_global) = 0 exactly, so the user-weighted
    // mean of CUPED-adjusted arm means equals the weighted raw mean.
    def weighted(col: String): Double = rows.map { r =>
      r.getLong(r.fieldIndex("n_users")) *
        r.getDouble(r.fieldIndex(col))
    }.sum / nTot
    assert(math.abs(weighted("mean_y_cuped") - weighted("mean_y")) < 1e-4)
    val r0 = rows.head
    val rho2 = r0.getDouble(r0.fieldIndex("var_reduction"))
    assert(rho2 >= 0.0 && rho2 <= 1.0)
    // theta identical across arms (pooled)
    assert(rows.map(_.getDouble(r0.fieldIndex("theta"))).distinct.length == 1)
  }

  test("privacy_t_closeness equals direct TVD over the full band domain") {
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_nationkey", "c_mktsegment", "c_acctbal")
      .as[(Int, String, Double)].collect().toSeq
      .map { case (n, s, b) => ((n, s), math.floor(b / 1000.0).toLong) }
    val nTot = c.size.toLong
    val global = c.groupBy(_._2).map { case (k, v) => (k, v.size.toLong) }
    val out = q("privacy_t_closeness")
      .select("c_nationkey", "c_mktsegment", "group_size", "tvd_ppm")
      .collect()
      .map(r => ((r.getInt(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val groups = c.groupBy(_._1)
    assert(out.keySet == groups.keySet)
    groups.foreach { case (qi, members) =>
      val ng = members.size.toLong
      val local = members.groupBy(_._2).map { case (k, v) => (k, v.size.toLong) }
      // direct TVD over the FULL global band domain (absent bands included)
      // NB: iterate the map's ENTRIES — mapping over `keys` (a Set view)
      // would dedup equal terms before the sum
      val num = global.iterator.map { case (band, cg) =>
        val cl = local.getOrElse(band, 0L)
        math.abs(cl * nTot - cg * ng)
      }.sum
      val (gotN, gotPpm) = out(qi)
      assert(gotN == ng)
      assert(gotPpm == 1000000L * num / (2 * ng * nTot),
        s"group $qi: got $gotPpm")
    }
  }

  test("feature_target_encode: LOO excludes own row, smoothing pulls to global mean") {
    val rows = q("feature_target_encode")
      .select("c_custkey", "c_nationkey", "revenue", "enc_loo")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    val byNation = rows.groupBy(_._2)
    val sAll = rows.map(_._3).sum
    val mu = sAll / rows.size
    rows.foreach { case (_, nat, y, enc) =>
      val grp = byNation(nat)
      val sg = grp.map(_._3).sum
      val exp = (sg - y + 10.0 * mu) / (grp.size - 1.0 + 10.0)
      assert(math.abs(enc - exp) < 1e-3, s"nation $nat enc $enc != $exp")
    }
    // a singleton nation's encode is the pure smoothed prior — never NaN
    assert(rows.forall(r => !r._4.isNaN && !r._4.isInfinite))
  }

  test("stats_mutual_information: direct recompute, information inequalities hold") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderpriority", "o_orderstatus")
      .as[(String, String)].collect().toSeq
    val n = o.size.toDouble
    val obs = o.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val rs = o.groupBy(_._1).map { case (k, v) => (k, v.size.toLong) }
    val cs = o.groupBy(_._2).map { case (k, v) => (k, v.size.toLong) }
    def h(m: Iterable[Long]): Double =
      math.log(n) - m.toSeq.sorted.map(c => c * math.log(c.toDouble))
        .foldLeft(0.0)(_ + _) / n
    // fold MI terms in (priority, status) order like the query
    val mi = obs.toSeq.sortBy(_._1).map { case ((p, c), cnt) =>
      (cnt / n) * math.log(cnt * n.toLong * n / (n * rs(p) * cs(c)))
    }.foldLeft(0.0)(_ + _)
    val row = q("stats_mutual_information").head()
    def g(c: String) = row.getDouble(row.fieldIndex(c))
    val (miQ, hrQ, hcQ, nmiQ) = (g("mi_nats"), g("h_rows"), g("h_cols"), g("nmi"))
    assert(math.abs(miQ - mi) < 2e-6, s"$miQ vs $mi")
    // independent recompute of the entropies via the same identity; the
    // fold order differs (count order vs label order) so compare loosely
    assert(math.abs(hrQ - h(rs.values)) < 1e-6)
    assert(math.abs(hcQ - h(cs.values)) < 1e-6)
    assert(miQ >= 0.0 && miQ <= math.min(hrQ, hcQ) + 1e-9)
    assert(nmiQ >= 0.0 && nmiQ <= 1.0)
  }

  test("stats_gini_lorenz: direct Gini recompute, Lorenz shares monotone and complete") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey", "o_totalprice")
      .as[(Long, Double)].collect().toSeq
    val cents = o.groupBy(_._1).toSeq
      .map { case (k, v) =>
        (k, v.map(t => BigDecimal(t._2).setScale(2)).sum.*(100).toLongExact) }
      .sortBy(t => (t._2, t._1))
    val nC = cents.size.toLong
    val s = cents.map(_._2).sum
    val s1 = cents.zipWithIndex.map { case ((_, c), i) => (i + 1) * c }.sum
    val gini = (2.0 * s1 - (nC + 1).toDouble * s) / (nC.toDouble * s)
    val rows = q("stats_gini_lorenz")
      .select("decile", "n_customers", "revenue_share_ppm", "gini")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq.sortBy(_._1)
    assert(rows.map(_._1) == (1L to 10L))
    assert(rows.map(_._2).sum == nC)
    assert(rows.head._4 == BigDecimal(gini).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    // Lorenz shares rise with the decile and floor-sum to ≤ 1e6
    rows.map(_._3).sliding(2).foreach {
      case Seq(a, b) => assert(a <= b); case _ => }
    val total = rows.map(_._3).sum
    assert(total <= 1000000L && total > 1000000L - 10L)
  }

  test("dq_benford: digit domain, share accounting, deviation arithmetic") {
    val rows = q("dq_benford")
      .select("digit", "n_obs", "share_ppm", "benford_ppm", "dev_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sortBy(_._1)
    assert(rows.map(_._1).forall(d => d >= 1L && d <= 9L))
    val n = rows.map(_._2).sum
    rows.foreach { case (d, nd, share, ben, dev) =>
      assert(share == 1000000L * nd / n)
      assert(ben == math.floor(1000000.0 * math.log10(1.0 + 1.0 / d)).toLong)
      assert(dev == math.abs(share - ben))
    }
    // Benford expectations themselves floor-sum to ~1e6
    val benSum = (1L to 9L).map(d =>
      math.floor(1000000.0 * math.log10(1.0 + 1.0 / d)).toLong).sum
    assert(benSum <= 1000000L && benSum > 1000000L - 10L)
  }

  test("stats_welch_ttest equals direct computation; agrees in sign with Mann-Whitney") {
    val a = twoSample.filter(_._2).map(_._1.toDouble / 100.0)
    val b = twoSample.filterNot(_._2).map(_._1.toDouble / 100.0)
    def sums(s: Seq[Double]) = (s.size.toLong,
      s.map(BigDecimal(_)).sum, s.map(v => BigDecimal(v) * BigDecimal(v)).sum)
    val (na, sxa, sxxa) = sums(a)
    val (nb, sxb, sxxb) = sums(b)
    val va = (sxxa.toDouble - sxa.toDouble * sxa.toDouble / na) / (na - 1)
    val vb = (sxxb.toDouble - sxb.toDouble * sxb.toDouble / nb) / (nb - 1)
    val se2 = va / na + vb / nb
    val tExp = math.floor(1000000.0 *
      (sxa.toDouble / na - sxb.toDouble / nb) / math.sqrt(se2)).toLong
    val dofExp = math.floor(1000.0 * se2 * se2 /
      (va * va / (na.toDouble * na * (na - 1)) +
       vb * vb / (nb.toDouble * nb * (nb - 1)))).toLong
    val row = q("stats_welch_ttest").head()
    assert(row.getLong(row.fieldIndex("n_a")) == na)
    assert(row.getLong(row.fieldIndex("n_b")) == nb)
    val tQ = row.getLong(row.fieldIndex("t_ppm"))
    assert(tQ == tExp, s"$tQ vs $tExp")
    assert(row.getLong(row.fieldIndex("dof_milli")) == dofExp)
    // dof bounded by min(n)-1 and n_a+n_b-2 (Welch-Satterthwaite range)
    val dof = dofExp / 1000.0
    assert(dof >= math.min(na, nb) - 1 - 1e-6 && dof <= na + nb - 2 + 1e-6)
    // parametric and rank tests must agree on the shift DIRECTION
    val mw = q("stats_mann_whitney").head()
    assert(tQ.sign == mw.getLong(mw.fieldIndex("z_ppm")).sign)
  }

  test("stats_proportion_ztest: z recomputed from independently-derived cells") {
    import org.apache.spark.sql.functions._
    // rebuild the (arm, converted) cells with a separate plan: per-user
    // purchase counts -> >= 14 bar -> stable-hash arm parity
    val cells = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("user_id")
      .agg(when(sum(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)) >= 14L, 1L).otherwise(0L).as("conv"))
      .withColumn("is_t", when(pmod(
        graft.functions.HashFunctions.fnv64(col("user_id").cast("string")),
        lit(2L)) === 0, 0L).otherwise(1L))
      .groupBy("is_t").agg(count(lit(1)).as("n"), sum("conv").as("k"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val (nC, kC) = cells(0L)
    val (nT, kT) = cells(1L)
    assert(kC > 0L && kC < nC && kT > 0L && kT < nT) // non-degenerate
    val p = (kT + kC).toDouble / (nT + nC)
    val zExp = math.floor(1000000.0 *
      (kT.toDouble / nT - kC.toDouble / nC) /
      math.sqrt(p * (1 - p) * (1.0 / nT + 1.0 / nC))).toLong
    val row = q("stats_proportion_ztest").head()
    assert(row.getLong(row.fieldIndex("n_t")) == nT)
    assert(row.getLong(row.fieldIndex("k_t")) == kT)
    assert(row.getLong(row.fieldIndex("n_c")) == nC)
    assert(row.getLong(row.fieldIndex("k_c")) == kC)
    assert(row.getLong(row.fieldIndex("z_ppm")) == zExp)
  }

  test("survival_km: direct KM recompute with censoring; curve invariants") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val t0 = e.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, v) => (u, v.map(_._3).min) }
    val lastSeen = e.groupBy(_._1).map { case (u, v) => (u, v.map(_._3).max) }
    val durs = t0.toSeq.map { case (u, s) =>
      val ev = e.filter(x => x._1 == u && x._2 == "purchase" && x._3 >= s)
        .map(_._3).sorted.headOption
      val rawH = ev match {
        case Some(p) => (p - s) / 3600000000L
        case None => (lastSeen(u) - s) / 3600000000L
      }
      (math.min(rawH, 72L), ev.isDefined && rawH < 72L)
    }
    val n = durs.size.toLong
    val per = durs.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, v) =>
      (t, v.count(_._2).toLong, v.count(!_._2).toLong)
    }
    var s = 1.0
    var seen = 0L
    val expected = per.map { case (t, d, c) =>
      val nRisk = n - seen
      s *= 1.0 - d.toDouble / nRisk
      seen += d + c
      (t, (d, c, nRisk, math.floor(1000000.0 * s).toLong))
    }.toMap
    val got = q("survival_km")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected, s"${got.size} vs ${expected.size}")
    // invariants: S nonincreasing; censoring-only rows keep S flat;
    // at-risk counts strictly decrease
    val rows = got.toSeq.sortBy(_._1)
    rows.map(_._2._4).sliding(2).foreach {
      case Seq(a, b) => assert(b <= a); case _ => }
    rows.sliding(2).foreach {
      case Seq((_, (_, _, _, s1)), (_, (d2, _, _, s2))) =>
        if (d2 == 0L) assert(s2 == s1)
      case _ => }
    // the 72 h administrative cutoff guarantees real censored mass
    assert(durs.exists(!_._2), "no censored users despite the cutoff")
    // the censored tail keeps the curve OFF zero (KM's whole point:
    // the naive CDF would pretend those users never convert)
    assert(rows.last._2._4 > 0L)
  }

  test("graph_degree_distribution: ccdf monotone, mass accounted, Hill alpha recomputed") {
    val rows = q("graph_degree_distribution")
      .select("degree", "n_nodes", "ccdf_ppm", "n_tail", "alpha_hill")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(rows.nonEmpty)
    assert(rows.map(_._1) == rows.map(_._1).sorted) // ordered by degree
    // ccdf decreases as degree rises; lowest degree row covers all nodes
    val ccdf = rows.map(_._3)
    ccdf.sliding(2).foreach { case Seq(hi, lo) => assert(lo <= hi); case _ => }
    assert(ccdf.head == 1000000L)
    val n = rows.map(_._2).sum
    val tailRows = rows.filter(_._1 >= 5L)
    val nTail = tailRows.map(_._2).sum
    assert(rows.head._4 == nTail)
    val hillSum = tailRows.sortBy(_._1).map { case (d, cnt, _, _, _) =>
      cnt.toDouble * math.log(d.toDouble / 4.5)
    }.foldLeft(0.0)(_ + _)
    val alpha = BigDecimal(1.0 + nTail.toDouble / hillSum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.head._5 == alpha)
    assert(alpha > 1.0)
    assert(n > 0L)
  }
}
