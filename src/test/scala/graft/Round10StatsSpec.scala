package graft

import java.sql.Date

/** Properties of the statistical-inference family (StatsQueries): each
  * query is replayed sequentially on the driver from the same raw events
  * and compared within float tolerance (the DuckDB oracle hash-gates the
  * exact floor-rounded values at sf0.01; these specs prove the STATISTICS
  * are the textbook ones, independent of the engine's decimal plumbing).
  */
class Round10StatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private lazy val events: Array[(Long, Date, String, Double)] =
    graft.ops.Tables.events(spark, dir)
      .selectExpr("user_id", "CAST(ts AS DATE) AS day", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1), r.getString(2), r.getDouble(3)))

  test("q_ab_test matches a sequential two-proportion z and Welch t replay") {
    val row = run("q_ab_test").collect().head
    // variant via the engine's own hash (pure function of the key)
    val ids = events.map(_._1).distinct
    val vdf = graft.ops.Tables.events(spark, dir)
      .select(org.apache.spark.sql.functions.col("user_id"))
      .distinct()
      .withColumn("v", graft.ops.TextAnalysis.hashBucket(
        org.apache.spark.sql.functions.col("user_id"), 2))
    val variant = vdf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(variant.keySet === ids.toSet)

    val byUser = events.groupBy(_._1)
    def usersOf(v: Long) = byUser.filter { case (u, _) => variant(u) == v }
    def conv(v: Long) = usersOf(v).count { case (_, es) =>
      es.exists(e => e._3 == "purchase" && e._4 >= 150) }
    val (nA, nB) = (usersOf(0).size, usersOf(1).size)
    val (xA, xB) = (conv(0), conv(1))
    assert(row.getAs[Long]("n_a") === nA.toLong)
    assert(row.getAs[Long]("conv_b") === xB.toLong)
    val (ra, rb) = (xA.toDouble / nA, xB.toDouble / nB)
    val p = (xA + xB).toDouble / (nA + nB)
    val z = (ra - rb) / math.sqrt(p * (1 - p) * (1.0 / nA + 1.0 / nB))
    assert(math.abs(row.getAs[Double]("z_conv") - z) < 1e-4)
    assert(row.getAs[Boolean]("sig_conv") === (math.abs(z) > 1.96))

    def purchases(v: Long) = usersOf(v).values.flatten
      .filter(_._3 == "purchase").map(_._4).toArray
    val (pa, pb) = (purchases(0), purchases(1))
    def meanVar(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val ((ma, va), (mb, vb)) = (meanVar(pa), meanVar(pb))
    val t = (ma - mb) / math.sqrt(va / pa.length + vb / pb.length)
    assert(math.abs(row.getAs[Double]("mean_a") - ma) < 1e-4)
    assert(math.abs(row.getAs[Double]("t_welch") - t) < 1e-3)
  }

  test("q_cusum_changepoint matches the sequential argmax-|CUSUM| replay") {
    val got = run("q_cusum_changepoint").collect()
      .map(r => r.getString(0) -> (r.getDate(1), r.getString(3), r.getDouble(4)))
      .toMap
    val types = events.map(_._3).distinct
    assert(got.keySet === types.toSet)
    for (et <- types) {
      val daily = events.filter(_._3 == et)
        .groupBy(_._2).map { case (d, es) => (d, es.map(_._4).sum) }
        .toSeq.sortBy(_._1.toString)
      val tot = daily.map(_._2).sum
      val dDays = daily.size
      // C_k = sum_{d<=k} S_d - k*tot/D, peak by |C| then earliest day
      var cum = 0.0
      val cs = daily.zipWithIndex.map { case ((day, s), i) =>
        cum += s; (day, cum - (i + 1) * tot / dDays)
      }
      // argmax |C| with ties broken by earliest day — replay explicitly
      val maxAbs = cs.map(c => math.abs(c._2)).max
      val first = cs.filter(c => math.abs(c._2) >= maxAbs - 1e-6).minBy(_._1.toString)
      val (gd, gdir, gmag) = got(et)
      assert(gd.toString === first._1.toString, s"cp day for $et")
      assert(gdir === (if (first._2 > 0) "up" else "down"), s"direction for $et")
      assert(math.abs(gmag - math.abs(first._2)) < 1e-3, s"magnitude for $et")
    }
  }

  test("q_survival_km matches sequential Kaplan-Meier and is monotone") {
    val rows = run("q_survival_km").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // monotone non-increasing, within (0, 1]
    val surv = rows.map(_._5)
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-12 })
    assert(surv.forall(s => s > 0 && s <= 1.0))

    // sequential KM replay
    val end = events.map(_._2.toString).max
    val durations = events.groupBy(_._1).toSeq.map { case (_, es) =>
      val firstDay = es.map(_._2.toString).min
      val evDay = es.filter(e => e._3 == "purchase" && e._4 >= 100)
        .map(_._2.toString).sorted.headOption
      def days(a: String, b: String) =
        (Date.valueOf(b).toLocalDate.toEpochDay - Date.valueOf(a).toLocalDate.toEpochDay).toInt
      evDay match {
        case Some(d) => (days(firstDay, d), true)
        case None    => (days(firstDay, end), false)
      }
    }
    val byT = durations.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = durations.size
    var s = 1.0
    val want = byT.flatMap { case (t, ds) =>
      val d = ds.count(_._2)
      val out = if (d > 0) {
        s *= (atRisk - d).toDouble / atRisk
        Some((t, atRisk.toLong, d.toLong, ds.count(!_._2).toLong, s))
      } else None
      atRisk -= ds.size
      out
    }
    assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSeq ===
      want.map(w => (w._1, w._2, w._3, w._4)))
    rows.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._5 - w._5) < 1e-5, s"KM at t=${g._1}") }
    assert(rows.exists(_._4 > 0) || durations.exists(!_._2),
      "fixture should include censored users somewhere in the life table")
  }

  test("q_key_skew matches a sequential Gini replay and flags the skewed key") {
    val got = run("q_key_skew").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    val li = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    for ((name, key) <- Seq("l_partkey" -> li.map(_._1), "l_suppkey" -> li.map(_._2))) {
      val counts = key.groupBy(identity).toSeq
        .map { case (k, vs) => (k, vs.length.toLong) }
        .sortBy { case (k, c) => (c, k) }
      val kk = counts.size
      val tot = counts.map(_._2).sum
      val sIc = counts.zipWithIndex.map { case ((_, c), i) => (i + 1).toLong * c }.sum
      val gini = 2.0 * sIc / (kk.toDouble * tot) - (kk + 1.0) / kk
      val (gKeys, gRows, gGini, gTop1, gTop10) = got(name)
      assert(gKeys === kk.toLong && gRows === tot)
      assert(math.abs(gGini - gini) < 1e-6, s"gini for $name")
      assert(math.abs(gTop1 - counts.last._2.toDouble / tot) < 1e-6)
      assert(math.abs(gTop10 - counts.takeRight(10).map(_._2).sum.toDouble / tot) < 1e-6)
      assert(gGini >= 0.0 && gGini < 1.0)
    }
  }

  test("q_link_prediction matches a sequential Adamic-Adar replay") {
    // sf0.01: the sf0.001 co-supply graph sparsifies to a clique set with
    // no non-adjacent two-hop pairs (0 rows) — the replay would be vacuous
    val dir = "/root/testdata/sf0.01"
    val gotRows = SparkEntry.queries("q_link_prediction")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
    val got = gotRows.toMap
    // driver replay of the co-supply build + AA scoring
    val ps = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = ps.groupBy(_._1).values.flatMap { g =>
      val ss = g.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- (i + 1) until ss.size) yield (ss(i), ss(j))
    }.toSeq.groupBy(identity).map { case (p, o) => (p, o.size.toLong) }.toSeq
    val tw = pairs.map(_._2).sum
    val ne = pairs.size
    val keep = pairs.collect { case ((a, b), w) if w * ne * 10 > tw * 11 => (a, b) }
    val adj = (keep ++ keep.map(_.swap)).groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2).toSet }
    val deg = adj.map { case (u, vs) => u -> vs.size }
    val cand = for {
      (u, nbrs) <- adj.toSeq; z <- nbrs; v <- adj(z)
      if u < v && !adj(u).contains(v)
    } yield ((u, v), z)
    val want = cand.groupBy(_._1).map { case (p, zs) =>
      val s = zs.map { case (_, z) =>
        math.floor(1.0 / math.log(deg(z)) * 1e9 + 0.5) / 1e9 }.sum
      // snap back to the 1e-9 grid: the engine sums DECIMAL(18,9) exactly,
      // the replay's double adds drift ~1e-16 — enough to break tie order
      p -> (zs.size.toLong, math.rint(s * 1e9) / 1e9)
    }
    // the emitted 50 must be the top-50 of the replay by (score, pair)
    val wantTop = want.toSeq
      .sortBy { case ((u, v), (_, s)) => (-s, u, v) }.take(50)
    assert(gotRows.length === math.min(50, want.size))
    gotRows.zip(wantTop).foreach { case ((gp, (gn, gs)), (wp, (wn, ws))) =>
      assert(gp === wp, s"pair order at $gp vs $wp")
      assert(gn === wn, s"n_common for $gp")
      assert(math.abs(gs - ws) < 1e-5, s"score for $gp")
    }
    // scores reward selective common neighbors: every score positive
    assert(got.values.forall(_._2 > 0))
  }

  test("q_psi_drift matches a sequential smoothed-PSI replay and is non-negative") {
    val got = run("q_psi_drift").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toMap
    val split = "2024-01-15"
    val types = events.map(_._3).distinct
    assert(got.keySet === types.toSet)
    for (et <- types) {
      val all = events.filter(_._3 == et)
        .map(e => (e._2.toString, math.floor(e._4 * 1e4 + 0.5).toLong))
      val ref = all.filter(_._1 <= split).map(_._2).sorted
      val cur = all.filter(_._1 > split).map(_._2)
      val n = ref.length
      val bounds = (1 to 7).map(i => ref(math.max(1L, i.toLong * n / 8).toInt - 1))
      def bin(u: Long) = bounds.count(b => u > b)
      val nr = ref.groupBy(bin).map { case (b, vs) => b -> vs.length }
      val nc = cur.groupBy(bin).map { case (b, vs) => b -> vs.length }
      val bins = (nr.keySet ++ nc.keySet).toSeq.sorted
      val (tr, tc) = (ref.length, cur.length)
      val psi = bins.map { b =>
        val (a, c) = (nr.getOrElse(b, 0) + 1.0, nc.getOrElse(b, 0) + 1.0)
        val (p, q) = (a / (tr + 8), c / (tc + 8))
        (p - q) * math.log(p / q)
      }.sum
      val (gr, gc, gpsi, gflag) = got(et)
      assert(gr === tr.toLong && gc === tc.toLong, s"window sizes for $et")
      assert(math.abs(gpsi - psi) < 1e-5, s"psi for $et: got $gpsi want $psi")
      assert(gpsi >= 0.0, "PSI terms are individually non-negative")
      assert(gflag === (gpsi > 0.1))
    }
  }

  test("q_cluster_terms ranks c-TF-IDF exactly as a replay over the verified components") {
    // (doc_id, comp) from the already-oracle-verified components query
    val comps = run("q_dedup_components").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val multiComps = comps.groupBy(_._2).filter(_._2.size >= 2).keySet
    val multi = comps.filter { case (_, c) => multiComps.contains(c) }
    val docs = graft.ops.Tables.documents(spark, dir)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def toks(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val tf = multi.toSeq.flatMap { case (d, c) => toks(docs(d)).map(t => (c, t)) }
      .groupBy(identity).map { case (k, o) => k -> o.size }
    val nComp = multi.values.toSet.size
    val cdf = tf.keys.toSeq.groupBy(_._2).map { case (t, ks) => t -> ks.size }
    val want = tf.toSeq.map { case ((c, t), f) =>
      val idf = math.floor((math.log(nComp + 1.0) - math.log(cdf(t).toDouble)) * 1e9 + 0.5) / 1e9
      (c, t, f, math.rint(f * idf * 1e9) / 1e9)
    }.groupBy(_._1).toSeq.flatMap { case (c, ts) =>
      ts.sortBy(x => (-x._4, x._2)).take(3).zipWithIndex
        .map { case ((_, t, f, s), i) => (c, i + 1, t, f.toLong, s) }
    }.sortBy(x => (x._1, x._2))
    val gotRows = run("q_cluster_terms").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(gotRows.length === want.length)
    gotRows.zip(want).foreach { case (g, w) =>
      assert((g._1, g._2, g._3, g._4) === ((w._1, w._2, w._3, w._4)), s"row $g vs $w")
      assert(math.abs(g._5 - w._5) < 1e-5, s"score at ${g._1}/${g._3}")
    }
    assert(gotRows.nonEmpty, "fixture should surface at least one multi-doc cluster")
  }

  test("q_mutual_info matches a sequential MI/chi2/CramersV replay") {
    val row = run("q_mutual_info").collect().head
    val joint = graft.ops.Tables.orders(spark, dir)
      .selectExpr("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val seg = graft.ops.Tables.customer(spark, dir)
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = joint.map { case (ck, pr) => (seg(ck), pr) }
    val nxy = pairs.groupBy(identity).map { case (k, o) => k -> o.length }
    val nx = pairs.groupBy(_._1).map { case (k, o) => k -> o.length }
    val ny = pairs.groupBy(_._2).map { case (k, o) => k -> o.length }
    val n = pairs.length.toDouble
    val mi = nxy.map { case ((x, y), c) =>
      c / n * math.log(c * n / (nx(x).toDouble * ny(y)))
    }.sum
    val chi2 = nxy.map { case ((x, y), c) =>
      val e = nx(x).toDouble * ny(y) / n
      (c - e) * (c - e) / e
    }.sum
    val v = math.sqrt(chi2 / (n * math.min(nx.size - 1, ny.size - 1)))
    assert(row.getAs[Long]("n") === pairs.length.toLong)
    assert(row.getAs[Long]("r_levels") === nx.size.toLong)
    assert(row.getAs[Long]("c_levels") === ny.size.toLong)
    assert(math.abs(row.getAs[Double]("mi") - mi) < 1e-4)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 0.05)
    assert(math.abs(row.getAs[Double]("cramers_v") - v) < 1e-4)
    assert(row.getAs[Double]("mi") >= 0.0, "MI is non-negative")
    assert(row.getAs[Double]("cramers_v") >= 0.0 && row.getAs[Double]("cramers_v") <= 1.0)
  }

  test("q_benford matches a sequential first-digit replay") {
    val rows = run("q_benford").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val prices = graft.ops.Tables.orders(spark, dir)
      .selectExpr("o_totalprice").collect().map(_.getDouble(0))
      .filter(_ >= 0.005)
    val digits = prices.map(p => math.floor(p * 100 + 0.5).toLong.toString.head.asDigit)
    val counts = digits.groupBy(identity).map { case (d, o) => d -> o.length.toLong }
    val nTot = digits.length
    assert(rows.map(r => r._1 -> r._2).toMap === counts)
    var chi2 = 0.0
    for (d <- counts.keys.toSeq.sorted) {
      val expF = math.floor(math.log(1.0 + 1.0 / d) / math.log(10.0) * 1e9 + 0.5) / 1e9
      val obsF = counts(d).toDouble / nTot
      chi2 += (obsF - expF) * (obsF - expF) / expF
    }
    chi2 *= nTot
    rows.foreach { r =>
      val expF = math.log(1.0 + 1.0 / r._1) / math.log(10.0)
      assert(math.abs(r._4 - expF) < 1e-6, s"exp_frac digit ${r._1}")
      assert(math.abs(r._3 - counts(r._1).toDouble / nTot) < 1e-6)
      assert(math.abs(r._5 - chi2) < 0.01, "chi2 column")
    }
  }

  test("q_abc_class matches a sequential Pareto replay and partitions all parts") {
    val got = run("q_abc_class").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val li = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("l_partkey", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getLong(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong
          * (100 - math.floor(r.getDouble(2) * 100 + 0.5).toLong)))
    val rev = li.groupBy(_._1).toSeq.map { case (p, rs) => (p, rs.map(_._2).sum) }
      .sortBy { case (p, r) => (-r, p) }
    val tot = rev.map(_._2).sum
    var cum = 0L
    val cls = rev.map { case (_, r) =>
      cum += r
      if (cum * 20 <= tot * 16) ("A", r) else if (cum * 20 <= tot * 19) ("B", r) else ("C", r)
    }
    val want = cls.groupBy(_._1).map { case (c, rs) =>
      c -> (rs.size.toLong, rs.map(_._2).sum.toDouble / tot) }
    assert(got.keySet === want.keySet)
    for ((c, (n, share)) <- want) {
      assert(got(c)._1 === n, s"class $c size")
      assert(math.abs(got(c)._2 - share) < 1e-6, s"class $c share")
    }
    assert(got.values.map(_._1).sum === rev.size.toLong, "classes partition the parts")
    // class shares honor the cut points (the synthetic revenue distribution
    // is near-uniform, so A holds ~80% of revenue across ~73% of parts —
    // the CLASSIFICATION is what's pinned, not a power-law shape)
    assert(got("A")._2 <= 0.80 + 1e-6 && got("A")._2 + got("B")._2 <= 0.95 + 1e-6)
  }

  test("q_inventory_balance cumulates weekly nets exactly for every emitted part") {
    val rows = run("q_inventory_balance").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.map(_._1).distinct.length <= 20)
    for ((pk, prows) <- rows.groupBy(_._1)) {
      val ordered = prows.sortBy(_._2)
      var bal = 0.0
      for ((_, _, net, balance) <- ordered) {
        bal += net
        assert(math.abs(balance - bal) < 1e-6, s"balance for part $pk")
      }
    }
    // replay one part fully from the fact table
    val pk = rows.head._1
    val li = graft.ops.Tables.lineitem(spark, dir)
      .filter(org.apache.spark.sql.functions.col("l_partkey") === pk)
      .selectExpr("CAST(date_trunc('week', l_shipdate) AS DATE) AS wk",
        "l_returnflag", "l_quantity").collect()
      .map(r => (r.getDate(0).toString,
        (if (r.getString(1) == "R") 1L else -1L)
          * math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val weekly = li.groupBy(_._1).toSeq
      .map { case (w, rs) => (w, rs.map(_._2).sum / 100.0) }.sortBy(_._1)
    val gotPart = rows.filter(_._1 == pk).sortBy(_._2)
    assert(gotPart.map(r => (r._2, r._3)).toSeq === weekly)
  }

  test("q_ewma_anomaly matches the recursive smoother and flags 50% jumps") {
    val rows = run("q_ewma_anomaly").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    for ((et, ers) <- rows.groupBy(_._1)) {
      val ordered = ers.sortBy(_._2)
      var e = 0.0
      ordered.zipWithIndex.foreach { case ((_, _, s, ewma, spike), i) =>
        val prev = e
        e = if (i == 0) s else (s + e) / 2
        assert(math.abs(ewma - e) < 1e-4, s"ewma at $et day $i")
        val wantSpike = i > 0 && math.abs(s - prev) > prev / 2
        assert(spike === wantSpike, s"spike at $et day $i")
      }
    }
    assert(rows.map(_._1).distinct.length === 5)
  }

  test("q_lang_confusion: P/R/F1 replay from the verified per-doc predictions") {
    val preds = run("q_text_lang_id").collect()
      .map(r => (r.getString(1), r.getString(2))) // (declared, predicted)
    val rows = run("q_lang_confusion").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    val langs = preds.map(_._1).distinct
    assert(rows.keySet === langs.toSet, "one row per DECLARED language")
    val accuracy = preds.count(p => p._1 == p._2).toDouble / preds.length
    for (l <- langs) {
      val (nDocs, tp, nPred, p, r, f1, acc) = rows(l)
      val wantDocs = preds.count(_._1 == l)
      val wantTp = preds.count(x => x._1 == l && x._2 == l)
      val wantPred = preds.count(_._2 == l)
      assert((nDocs, tp, nPred) === ((wantDocs.toLong, wantTp.toLong, wantPred.toLong)), s"counts for $l")
      val wp = if (wantPred > 0) wantTp.toDouble / wantPred else 0.0
      val wr = if (wantDocs > 0) wantTp.toDouble / wantDocs else 0.0
      val wf = if (wp + wr > 0) 2 * wp * wr / (wp + wr) else 0.0
      assert(math.abs(p - wp) < 1e-6 && math.abs(r - wr) < 1e-6
        && math.abs(f1 - wf) < 1e-6, s"P/R/F1 for $l")
      assert(math.abs(acc - accuracy) < 1e-6)
    }
  }

  test("q_vocab_coverage: OOV replay against a driver-built top-500 vocabulary") {
    val rows = run("q_vocab_coverage").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    def toks(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val docs = graft.ops.Tables.documents(spark, dir)
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), toks(r.getString(1))))
    val freq = docs.flatMap(_._2).groupBy(identity)
      .map { case (t, o) => t -> o.size }.toSeq
    val vocab = freq.sortBy { case (t, f) => (-f, t) }.take(500).map(_._1).toSet
    for ((src, srcDocs) <- docs.groupBy(_._1)) {
      val all = srcDocs.flatMap(_._2)
      val covered = all.count(vocab.contains)
      val types = all.distinct
      val (nTok, nCov, nTypes, oovTypes, oovRate) = rows(src)
      assert(nTok === all.size.toLong && nCov === covered.toLong, s"counts for $src")
      assert(nTypes === types.size.toLong)
      assert(oovTypes === types.count(t => !vocab.contains(t)).toLong)
      assert(math.abs(oovRate - (1.0 - covered.toDouble / all.size)) < 1e-6)
    }
    // the corpus vocabulary covers the corpus better than random: every
    // source's OOV rate is below 1 and the global mean is meaningful
    assert(rows.values.forall(_._5 < 1.0))
  }

  test("MomentMatrix equals the brute-force quantized outer product") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(40)(Array.fill(3)((rnd.nextDouble() * 4 - 2).toFloat))
    val got = vecs.map(v => Tuple1(v)).toDF("v").repartition(7)
      .agg(org.apache.spark.sql.functions.udaf(
        graft.functions.MomentMatrix(3),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())(
        org.apache.spark.sql.functions.col("v")))
      .collect().head.getSeq[Long](0).toArray
    def q(x: Float) = math.floor(x * 1e6 + 0.5).toLong
    val want = new Array[Long](3 + 6)
    for (v <- vecs) {
      val e = v.map(q)
      for (i <- 0 until 3) want(i) += e(i)
      var k = 3
      for (i <- 0 until 3; j <- i until 3) { want(k) += e(i) * e(j); k += 1 }
    }
    assert(got.toSeq === want.toSeq)
    assert(graft.functions.MomentMatrix.maxRowsAt1e6(2.0) > 1000000L,
      "unit-scale embeddings leave 7 digits of row headroom")
  }

  test("q_pca_power emits a unit eigenvector with a tight eigen-residual") {
    val rows = run("q_pca_power").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.length === 64)
    val v = rows.map(_._2)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"loadings normalized, got $norm")
    // sign canon: the largest-|loading| component is positive
    val mx = v.map(math.abs).max
    assert(v(v.indexWhere(x => math.abs(x) == mx)) > 0)
    val explained = rows.head._4
    assert(explained > 0 && explained <= 1.0)
    assert(rows.forall(r => r._3 == rows.head._3 && r._4 == explained))
    // eigen-residual: rebuild covariance from raw data, check ||Cv - λv||
    val emb = graft.ops.Tables.embeddings(spark, dir)
      .selectExpr("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x * 1e6 + 0.5) / 1e6).toArray)
    val n = emb.length
    val mean = Array.tabulate(64)(i => emb.map(_(i)).sum / n)
    def cov(i: Int, j: Int) =
      emb.map(e => (e(i) - mean(i)) * (e(j) - mean(j))).sum / n
    val C = Array.tabulate(64, 64)(cov)
    val w = Array.tabulate(64)(i => (0 until 64).map(j => C(i)(j) * v(j)).sum)
    val lam = (0 until 64).map(i => v(i) * w(i)).sum
    val resid = math.sqrt((0 until 64).map(i => {
      val d = w(i) - lam * v(i); d * d
    }).sum) / lam
    assert(resid < 0.05, s"eigen-residual $resid too large — not an eigenvector")
    assert(math.abs(rows.head._3 - lam) / lam < 0.01,
      "reported eigenvalue matches the raw-data quadratic form")
  }

  test("q_new_vs_returning: first-seen split replay; actives reconcile") {
    val rows = run("q_new_vs_returning").collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    val du = events.map(e => (e._2.toString, e._1)).distinct
    val firstDay = du.groupBy(_._2).map { case (u, ds) => u -> ds.map(_._1).min }
    for ((day, dayUsers) <- du.groupBy(_._1)) {
      val active = dayUsers.map(_._2).distinct
      val nNew = active.count(u => firstDay(u) == day)
      val (ga, gn, gr, pct) = rows(day)
      assert(ga === active.length.toLong && gn === nNew.toLong, s"counts for $day")
      assert(gr === (active.length - nNew).toLong)
      assert(math.abs(pct - nNew.toDouble / active.length) < 1e-6)
    }
    // day one: everyone is new
    val d0 = rows.keys.min
    assert(rows(d0)._3 === 0L && rows(d0)._4 === 1.0)
  }

  test("q_seasonality_dow: indexes replay and average to ~1 weighted by days") {
    val rows = run("q_seasonality_dow").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toMap
    for (et <- events.map(_._3).distinct) {
      val daily = events.filter(_._3 == et)
        .groupBy(_._2.toString).map { case (d, es) => (d, es.map(_._4).sum) }.toSeq
      val overall = daily.map(_._2).sum / daily.size
      val byDow = daily.groupBy { case (d, _) =>
        java.time.LocalDate.parse(d).getDayOfWeek.getValue - 1 } // Monday = 0
      for ((dow, ds) <- byDow) {
        val avg = ds.map(_._2).sum / ds.size
        val (nDays, gAvg, gIdx) = rows((et, dow))
        assert(nDays === ds.size.toLong, s"$et dow $dow n_days")
        assert(math.abs(gAvg - avg) < 0.01, s"$et dow $dow avg")
        assert(math.abs(gIdx - avg / overall) < 1e-4, s"$et dow $dow idx")
      }
      // day-weighted mean of the indexes is 1 by construction
      val wn = byDow.values.map(_.size).sum
      val weighted = byDow.map { case (dow, ds) =>
        rows((et, dow))._3 * ds.size }.sum / wn
      assert(math.abs(weighted - 1.0) < 1e-3, s"$et weighted index mean $weighted")
    }
  }

  test("q_rolling_corr matches a sequential windowed Pearson replay") {
    val rows = run("q_rolling_corr").collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val daily = events.groupBy(_._2.toString).toSeq.sortBy(_._1).map { case (_, es) =>
      (es.filter(_._3 == "purchase").map(_._4).sum,
        es.filter(_._3 == "click").map(_._4).sum)
    }
    assert(rows.length === daily.length - 13)
    for ((got, idx) <- rows.zipWithIndex) {
      val wnd = daily.slice(idx, idx + 14)
      val (xs, ys) = (wnd.map(_._1), wnd.map(_._2))
      val m = 14.0
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val syy = ys.map(b => b * b).sum
      val r = (m * sxy - sx * sy) / math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
      assert(math.abs(got._4 - r) < 1e-4, s"corr at ${got._1}")
      assert(math.abs(got._4) <= 1.0 + 1e-9)
    }
  }

  test("q_lsh_calibration: agreement tracks true Jaccard; banding floor holds") {
    val rows = run("q_lsh_calibration").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // every candidate pair shares a FULL band of 4 coords — agreement >= 4
    assert(rows.head._1 >= 4, s"band guarantee violated: agree=${rows.head._1}")
    assert(rows.forall(r => r._1 <= 16 && r._2 > 0 && r._4 <= r._3 && r._3 <= r._5))
    // estimator direction: top-agreement pairs have higher mean Jaccard
    // than bottom-agreement pairs
    if (rows.length >= 2)
      assert(rows.last._3 >= rows.head._3, "agreement should track Jaccard")
    // pair counts reconcile with the verified pair set
    val nPairs = run("q_dedup_minhash_pairs").count()
    assert(rows.map(_._2).sum === nPairs)
  }

  test("q_dedup_savings reconciles with the components' survivor policy") {
    val comps = run("q_dedup_components").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap // doc_id -> survivor
    val docs = graft.ops.Tables.documents(spark, dir)
      .selectExpr("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val got = run("q_dedup_savings").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    for ((src, ds) <- docs.groupBy(_._2)) {
      val dupes = ds.filter(d => !comps.getOrElse(d._1, true))
      val (nd, ndup, bt, bd, pct) = got(src)
      assert(nd === ds.length.toLong && ndup === dupes.length.toLong, s"counts for $src")
      assert(bt === ds.map(_._3).sum && bd === dupes.map(_._3).sum, s"bytes for $src")
      assert(math.abs(pct - bd.toDouble / bt) < 1e-6)
    }
    assert(got.values.exists(_._2 > 0), "corpus should contain some dupes")
  }

  test("q_forecast_eval: naive and seasonal-naive baselines replay exactly") {
    val got = run("q_forecast_eval").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toMap
    val types = events.map(_._3).distinct
    for (et <- types; (method, lagN) <- Seq("naive" -> 1, "seasonal_naive" -> 7)) {
      val daily = events.filter(_._3 == et)
        .groupBy(_._2.toString).map { case (d, es) => (d, es.map(_._4).sum) }
        .toSeq.sortBy(_._1).map(_._2)
      val pairs = daily.drop(lagN).zip(daily.dropRight(lagN))
      val mae = pairs.map { case (a, f) => math.abs(a - f) }.sum / pairs.length
      val smape = pairs.map { case (a, f) => 2 * math.abs(a - f) / (a + f) }.sum / pairs.length
      val (n, gm, gs) = got((et, method))
      assert(n === pairs.length.toLong, s"$et/$method n_days")
      assert(math.abs(gm - mae) < 0.01, s"$et/$method mae")
      assert(math.abs(gs - smape) < 1e-4, s"$et/$method smape")
    }
    // seasonal-naive should beat naive on a weekly-seasonal series OR at
    // least both be finite and positive
    assert(got.values.forall(v => v._2 > 0 && v._3 > 0 && v._3 < 2.0))
  }

  test("q_power_analysis: required n follows the two-proportion formula") {
    val row = run("q_power_analysis").collect().head
    val (nA, nB) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"))
    val (ra, rb) = (row.getAs[Double]("rate_a"), row.getAs[Double]("rate_b"))
    val zsum = 1.959964 + 0.841621
    val want = math.ceil(zsum * zsum * (ra * (1 - ra) + rb * (1 - rb))
      / ((ra - rb) * (ra - rb)))
    val gotN = row.getAs[Long]("n_required_per_arm")
    // rates are 6dp-rounded in the output; allow the formula wiggle
    assert(math.abs(gotN - want) / want < 0.01, s"n_req $gotN vs $want")
    assert(row.getAs[Boolean]("powered") === (math.min(nA, nB) >= gotN))
  }

  test("q_graph_assortativity is the Pearson of endpoint degrees (sf0.01 graph)") {
    val dir = "/root/testdata/sf0.01"
    val row = SparkEntry.queries("q_graph_assortativity")(spark, dir).collect().head
    // rebuild edges exactly as the link-prediction replay does
    val ps = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("l_partkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = ps.groupBy(_._1).values.flatMap { g =>
      val ss = g.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- (i + 1) until ss.size) yield (ss(i), ss(j))
    }.toSeq.groupBy(identity).map { case (p, o) => (p, o.size.toLong) }.toSeq
    val tw = pairs.map(_._2).sum; val ne = pairs.size
    val keep = pairs.collect { case ((a, b), w) if w * ne * 10 > tw * 11 => (a, b) }
    val edges = keep ++ keep.map(_.swap)
    val deg = edges.groupBy(_._1).map { case (u, es) => u -> es.size }
    val xy = edges.map { case (u, v) => (deg(u).toDouble, deg(v).toDouble) }
    val m = xy.size
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val r = (m * sxy - sx * sy) / math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    assert(row.getAs[Long]("n_directed_edges") === m.toLong)
    assert(math.abs(row.getAs[Double]("assortativity") - r) < 1e-5)
    assert(math.abs(row.getAs[Double]("assortativity")) <= 1.0)
  }

  test("q_lexical_diversity: TTR/Simpson/hapax replay per source") {
    val got = run("q_lexical_diversity").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    def toks(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val docs = graft.ops.Tables.documents(spark, dir)
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), toks(r.getString(1))))
    for ((src, ds) <- docs.groupBy(_._1)) {
      val all = ds.flatMap(_._2)
      val counts = all.groupBy(identity).map(_._2.size)
      val nTok = all.size.toLong; val nTyp = counts.size.toLong
      val rep = counts.map(n => n.toLong * (n - 1)).sum.toDouble
      val (gt, gy, ttr, simp, hap) = got(src)
      assert(gt === nTok && gy === nTyp, s"counts for $src")
      assert(math.abs(ttr - nTyp.toDouble / nTok) < 1e-6)
      assert(math.abs(simp - rep / (nTok.toDouble * (nTok - 1))) < 1e-6)
      assert(math.abs(hap - counts.count(_ == 1).toDouble / nTyp) < 1e-6)
    }
  }

  test("q_attribution_markov matches a sequential removal-effect replay") {
    val rows = run("q_attribution_markov").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    val channels = Seq("click", "error", "signup", "view")
    assert(rows.keySet === channels.toSet)
    // attribution shares sum to ~1; base conv in (0, 1]
    val base = rows.values.head._2
    assert(base > 0 && base <= 1.0)
    assert(math.abs(rows.values.map(_._4).sum - 1.0) < 1e-4)
    // full sequential replay from raw events
    var counts = Map.empty[(String, String), Long].withDefaultValue(0L)
    val evSorted = graft.ops.Tables.events(spark, dir)
      .selectExpr("user_id", "ts_ns div 1000 AS ts_us", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    for ((_, es) <- evSorted.groupBy(_._1)) {
      val ordered = es.sortBy(e => (e._2, e._3))
      val cut = ordered.indexWhere(_._4 == "purchase")
      val (path, converted) =
        if (cut >= 0) (ordered.take(cut).map(_._4), true)
        else (ordered.map(_._4), false)
      var prev = "start"
      for (c <- path) { counts += ((prev, c) -> (counts((prev, c)) + 1)); prev = c }
      val terminal = if (converted) "conv" else "null"
      counts += ((prev, terminal) -> (counts((prev, terminal)) + 1))
    }
    val outBy = ("start" +: channels).map(s =>
      s -> counts.collect { case ((`s`, _), n) => n }.sum).toMap
    def t(s: String, d: String) =
      if (outBy(s) == 0L) 0.0 else counts((s, d)).toDouble / outBy(s)
    def absorb(removed: Option[String]): Double = {
      var p = channels.map(_ => 0.0)
      for (_ <- 1 to 20)
        p = channels.map(s => if (removed.contains(s)) 0.0
          else channels.zipWithIndex.foldLeft(t(s, "conv")) {
            case (a, (c, i)) => a + t(s, c) * p(i) })
      channels.zipWithIndex.foldLeft(t("start", "conv")) {
        case (a, (c, i)) => a + t("start", c) * p(i) }
    }
    val wantBase = absorb(None)
    assert(math.abs(base - wantBase) < 1e-5, s"base $base vs $wantBase")
    for (c <- channels) {
      val eff = (wantBase - absorb(Some(c))) / wantBase
      assert(math.abs(rows(c)._3 - eff) < 1e-5, s"removal effect for $c")
      assert(rows(c)._1 === outBy(c), s"n_visits for $c")
    }
  }

  test("q_pca_top2: orthogonal unit components with ordered eigenvalues") {
    val rows = run("q_pca_top2").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val v1 = rows.filter(_._1 == 1).sortBy(_._2).map(_._3)
    val v2 = rows.filter(_._1 == 2).sortBy(_._2).map(_._3)
    assert(v1.length === 64 && v2.length === 64)
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm(v1) - 1) < 1e-3 && math.abs(norm(v2) - 1) < 1e-3)
    // deflation makes the second iterate orthogonal to the first — up to
    // the convergence of v1 itself: the synthetic corpus' near-isotropic
    // spectrum (λ₂/λ₁ ≈ 0.96) leaves a small residual after 24 fixed
    // iterations (measured ~0.04 at sf0.001; exactness of the VALUES is
    // the oracle's job, this pins the geometry)
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 0.08, s"components not orthogonal: <v1,v2> = $dot")
    val lam1 = rows.find(_._1 == 1).get._4
    val lam2 = rows.find(_._1 == 2).get._4
    assert(lam1 >= lam2 && lam2 > 0, s"spectrum out of order: $lam1 < $lam2")
    val (e1, e2) = (rows.find(_._1 == 1).get._5, rows.find(_._1 == 2).get._5)
    assert(e1 >= e2 && e1 + e2 < 1.0)
    // component 1 agrees with q_pca_power (same chain, same folds)
    val p1 = run("q_pca_power").collect().map(r => (r.getInt(0), r.getDouble(1)))
      .sortBy(_._1).map(_._2)
    assert(v1.toSeq === p1.toSeq, "q_pca_top2 component 1 must equal q_pca_power")
  }

  test("q_seasonal_decompose: components replay and reassemble the series") {
    val rows = run("q_seasonal_decompose").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    for (et <- events.map(_._3).distinct) {
      val daily = events.filter(_._3 == et)
        .groupBy(_._2.toString).map { case (d, es) => (d, es.map(_._4).sum) }
        .toSeq.sortBy(_._1)
      val got = rows.filter(_._1 == et).sortBy(_._2)
      assert(got.length === daily.length - 6, s"trend range for $et")
      // trend is the centered 7-day mean; total + decomposition identity
      got.zipWithIndex.foreach { case ((_, day, tot, trend, seas, resid), i) =>
        val wnd = daily.slice(i, i + 7).map(_._2)
        assert(day === daily(i + 3)._1)
        assert(math.abs(tot - daily(i + 3)._2) < 0.01)
        assert(math.abs(trend - wnd.sum / 7) < 0.01, s"trend at $day")
        // additive identity: total = trend + seasonal + residual (6dp slack)
        assert(math.abs(tot - (trend + seas + resid)) < 1e-4, s"identity at $day")
      }
      // per-type seasonal components average to ~0 weighted by day counts
      val seasByDow = got.groupBy(g =>
        java.time.LocalDate.parse(g._2).getDayOfWeek.getValue - 1)
      val wmean = seasByDow.map { case (_, gs) => gs.head._5 * gs.size }.sum /
        got.length
      assert(math.abs(wmean) < 0.01, s"seasonal mean for $et: $wmean")
    }
  }

  test("labelNoiseScreen flags the planted mislabel and clears the clean points") {
    import spark.implicits._
    // cell 0: tight cluster around e1 labeled "a" — except vec 3, labeled "b"
    // cell 1: tight cluster around e2 labeled "b"
    def v(dir: Int, eps: Float) = Array.tabulate(4)(i =>
      (if (i == dir) 1f else 0f) + (if (i == 3) eps else 0f))
    val rows = Seq(
      (1L, v(0, 0.01f), 0L, "a"), (2L, v(0, 0.02f), 0L, "a"),
      (3L, v(0, 0.03f), 0L, "b"), (4L, v(0, 0.04f), 0L, "a"),
      (5L, v(1, 0.01f), 1L, "b"), (6L, v(1, 0.02f), 1L, "b"),
      (7L, v(1, 0.03f), 1L, "b"), (8L, v(1, 0.04f), 1L, "b"))
    val df = rows.toDF("vec_id", "embedding", "cell", "label")
    val got = graft.ops.Similarity.labelNoiseScreen(
        df, "vec_id", "embedding", "cell", "label", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3))).toMap
    assert(got(3L) === (("a", true)), "planted mislabel must be flagged")
    for (id <- Seq(1L, 2L, 4L)) assert(got(id) === (("a", false)), s"vec $id clean")
    for (id <- Seq(5L, 6L, 7L, 8L)) assert(got(id) === (("b", false)), s"vec $id clean")
  }

  test("q_label_noise: totals reconcile and rates are sane") {
    val rows = run("q_label_noise").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq === (0 to 9))
    val nEmb = graft.ops.Tables.embeddings(spark, dir).count()
    assert(rows.map(_._2).sum === nEmb)
    rows.foreach { case (l, np, ns, sus, rate) =>
      assert(ns <= np && sus <= ns, s"label $l accounting")
      assert(rate >= 0.0 && rate <= 1.0)
      if (ns > 0) assert(math.abs(rate - sus.toDouble / ns) < 1e-6)
    }
  }

  test("q_dedup_cluster_sizes: histogram reconciles with components and totals") {
    val comps = run("q_dedup_components").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val nDocs = graft.ops.Tables.documents(spark, dir).count()
    val hist = run("q_dedup_cluster_sizes").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // q_dedup_components emits ALL docs (singletons as their own comp)
    val sizes = comps.groupBy(_._2).map(_._2.size)
    val want = sizes.groupBy(identity).map { case (s, o) =>
      s.toLong -> (o.size.toLong, (s * o.size).toLong) }
    assert(hist === want)
    assert(hist.values.map(_._2).sum === nDocs, "every doc lands in exactly one bucket")
    assert(hist.keys.max >= 2, "corpus should have at least one multi-doc cluster")
  }

  test("q_emb_pca_project: coordinates are the dot products; pc1 spreads wider") {
    val rows = run("q_emb_pca_project").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    val loadings = run("q_pca_top2").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val l1 = loadings.filter(_._1 == 1).sortBy(_._2).map(_._3)
    val l2 = loadings.filter(_._1 == 2).sortBy(_._2).map(_._3)
    val emb = graft.ops.Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x * 1e6 + 0.5) / 1e6).toArray).toMap
    rows.take(50).foreach { case (id, pc1, pc2) =>
      val e = emb(id)
      val d1 = e.zip(l1).map { case (a, b) => a * b }.sum
      val d2 = e.zip(l2).map { case (a, b) => a * b }.sum
      // loadings from q_pca_top2 are 6dp-rounded; |e|≈1 keeps the slack tiny
      assert(math.abs(pc1 - d1) < 1e-3, s"pc1 for vec $id")
      assert(math.abs(pc2 - d2) < 1e-3, s"pc2 for vec $id")
    }
    def variance(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    assert(variance(rows.map(_._2)) >= variance(rows.map(_._3)) * 0.95,
      "component 1 must capture at least as much variance as component 2")
  }

  test("q_bitmap_distinct: segments reproduce countDistinct exactly") {
    val rows = run("q_bitmap_distinct").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.map(_._1).toSeq.sorted === Seq("A", "N", "R"))
    rows.foreach { case (flag, nSeg, bm, exact, ok) =>
      assert(ok && bm === exact, s"bitmap != exact for $flag")
      // a segment holds at most 63 keys; count can't exceed capacity
      assert(bm <= nSeg * 63, s"capacity violated for $flag")
      assert(bm > 0)
    }
  }
}
