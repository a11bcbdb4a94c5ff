package graft

import org.apache.spark.sql.functions._

/** Properties of the round-9 operator additions: exact substring-span
  * dedup, SemDeDup, equi-depth binning, sweep-line concurrency. The DuckDB
  * oracle hash-gates exact values; these specs pin the invariants a hash
  * can't express — span accounting vs a driver-side brute force, bin
  * ordering/coverage, and the distributed prefix-sum's agreement with a
  * sequential sweep.
  */
class Round9OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_dedup_substring: per-doc accounting and brute-force span agreement") {
    val got = run("q_dedup_substring").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens")))
      .toMap
    val docs = graft.ops.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    assert(got.size == docs.length, "one output row per document")
    // driver-side brute force over the actual token 8-grams (string
    // equality, not hashes — also proves no cross-doc hash collision
    // perturbed the result at this SF)
    val L = 8
    val windows = docs.flatMap { case (id, toks) =>
      toks.sliding(L).filter(_.size == L).zipWithIndex
        .map { case (w, p) => (w.mkString(" "), id, p) }
    }
    val dupGrams = windows.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    val flagged = windows.filter(w => dupGrams(w._1))
      .groupBy(_._2).map { case (id, ws) => id -> ws.map(_._3).sorted.toSeq }
    docs.foreach { case (id, toks) =>
      val (nTok, nSpans, dupTok) = got(id)
      assert(nTok == toks.size, s"doc $id token count")
      val ps = flagged.getOrElse(id, Seq.empty[Int])
      // merge flagged window starts into maximal spans
      var spans = 0L; var covered = 0L
      var start = -1; var end = -1
      (ps :+ Int.MaxValue).foreach { p =>
        if (start < 0) { start = p; end = p }
        else if (p <= end + L) end = p
        else {
          spans += 1; covered += end - start + L
          start = p; end = p
        }
      }
      if (ps.isEmpty) { spans = 0; covered = 0 }
      assert(nSpans == spans, s"doc $id spans $nSpans != brute $spans")
      assert(dupTok == covered, s"doc $id dup tokens $dupTok != brute $covered")
      assert(dupTok <= nTok, s"doc $id duplicated more tokens than it has")
      assert(nSpans == 0 || dupTok >= nSpans * L, s"doc $id span shorter than a window")
    }
  }

  test("q_semdedup: partition of the sampled vectors, at least one survivor per cell") {
    val got = run("q_semdedup")
    val sampled = graft.ops.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 2 === 0).count()
    assert(got.agg(sum(col("n_vecs"))).collect().head.getLong(0) == sampled)
    assert(got.filter(col("n_dropped") + col("n_kept") =!= col("n_vecs")).count() == 0)
    // the lowest id in a cell can never have a LOWER-id near-dup
    assert(got.filter(col("n_kept") < 1).count() == 0)
  }

  test("q_equidepth_bins: covers the table, ordered non-overlapping bins, near-equal depth") {
    val got = run("q_equidepth_bins").collect().sortBy(_.getAs[Int]("bin"))
    val n = graft.ops.Tables.lineitem(spark, dir).count()
    assert(got.map(_.getAs[Long]("n_rows")).sum == n, "bins partition the table")
    got.foreach { r =>
      assert(r.getAs[Double]("min_v") <= r.getAs[Double]("max_v"))
      if (!r.isNullAt(r.fieldIndex("hi_bound")))
        assert(r.getAs[Double]("max_v") <= r.getAs[Double]("hi_bound"),
          s"bin ${r.getAs[Int]("bin")} exceeds its boundary")
    }
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("max_v") <= b.getAs[Double]("min_v"),
          s"bins ${a.getAs[Int]("bin")}/${b.getAs[Int]("bin")} overlap")
        assert(b.getAs[Double]("min_v") > a.getAs[Double]("hi_bound"),
          "next bin starts at or below the previous boundary")
      case _ =>
    }
    // near-continuous prices => depths stay close to n/8
    val depths = got.map(_.getAs[Long]("n_rows"))
    assert(depths.forall(d => d >= n / 16 && d <= n / 4),
      s"bin depth far from n/8: ${depths.mkString(",")}")
  }

  test("q_scd2_pit: one row per session, state = type of the latest event at or before the probe") {
    val got = run("q_scd2_pit").collect()
    val nSess = run("q_sessionize").count()
    assert(got.length == nSess, s"${got.length} probe rows != $nSess sessions")
    val byUser = graft.ops.Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
      .groupBy(_._1).map { case (u, es) =>
        u -> es.sortBy(e => (e._2, e._3)).toSeq
      }
    got.foreach { r =>
      val u = r.getAs[Long]("user_id"); val t = r.getAs[Long]("start_us")
      val active = byUser(u).takeWhile(_._2 <= t).lastOption
      assert(active.isDefined, s"probe before user $u's first event")
      assert(r.getAs[String]("state") == active.get._4,
        s"user $u at $t: state ${r.getAs[String]("state")} != event ${active.get._4}")
    }
  }

  test("q_scd2_pit plan: the join carries the bin key and never nested-loops") {
    val plan = run("q_scd2_pit").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "range probe fell back to BNLJ")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("__graft_bin"), "join does not use the bin key")
  }

  test("q_weighted_median: agrees with a driver-side weighted rank walk") {
    val got = run("q_weighted_median").collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("w_total"), r.getAs[Double]("w_median"))).toMap
    val rows = graft.ops.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(12,4)") * 10000).cast("long").as("u"),
        col("l_quantity").cast("long").as("wt")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val wTot = rs.map(_._3).sum
      val target = (wTot + 1) / 2
      var cum = 0L
      val med = rs.map(t => (t._2, t._3)).groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
        .find { case (_, w) => cum += w; cum >= target }.get._1
      val (gotW, gotMed) = got(g)
      assert(gotW == wTot, s"group $g weight total")
      assert(gotMed == java.math.BigDecimal.valueOf(med, 4).doubleValue,
        s"group $g median $gotMed != brute $med")
    }
  }

  test("q_split_leakage: totals match the pair set; leak flag consistent") {
    val m = run("q_split_leakage").collect()
    val pairs = run("q_dedup_minhash_pairs").count()
    assert(m.map(_.getAs[Long]("n_pairs")).sum == pairs,
      "leakage matrix must partition the near-dup pair set")
    m.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "labels must be ordered")
      assert(r.getAs[Boolean]("leaks") == (r.getString(0) != r.getString(1)))
    }
  }

  test("q_component_split: zero cross-split pairs, clusters stay together") {
    val rows = run("q_component_split").collect()
    assert(rows.forall(_.getAs[Long]("leak_pairs") == 0L),
      "component-keyed splitting must eliminate leakage by construction")
    val byComp = rows.groupBy(_.getAs[Long]("comp"))
    byComp.foreach { case (c, ms) =>
      assert(ms.map(_.getAs[String]("split")).distinct.length == 1,
        s"component $c spans multiple splits")
    }
  }

  test("q_text_entropy: one row per doc, bounded by log2 of the alphabet size") {
    val got = run("q_text_entropy").collect()
    val nDocs = graft.ops.Tables.documents(spark, dir).count()
    assert(got.length == nDocs)
    got.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val k = r.getAs[Long]("n_distinct_chars")
      assert(h >= 0.0, s"doc ${r.get(0)}: negative entropy $h")
      // + slack for the 9dp per-term floor rounding
      assert(h <= math.log(k.toDouble) / math.log(2.0) + 1e-6,
        s"doc ${r.get(0)}: entropy $h exceeds log2($k)")
    }
  }

  test("q_bpe_merge_step: matches a driver-side reimplementation of iteration 2") {
    val got = run("q_bpe_merge_step").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"), r.getAs[Int]("rn")))
    val words = graft.ops.Tables.documents(spark, dir)
      .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("count"))
    def pairs(ws: Seq[(Seq[String], Long)]): Map[(String, String), Long] =
      ws.flatMap { case (cs, c) => cs.sliding(2).filter(_.size == 2)
          .map(p => (p.head, p(1)) -> c) }
        .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val chars = words.map { case (w, c) => (w.split("").toSeq, c) }.toSeq
    val p0 = pairs(chars)
    val (ma, mb) = p0.filter { case ((a, b), _) => a != b }.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.head._1
    val mergedWords = chars.map { case (cs, c) =>
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < cs.length) {
        if (i + 1 < cs.length && cs(i) == ma && cs(i + 1) == mb) {
          out += (ma + mb); i += 2
        } else { out += cs(i); i += 1 }
      }
      (out.toSeq, c)
    }
    val expected = pairs(mergedWords).toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(10).zipWithIndex
      .map { case (((a, b), n), i) => (a, b, n, i + 1) }
    assert(got.toSeq == expected, s"got ${got.toSeq}\nexpected $expected")
    assert(!got.exists(r => r._1 == ma && r._2 == mb), "merged pair must vanish")
  }

  test("q_rfm_segments: partitions customers, digit marginals near-quartile") {
    val got = run("q_rfm_segments").collect()
    val nCust = graft.ops.Tables.orders(spark, dir)
      .select(col("o_custkey")).distinct().count()
    assert(got.map(_.getAs[Long]("n_customers")).sum == nCust)
    got.foreach { r =>
      val s = r.getAs[Int]("segment")
      assert(s >= 0 && s <= 333 && s / 100 <= 3 && s / 10 % 10 <= 3 && s % 10 <= 3,
        s"segment $s out of the quartile-code domain")
    }
    // each digit's marginal must stay within a loose band of n/4 (ties
    // can skew the exact quarter; F is small-domain so its ties are wide)
    for ((digitOf, name) <- Seq[((Int) => Int, String)](
        (s => s / 100, "R"), (s => s / 10 % 10, "F"), (s => s % 10, "M"))) {
      val marg = got.groupBy(r => digitOf(r.getAs[Int]("segment")))
        .map { case (d, rs) => d -> rs.map(_.getAs[Long]("n_customers")).sum }
      assert(marg.values.max <= nCust,
        s"$name marginal exceeds the population")
      assert(marg.nonEmpty && marg.keys.max <= 3 && marg.keys.min >= 0)
    }
  }

  test("q_ddsketch_quantiles: the relative-error guarantee holds at every q") {
    val got = run("q_ddsketch_quantiles").collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(r.getAs[Boolean]("within_alpha"),
        s"q=${r.getString(0)}: rel_err ${r.getAs[Double]("rel_err")} breaks the α=5% bound")
      assert(r.getAs[Double]("est") > 0 && r.getAs[Double]("exact") > 0)
      assert(r.getAs[Double]("rel_err") <= 0.05 + 1e-6)
    }
  }

  test("q_grouped_equidepth: per-group partition, ordered bins within each group") {
    val got = run("q_grouped_equidepth").collect()
    val x = graft.ops.Tables.lineitem(spark, dir)
    assert(got.map(_.getAs[Long]("n_rows")).sum == x.count())
    got.groupBy(_.getAs[String]("l_returnflag")).foreach { case (g, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("bin"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("max_v") <= b.getAs[Double]("min_v"),
            s"group $g bins overlap")
        case _ =>
      }
      // quartiles on near-continuous prices: depths near n_g/4
      val tot = sorted.map(_.getAs[Long]("n_rows")).sum
      sorted.foreach(r => assert(r.getAs[Long]("n_rows") >= tot / 8
        && r.getAs[Long]("n_rows") <= tot / 2, s"group $g depth skew"))
    }
  }

  test("q_time_decay: decayed sum bounded by the plain sum of positive parts") {
    val got = run("q_time_decay").collect()
    val plain = graft.ops.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > 0, col("value")).otherwise(0.0)).as("pos"))
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Double]("pos")))
      .toMap
    assert(got.length == plain.size)
    got.foreach { r =>
      val (n, pos) = plain(r.getString(0))
      assert(r.getAs[Long]("n") == n)
      // each |term| <= |value| (decay weight in (0, 1]); allow 9dp slack
      assert(r.getAs[Double]("decayed_sum") <= pos + 1e-3,
        s"${r.getString(0)}: decayed exceeds undecayed positive mass")
    }
  }

  test("q_zipf_fit: negative slope, r2 in [0,1], top-min(100, vocab) ranks") {
    val r = run("q_zipf_fit").collect().head
    val vocab = graft.ops.Tables.documents(spark, dir)
      .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("t"))
      .distinct().count()
    assert(r.getAs[Long]("n") == math.min(100L, vocab))
    assert(r.getAs[Double]("zipf_slope") < 0,
      "token frequency must decrease with rank")
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"r2 $r2 out of range")
  }

  test("q_emb_drift: covers every joined vector, cosines bounded") {
    val got = run("q_emb_drift").collect()
    val joined = graft.ops.Tables.embeddings(spark, dir)
      .join(graft.ops.Tables.documents(spark, dir)
        .select(col("doc_id").as("vec_id")), Seq("vec_id")).count()
    assert(got.map(_.getAs[Long]("n_vecs")).sum == joined)
    got.foreach { r =>
      val c = r.getAs[Double]("cos_to_corpus")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cosine $c out of range")
    }
  }

  test("q_funnel_windowed: windowed counts never exceed the unconstrained funnel") {
    val w = run("q_funnel_windowed").collect().head
    val u = run("q_funnel_steps").collect().head
    assert(w.getAs[Long]("n_signup") == u.getAs[Long]("n_signup"))
    assert(w.getAs[Long]("n_view_24h") <= u.getAs[Long]("n_view_after"))
    assert(w.getAs[Long]("n_view_24h") <= w.getAs[Long]("n_signup"))
    assert(w.getAs[Long]("n_purchase_24h") <= w.getAs[Long]("n_view_24h"))
  }

  test("q_attribution: conserves purchase count and revenue across channels") {
    val got = run("q_attribution").collect()
    val purchases = graft.ops.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
    assert(got.map(_.getAs[Long]("n_purchases")).sum == purchases.count(),
      "every purchase must land in exactly one channel")
    val total = purchases
      .agg(sum(col("value").cast("decimal(18,4)")).cast("double")).collect().head.getDouble(0)
    val attributed = got.map(_.getAs[Double]("attributed_value")).sum
    assert(math.abs(attributed - total) < 1e-6,
      s"revenue not conserved: $attributed vs $total")
    val channels = got.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("view", "click", "direct")))
  }

  test("q_concurrency_peak: matches a sequential driver-side sweep") {
    val row = run("q_concurrency_peak").collect().head
    val sessions = run("q_sessionize")
      .select(col("start_us"), col("end_us")).collect()
      .map(r => (r.getAs[Long]("start_us"), r.getAs[Long]("end_us")))
    assert(row.getAs[Long]("n_sessions") == sessions.length)
    val events = sessions.flatMap { case (s, e) => Seq((s, 1), (e, -1)) }
      .sortBy { case (t, d) => (t, -d) }
    var run0 = 0L; var peak = 0L; var firstTs = Long.MaxValue
    events.foreach { case (t, d) =>
      run0 += d
      if (run0 > peak) { peak = run0; firstTs = t }
    }
    assert(row.getAs[Long]("peak") == peak, s"peak ${row.getAs[Long]("peak")} != $peak")
    assert(row.getAs[Long]("first_peak_us") == firstTs)
    assert(peak >= 1 && peak <= sessions.length)
  }
}
