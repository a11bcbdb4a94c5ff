package graft

/** Properties of the nonparametric rank-statistics family
  * (RankStatsQueries): each statistic is replayed sequentially on the
  * driver from raw rows using the TEXTBOOK row-level definition (explicit
  * per-row average ranks, full ECDFs, all pairwise slopes) and compared
  * within float tolerance — proving the bounded-domain grid formulations
  * compute the same statistics as the naive global-sort formulations they
  * replace. The DuckDB oracle hash-gates the exact floored values.
  */
class RankStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  /** textbook tie-averaged ranks (1-based) of a sequence */
  private def avgRanks(xs: Array[Long]): Array[Double] = {
    val sortedIdx = xs.zipWithIndex.sortBy(_._1)
    val ranks = new Array[Double](xs.length)
    var i = 0
    while (i < sortedIdx.length) {
      var j = i
      while (j + 1 < sortedIdx.length && sortedIdx(j + 1)._1 == sortedIdx(i)._1) j += 1
      val avg = (i + j + 2) / 2.0 // mean of 1-based positions i+1..j+1
      for (k <- i to j) ranks(sortedIdx(k)._2) = avg
      i = j + 1
    }
    ranks
  }

  test("q_ks_test matches the row-level two-sample ECDF replay") {
    val row = run("q_ks_test").collect().head
    val os = graft.ops.Tables.orders(spark, dir)
      .selectExpr("o_totalprice", "o_orderpriority").collect()
      .map(r => (math.floor(r.getDouble(0) / 1000.0).toLong,
        Set("1-URGENT", "2-HIGH")(r.getString(1))))
    val a = os.filter(_._2).map(_._1).sorted
    val b = os.filterNot(_._2).map(_._1).sorted
    assert(row.getAs[Long]("n_a") === a.length.toLong)
    assert(row.getAs[Long]("n_b") === b.length.toLong)
    val grid = (a ++ b).distinct.sorted
    // integer replay of the cross-multiplied form: d_num = max|cuma*nb - cumb*na|
    val na = BigInt(a.length); val nb = BigInt(b.length)
    val dNum = grid.map { v =>
      (BigInt(a.count(_ <= v)) * nb - BigInt(b.count(_ <= v)) * na).abs
    }.max
    assert(row.getAs[Long]("ks_d_e6") === (dNum * 1000000 / (na * nb)).toLong)
    assert(row.getAs[Long]("ks_crit2_e12") ===
      (BigInt(1843764) * (na + nb) * 1000000 / (na * nb)).toLong)
    // reject decided by the squared integer comparison (1.358^2 = 1.843764)
    assert(row.getAs[Boolean]("reject") ===
      (dNum * dNum * 1000000 > BigInt(1843764) * (na + nb) * na * nb))
    // and the integer form agrees with the textbook double replay
    val d = dNum.toDouble / (a.length.toDouble * b.length)
    val crit = 1.358 * math.sqrt((a.length + b.length).toDouble / (a.length.toLong * b.length))
    assert(math.abs(row.getAs[Long]("ks_d_e6") / 1e6 - d) < 2e-6)
    assert(row.getAs[Boolean]("reject") === (d > crit))
  }

  test("q_mann_whitney matches the row-level rank-sum replay") {
    val row = run("q_mann_whitney").collect().head
    val li = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("l_quantity", "l_linestatus").collect()
      .map(r => (math.floor(r.getDouble(0) + 0.5).toLong, r.getString(1) == "O"))
    val pooled = li.map(_._1)
    val ranks = avgRanks(pooled)
    val na = li.count(_._2).toLong
    val nb = li.length - na
    val rA = li.zip(ranks).filter(_._1._2).map(_._2).sum
    val u = rA - na * (na + 1) / 2.0
    // u2 is emitted as an exact integer STRING since round 13
    assert(row.getAs[String]("u2").toDouble === 2.0 * u)
    val n = (na + nb).toDouble
    val ties = pooled.groupBy(identity).values
      .map(g => g.length.toDouble)
      .map(t => t * t * t - t).sum
    val varU = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    val z = (u - na * nb / 2.0) / math.sqrt(varU)
    // the query emits sign(z) * floor(z^2 * 1e4) — pure integer arithmetic;
    // the textbook double replay must agree to the discretization step
    val z2e4 = row.getAs[Long]("z2_e4")
    assert(math.signum(z2e4.toDouble) === math.signum(z) || z2e4 == 0L)
    assert(math.abs(math.abs(z2e4) / 1e4 - z * z) < 2e-4 + z * z * 1e-9)
    assert(row.getAs[Boolean]("sig") === (math.abs(z) > 1.96))
  }

  test("q_kruskal_wallis matches the pooled-rank textbook replay") {
    val row = run("q_kruskal_wallis").collect().head
    val li = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) + 0.5).toLong))
    val ranks = avgRanks(li.map(_._2))
    val n = li.length.toDouble
    val groups = li.zip(ranks).groupBy(_._1._1)
    assert(row.getAs[Long]("k") === groups.size.toLong)
    assert(row.getAs[Long]("n") === li.length.toLong)
    val rBar = (n + 1) / 2.0
    val hRaw = 12.0 / (n * (n + 1)) * groups.values.map { g =>
      val m = g.map(_._2).sum / g.length
      g.length * (m - rBar) * (m - rBar)
    }.sum
    val ties = li.map(_._2).groupBy(identity).values
      .map(_.length.toDouble).map(t => t * t * t - t).sum
    val hAdj = hRaw / (1.0 - ties / (n * n * n - n))
    assert(math.abs(row.getAs[Double]("h") - hRaw) < 2e-5 + hRaw * 1e-9)
    assert(math.abs(row.getAs[Double]("h_adj") - hAdj) < 2e-5 + hAdj * 1e-9)
    assert(row.getAs[Boolean]("reject") === (hAdj > 5.991465))
  }

  test("q_kendall_tau_rows matches the cell-grid concordance replay") {
    val row = run("q_kendall_tau_rows").collect().head
    val li = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("l_quantity", "l_discount").collect()
      .map(r => (math.floor(r.getDouble(0) + 0.5).toLong,
        math.floor(r.getDouble(1) * 100.0 + 0.5).toLong))
    val cells = li.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val cellSeq = cells.toSeq
    var nc = BigInt(0); var nd = BigInt(0)
    for (i <- cellSeq.indices; j <- (i + 1) until cellSeq.length) {
      val ((q1, d1), c1) = cellSeq(i); val ((q2, d2), c2) = cellSeq(j)
      if ((q1 < q2 && d1 < d2) || (q2 < q1 && d2 < d1)) nc += BigInt(c1) * c2
      else if ((q1 < q2 && d1 > d2) || (q2 < q1 && d2 > d1)) nd += BigInt(c1) * c2
    }
    val nn = BigInt(li.length)
    val ttx = li.map(_._1).groupBy(identity).values
      .map(g => BigInt(g.length) * (g.length - 1)).sum
    val tty = li.map(_._2).groupBy(identity).values
      .map(g => BigInt(g.length) * (g.length - 1)).sum
    assert(row.getAs[Long]("n") === li.length.toLong)
    assert(BigInt(row.getAs[Long]("nc")) === nc)
    assert(BigInt(row.getAs[Long]("nd")) === nd)
    val a2 = nn * (nn - 1) - ttx
    val b2 = nn * (nn - 1) - tty
    val diff = nc - nd
    val want = (if (diff < 0) -1 else 1) * (diff * diff * 4000000 / (a2 * b2))
    assert(BigInt(row.getAs[Long]("tau2_e6")) === want)
    // and the squared integer form agrees with the textbook tau-b double:
    // tau_b = 2*diff / sqrt(a2*b2) since a2*b2 = 4(n0-n1)(n0-n2) while
    // diff counts each unordered pair once
    val tau = 2.0 * diff.toDouble / math.sqrt(a2.toDouble * b2.toDouble)
    assert(math.abs(math.abs(row.getAs[Long]("tau2_e6")) / 1e6 - tau * tau) < 2e-6)
  }

  test("q_jonckheere matches the row-level textbook replay") {
    val row = run("q_jonckheere").collect().head
    val li = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("CAST(month(CAST(l_shipdate AS DATE)) AS INT) AS g",
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q",
        "CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS y")
      .collect().filter(_.getInt(2) == 1996)
      .map(r => (r.getInt(0), r.getLong(1)))
    val n = li.length
    // brute-force 2J over row pairs: ordered groups, 2·[x<y] + [x=y]
    var jt2 = BigInt(0)
    for (i <- li.indices; j <- li.indices; if li(i)._1 < li(j)._1) {
      if (li(i)._2 < li(j)._2) jt2 += 2
      else if (li(i)._2 == li(j)._2) jt2 += 1
    }
    assert(row.getAs[Long]("n") === n.toLong)
    assert(BigInt(row.getAs[Long]("jt2")) === jt2)
    val gs = li.groupBy(_._1).values.map(_.length.toLong)
    val e4 = n.toLong * n - gs.map(x => x * x).sum
    assert(row.getAs[Long]("e4") === e4)
    // textbook tie-corrected variance + z, via the same double formula
    val ts = li.groupBy(_._2).values.map(_.length.toLong)
    val nn = n.toLong
    val s1 = nn * (nn - 1) * (2 * nn + 5) -
      gs.map(x => x * (x - 1) * (2 * x + 5)).sum -
      ts.map(x => x * (x - 1) * (2 * x + 5)).sum
    val v = s1 / 72.0 +
      (gs.map(x => x * (x - 1) * (x - 2)).sum.toDouble *
        ts.map(x => x * (x - 1) * (x - 2)).sum.toDouble) /
        (36.0 * (nn * (nn - 1) * (nn - 2)).toDouble) +
      (gs.map(x => x * (x - 1)).sum.toDouble *
        ts.map(x => x * (x - 1)).sum.toDouble) /
        (8.0 * (nn * (nn - 1)).toDouble)
    val z = (2 * jt2.toLong - e4).toDouble / (4.0 * math.sqrt(v))
    assert(math.abs(row.getAs[Double]("z") - z) < 2e-6)
    assert(row.getAs[Boolean]("reject") === (math.abs(z) > 1.959964))
  }

  test("q_cochran_q matches the textbook blocked-binary replay") {
    val row = run("q_cochran_q").collect().head
    val flags = graft.ops.Tables.lineitem(spark, dir)
      .join(graft.ops.Tables.orders(spark, dir),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .selectExpr("o_orderkey",
        "CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS p",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r",
        "CASE WHEN CAST(l_shipdate AS DATE)"
          + " > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY"
          + " THEN 1 ELSE 0 END AS lt")
      .collect()
      .groupBy(_.getLong(0)).values
      .map(g => (g.map(_.getInt(1)).max.toLong,
        g.map(_.getInt(2)).max.toLong, g.map(_.getInt(3)).max.toLong))
      .toSeq
    val (c1, c2, c3) = (flags.map(_._1).sum, flags.map(_._2).sum,
      flags.map(_._3).sum)
    assert(row.getAs[Long]("n") === flags.size.toLong)
    assert((row.getAs[Long]("c1"), row.getAs[Long]("c2"),
      row.getAs[Long]("c3")) === ((c1, c2, c3)))
    val sr = flags.map(f => f._1 + f._2 + f._3)
    val num = BigInt(2) * (3 * (c1 * c1 + c2 * c2 + c3 * c3)
      - (c1 + c2 + c3) * (c1 + c2 + c3))
    val den = BigInt(3 * sr.sum - sr.map(x => x * x).sum)
    assert(BigInt(row.getAs[Long]("q_e6")) === num * 1000000 / den)
    assert(row.getAs[Boolean]("reject") === (num * 1000000 > den * 5991465))
    // and the integral form agrees with the textbook Q double
    val q = num.toDouble / den.toDouble
    assert(math.abs(row.getAs[Long]("q_e6") / 1e6 - q) < 2e-6)
  }

  test("q_page_trend matches the driver-side rank replay") {
    val row = run("q_page_trend").collect().head
    // the (year, month) revenue grid via the engine's proven exact-e6
    // rollup (the oracle independently checks that aggregation); the
    // RANK/L/z arithmetic is replayed here from scratch
    val grid = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS y",
        "CAST(month(CAST(l_shipdate AS DATE)) AS INT) AS m",
        "CAST(l_extendedprice AS DECIMAL(12,4))"
          + " * (1 - CAST(l_discount AS DECIMAL(12,4))) AS v")
      .groupBy("y", "m")
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(SUM(v) * 1000000 AS BIGINT) AS rev_e6"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val complete = grid.groupBy(_._1).filter(_._2.map(_._2).distinct.length == 12)
    val b = complete.size
    assert(row.getAs[Long]("b") === b.toLong)
    assert(row.getAs[Long]("k") === 12L)
    var l = 0L
    complete.values.foreach { cells =>
      cells.sortBy(c => (c._3, c._2)).zipWithIndex.foreach {
        case ((_, m, _), i) => l += m.toLong * (i + 1)
      }
    }
    assert(row.getAs[Long]("l") === l)
    val k = 12L
    val d = BigInt(4 * l - b * k * (k + 1) * (k + 1))
    val den = BigInt(b.toLong * k * k * (k + 1) * (k + 1) * (k - 1))
    val want = (if (d < 0) -1 else 1) * (d * d * 9 * 1000000 / den)
    assert(BigInt(row.getAs[Long]("z2_e6")) === want)
    assert(row.getAs[Boolean]("reject") ===
      (d * d * 9 * 1000000 > BigInt(3841459) * den))
  }

  test("q_kendall_w matches the textbook concordance replay") {
    val row = run("q_kendall_w").collect().head
    // same grid derivation as the q_page_trend replay
    val grid = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS y",
        "CAST(month(CAST(l_shipdate AS DATE)) AS INT) AS m",
        "CAST(l_extendedprice AS DECIMAL(12,4))"
          + " * (1 - CAST(l_discount AS DECIMAL(12,4))) AS v")
      .groupBy("y", "m")
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(SUM(v) * 1000000 AS BIGINT) AS rev_e6"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val complete = grid.groupBy(_._1).filter(_._2.map(_._2).distinct.length == 12)
    val b = complete.size.toLong
    val k = 12L
    assert(row.getAs[Long]("b") === b)
    assert(row.getAs[Long]("k") === k)
    val rj = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    complete.values.foreach { cells =>
      cells.sortBy(c => (c._3, c._2)).zipWithIndex.foreach {
        case ((_, m, _), i) => rj(m) += (i + 1).toLong
      }
    }
    val sd2 = BigInt((1 to 12).map { m =>
      val d = 2 * rj(m) - b * (k + 1); d * d
    }.sum)
    val num = 3 * sd2 * 1000000
    assert(BigInt(row.getAs[Long]("w_e6")) === num / (b * b * k * (k * k - 1)))
    assert(BigInt(row.getAs[Long]("chi2_e6")) === num / (b * k * (k + 1)))
    assert(row.getAs[Boolean]("reject") ===
      (num > BigInt(19675138) * (b * k * (k + 1))))
    // textbook double cross-check: W = 12·S/(b²k(k²−1)), S = Σ(Rj − b(k+1)/2)²
    val sDbl = (1 to 12).map { m =>
      val dev = rj(m).toDouble - b * (k + 1) / 2.0; dev * dev
    }.sum
    val w = 12.0 * sDbl / (b * b * k * (k * k - 1)).toDouble
    assert(math.abs(row.getAs[Long]("w_e6") / 1e6 - w) < 2e-6)
  }

  test("q_hodges_lehmann matches the brute-force Walsh-average median") {
    val got = run("q_hodges_lehmann").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val li = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) + 0.5).toLong))
    for ((rf, rows) <- li.groupBy(_._1)) {
      val xs = rows.map(_._2)
      // brute force: every Walsh sum x_i + x_j over i <= j
      val sums = (for (i <- xs.indices; j <- i until xs.length)
        yield xs(i) + xs(j)).sorted
      val w = sums.length.toLong
      val lo = sums(((w + 1) / 2 - 1).toInt)
      val hi = sums(((w + 2) / 2 - 1).toInt)
      assert(got(rf)._1 === w, s"$rf pair count")
      assert(got(rf)._2 === lo + hi, s"$rf hl_x4")
    }
  }

  test("q_friedman_test matches the textbook blocked-rank replay") {
    val row = run("q_friedman_test").collect().head
    val cells = graft.ops.Tables.orders(spark, dir)
      .selectExpr("date_format(o_orderdate, 'yyyy-MM') AS m",
        "o_orderpriority AS trt",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
    val k = cells.keys.map(_._2).toSet.size
    val blocks = cells.groupBy(_._1._1).filter(_._2.size == k)
    assert(row.getAs[Long]("k") === k.toLong)
    assert(row.getAs[Long]("b") === blocks.size.toLong)
    val rankSums = scala.collection.mutable.Map.empty[String, Double]
    for ((_, cellsInB) <- blocks) {
      val vs = cellsInB.toSeq.map { case ((_, t), v) => (t, v) }
      for ((t, v) <- vs) {
        val smaller = vs.count(_._2 < v)
        val equal = vs.count(_._2 == v)
        val r = smaller + (equal + 1) / 2.0
        rankSums(t) = rankSums.getOrElse(t, 0.0) + r
      }
    }
    val b = blocks.size.toDouble
    val q = 12.0 / (b * k * (k + 1)) *
      rankSums.values.map(r => (r - b * (k + 1) / 2.0) * (r - b * (k + 1) / 2.0)).sum
    assert(math.abs(row.getAs[Long]("q_e6") / 1e6 - q) < 2e-6 + q * 1e-9)
    assert(row.getAs[Boolean]("reject") === (q > 9.487729))
  }

  test("q_mood_median matches the textbook 2xk chi-square replay") {
    val row = run("q_mood_median").collect().head
    val li = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) + 0.5).toLong))
    val sorted = li.map(_._2).sorted
    val gm = sorted(((sorted.length + 1) / 2 - 1))
    val groups = li.groupBy(_._1)
    val n = li.length.toDouble
    val ca = li.count(_._2 > gm).toDouble
    val chi2 = groups.values.map { g =>
      val r = g.length.toDouble
      val above = g.count(_._2 > gm).toDouble
      val below = r - above
      val ea = r * ca / n; val eb = r * (n - ca) / n
      (above - ea) * (above - ea) / ea + (below - eb) * (below - eb) / eb
    }.sum
    assert(row.getAs[Long]("k") === groups.size.toLong)
    assert(row.getAs[Long]("n") === li.length.toLong)
    assert(row.getAs[Long]("n_above") === ca.toLong)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 2e-5 + chi2 * 1e-9)
    assert(row.getAs[Boolean]("reject") === (chi2 > 5.991465))
  }

  test("q_qq_table matches brute-force type-1 decile order statistics") {
    val got = run("q_qq_table").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val li = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("l_linestatus", "l_quantity").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) + 0.5).toLong))
    def dec(g: String, p: Long): Long = {
      val xs = li.filter(_._1 == g).map(_._2).sorted
      xs((((p * xs.length + 99) / 100) - 1).toInt) // type-1: ceil(pn/100)-th
    }
    for (p <- 10L to 90L by 10L) {
      assert(got(p)._1 === dec("O", p), s"p=$p open")
      assert(got(p)._2 === dec("F", p), s"p=$p finished")
    }
  }

  test("q_cramers_v matches the textbook contingency replay") {
    val row = run("q_cramers_v").collect().head
    val li = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag", "l_linestatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = li.length.toDouble
    val cellsM = li.groupBy(identity).map { case (k, v) => (k, v.length.toDouble) }
    val rm = li.groupBy(_._1).map { case (k, v) => (k, v.length.toDouble) }
    val cm = li.groupBy(_._2).map { case (k, v) => (k, v.length.toDouble) }
    val chi2 = cellsM.map { case ((rf, ls), o) =>
      val e = rm(rf) * cm(ls) / n
      (o - e) * (o - e) / e
    }.sum
    assert(row.getAs[Long]("kr") === rm.size.toLong)
    assert(row.getAs[Long]("kc") === cm.size.toLong)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 2e-5 + chi2 * 1e-9)
    val v2 = chi2 / (n * (math.min(rm.size, cm.size) - 1))
    assert(math.abs(row.getAs[Long]("v2_e6") / 1e6 - v2) < 2e-6)
  }

  test("q_spearman_corr matches Pearson-on-average-ranks per group") {
    val got = run("q_spearman_corr").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val li = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag", "l_quantity", "l_discount").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) + 0.5).toLong,
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
    assert(got.keySet === li.map(_._1).toSet)
    for ((rf, rows) <- li.groupBy(_._1)) {
      val rx = avgRanks(rows.map(_._2))
      val ry = avgRanks(rows.map(_._3))
      val n = rows.length.toDouble
      val (mx, my) = (rx.sum / n, ry.sum / n)
      val num = rx.zip(ry).map { case (x, y) => (x - mx) * (y - my) }.sum
      val den = math.sqrt(rx.map(x => (x - mx) * (x - mx)).sum *
        ry.map(y => (y - my) * (y - my)).sum)
      assert(got(rf)._1 === rows.length.toLong)
      assert(math.abs(got(rf)._2 - num / den) < 1e-5, s"rho mismatch for $rf")
    }
  }

  test("q_theil_sen matches the all-pairs median-slope replay") {
    val row = run("q_theil_sen").collect().head
    val daily = graft.ops.Tables.events(spark, dir)
      .where("event_type = 'purchase'")
      .selectExpr("CAST(ts AS DATE) AS day",
        "CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vq")
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).map { case (d, es) => (d, es.map(_._2).sum) }
      .toSeq.sortBy(_._1.toEpochDay)
    val d0 = daily.head._1.toEpochDay
    val pts = daily.map { case (d, v) => (d.toEpochDay - d0, v / 1e6) }
    val slopes = (for {
      i <- pts.indices; j <- (i + 1) until pts.length
    } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1)).sorted
    def median(xs: Seq[Double]) =
      if (xs.length % 2 == 1) xs(xs.length / 2)
      else (xs(xs.length / 2 - 1) + xs(xs.length / 2)) / 2.0
    val slope = median(slopes)
    assert(row.getAs[Long]("n_days") === daily.length.toLong)
    assert(row.getAs[Long]("n_pairs") === slopes.length.toLong)
    assert(math.abs(row.getAs[Double]("slope") - slope) < 1e-6)
    val resid = pts.map { case (d, v) => v - slope * d }.sorted
    assert(math.abs(row.getAs[Double]("intercept") - median(resid)) < 1e-6)
  }
}
