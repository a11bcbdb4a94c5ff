package graft

import org.apache.spark.sql.functions._

/** Properties of the round-10 operator additions: sorted-neighborhood
  * dedup, temperature-flattened mixing, CDC changelog apply, DSIR
  * importance weights, in-cell hard-negative mining. The DuckDB oracle
  * hash-gates exact values at sf0.01; these specs pin the invariants a
  * hash can't express — distributed-rank agreement with a single-node
  * sort, quota arithmetic against brute force, tombstone semantics, and
  * the direction of the DSIR signal.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("sortedNeighborhoodPairs equals the single-node sorted window") {
    // crafted corpus: clusters of near-identical strings whose sort keys
    // collide, plus singletons; spread over many partitions so the
    // distributed global rank (range partition + offsets) is exercised
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).flatMap { i =>
      val base = s"cluster$i common words shared by all members here"
      val members = 1 + rnd.nextInt(4)
      (0 until members).map { m =>
        (i * 10L + m, if (m == 0) base else s"$base variant$m")
      }
    }
    val df = rows.toDF("id", "text").repartition(7)
    val got = graft.ops.Dedup.sortedNeighborhoodPairs(
        df, "id",
        substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 24),
        graft.ops.TextAnalysis.tokenSet(col("text")),
        window = 4, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // driver-side replay: one global sort, compare each row to its 4
    // successors, token-set jaccard
    def toks(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    def sk(s: String) = s.toLowerCase.replaceAll("[^a-z0-9]", "").take(24)
    val sorted = rows.sortBy { case (id, t) => (sk(t), id) }
    val want = (for {
      i <- sorted.indices
      j <- (i + 1) to math.min(i + 4, sorted.size - 1)
      a = toks(sorted(i)._2); b = toks(sorted(j)._2)
      inter = (a & b).size.toDouble
      jac = inter / (a.size + b.size - inter)
      if jac >= 0.5
    } yield (sorted(i)._1, sorted(j)._1)).toSet
    assert(got === want)
    assert(got.nonEmpty, "fixture should produce pairs")
  }

  test("rebalanceTemperature: quotas are min(n_g, budget*isqrt share), hash-smallest") {
    val rnd = new scala.util.Random(13)
    val rows = Seq("a" -> 400, "b" -> 100, "c" -> 25, "d" -> 4).flatMap {
      case (g, n) => (0 until n).map(i => (g, g.hashCode.toLong * 1000 + i))
    }
    val df = rows.toDF("g", "id")
      .withColumn("h", graft.ops.TextAnalysis.tokenHash32(col("id").cast("string")))
    val kept = graft.ops.Mixing.rebalanceTemperature(
        df, "g", col("h"), col("id"), num = 1, den = 2)
      .select("g", "id").as[(String, Long)].collect()
    // expected quotas: w_g = floor(sqrt(n_g)) = 20, 10, 5, 2; sum 37;
    // budget = 529/2 = 264; quota_g = 264*w/37 capped by n_g
    val nG = Map("a" -> 400L, "b" -> 100L, "c" -> 25L, "d" -> 4L)
    val w = nG.map { case (g, n) => g -> math.sqrt(n.toDouble).toLong }
    val wSum = w.values.sum
    val budget = nG.values.sum / 2
    val quota = nG.map { case (g, n) => g -> math.min(n, budget * w(g) / wSum) }
    val gotCounts = kept.groupBy(_._1).map { case (g, ks) => g -> ks.length.toLong }
    assert(gotCounts === quota.filter(_._2 > 0))
    // flattening direction: dominant group keeps a SMALLER fraction
    assert(quota("a").toDouble / nG("a") < quota("d").toDouble / nG("d"))
    // selection is the quota-smallest by (hash, id): replay via collect
    val hashes = df.select("g", "id", "h").as[(String, Long, Long)].collect()
    val want = hashes.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (r._3, r._2)).take(quota(g).toInt).map(r => (g, r._2)).toSeq
    }.toSet
    assert(kept.toSet === want)
  }

  test("q_cdc_apply: tombstones drop keys, latest op wins") {
    val got = run("q_cdc_apply").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("last_type"), r.getAs[Long]("last_ts_us"),
          r.getAs[Long]("n_ops"), r.getAs[String]("last_op")))
      .toMap
    // driver-side replay from the same events table
    val ev = graft.ops.Tables.events(spark, dir)
      .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val byUser = ev.groupBy(_._1)
    byUser.foreach { case (u, es) =>
      val last = es.maxBy(e => (e._2, e._3))
      if (last._4 == "error") {
        assert(!got.contains(u), s"user $u ended on a tombstone but survived")
      } else {
        val (lt, lts, nOps, lop) = got(u)
        assert(lt == last._4 && lts == last._2, s"user $u wrong last op")
        assert(nOps == es.length, s"user $u op count")
        assert(lop == (if (last._4 == "signup") "I" else "U"))
      }
    }
    assert(got.keySet.subsetOf(byUser.keySet))
    assert(got.nonEmpty)
  }

  test("hardNegatives: label filter, in-cell candidates, ranked by cosine") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0, 10),
      (2L, Array(0.9f, 0.1f), 0, 20), // same cell, other label: negative
      (3L, Array(0.8f, 0.2f), 0, 20), // same cell, other label: negative
      (4L, Array(0.7f, 0.3f), 0, 10), // same cell, SAME label: excluded
      (5L, Array(0.0f, 1.0f), 1, 20)  // other cell: invisible
    ).toDF("vec_id", "embedding", "cell", "label")
    val got = graft.ops.Similarity.hardNegatives(
        vecs, vecs.filter(col("vec_id") === 1), "vec_id", "embedding",
        "cell", "label", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(got.map(_._2).toSeq === Seq(2L, 3L), "nearest other-label, in cell only")
    assert(got.map(_._3).toSeq === Seq(1, 2), "contiguous ranks")
  }

  test("q_record_linkage: decisions replay from a driver-side Fellegi-Sunter") {
    val got = run("q_record_linkage").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[String]("decision"), r.getAs[Double]("score")))
      .toMap
    // independent replay: read the register, rebuild both sides, estimate
    // u from marginals, score every blocked pair sequentially
    val rows = graft.ops.Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.get(2).asInstanceOf[Number].longValue,
        r.getString(3), math.floor(r.getDouble(4) * 100 + 0.5).toLong))
    val a = rows.toSeq.map { case (k, nm, nat, seg, bal) =>
      (k, nm, nat, seg, bal, nm.substring(15, 18))
    }
    val b = rows.toSeq.map { case (k, nm, nat, seg, bal) =>
      (k + 1000000L,
        if (k % 11 == 0) nm.substring(0, 17) + "x" else nm,
        if (k % 5 == 0) (nat + 1) % 25 else nat,
        if (k % 7 == 0) "UNKNOWN" else seg,
        bal + (if (k % 3 == 0) 100L else 0L),
        nm.substring(15, 18))
    }
    val n = a.length.toLong
    def sumSq[T](vs: Seq[T]): Long =
      vs.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
    def w(s: Long): (Double, Double) = {
      val lnN2 = 2 * math.log(n.toDouble)
      def d6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      (d6(math.log(0.9) - (math.log(s.toDouble) - lnN2)),
        d6(math.log(0.1) - (math.log((n * n - s).toDouble) - lnN2)))
    }
    val (waName, wdName) = w(sumSq(a.map(_._2)))
    val (waNat, wdNat) = w(sumSq(a.map(_._3)))
    val (waSeg, wdSeg) = w(sumSq(a.map(_._4)))
    val (waBal, wdBal) = w(sumSq(a.map(_._5)))
    val bByBlk = b.groupBy(_._6)
    val want = (for {
      (ka, nmA, natA, segA, balA, blk) <- a
      (kb, nmB, natB, segB, balB, _) <- bByBlk.getOrElse(blk, Seq.empty)
    } yield {
      val score = (if (nmA == nmB) waName else wdName) +
        (if (natA == natB) waNat else wdNat) +
        (if (segA == segB) waSeg else wdSeg) +
        (if (balA == balB) waBal else wdBal)
      val rounded = math.rint(score * 1e6) / 1e6
      val dec = if (rounded >= 8.0) "link"
        else if (rounded <= 0.0) "nonlink" else "possible"
      (ka, kb) -> dec
    }).filter(_._2 != "nonlink").toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (pair, dec) =>
      assert(got(pair)._1 == dec, s"pair $pair decision")
    }
    // a fully-clean true pair (no field perturbed) must always link
    got.foreach { case ((ka, kb), (dec, score)) =>
      if (kb == ka + 1000000L &&
          ka % 11 != 0 && ka % 5 != 0 && ka % 7 != 0 && ka % 3 != 0)
        assert(dec == "link", s"clean pair ($ka,$kb) score $score did not link")
    }
    assert(got.values.exists(_._1 == "link") && got.nonEmpty)
  }

  test("q_dsir_weights: en documents score higher than non-en on average") {
    val scores = run("q_dsir_weights")
      .join(graft.ops.Tables.documents(spark, dir).select("doc_id", "lang"), "doc_id")
      .select(col("lang") === "en", col("dsir_score"))
      .as[(Boolean, Double)].collect()
    val (en, rest) = scores.partition(_._1)
    assert(en.nonEmpty && rest.nonEmpty)
    val mEn = en.map(_._2).sum / en.length
    val mRest = rest.map(_._2).sum / rest.length
    assert(mEn > mRest,
      s"target-slice mean $mEn should exceed non-target mean $mRest")
    // every document scored exactly once
    assert(scores.length ==
      graft.ops.Tables.documents(spark, dir).count().toInt)
  }
}
