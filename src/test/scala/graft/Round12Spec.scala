package graft

import org.apache.spark.sql.functions._

/** Driver-side replays of the round-12 additions: Holt-Winters fold,
  * revenue-concentration identities, winnowing selection, and n-gram
  * novelty invariants.
  */
class Round12Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_holt_winters matches a driver-side sequential replay") {
    val daily = graft.ops.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("day"),
        floor(col("value") * 1e6 + 0.5).cast("long").as("vq"))
      .groupBy(col("day")).agg(sum(col("vq")).as("s"))
      .orderBy("day")
      .collect().map(r => (r.getDate(0), r.getLong(1) / 1e6))
    assert(daily.length >= 15)
    val y = daily.map(_._2)
    var l = (y(0) + y(1) + y(2) + y(3) + y(4) + y(5) + y(6)) / 7.0
    var b = ((y(7) + y(8) + y(9) + y(10) + y(11) + y(12) + y(13)) / 7.0 - l) / 7.0
    var s = Array.tabulate(7)(i => y(i) - l)
    val expected = daily.drop(7).map { case (day, yt) =>
      val fitted = l + b + s(0)
      val nl = 0.2 * (yt - s(0)) + 0.8 * (l + b)
      val nb = 0.1 * (nl - l) + 0.9 * b
      val ns = 0.3 * (yt - (l + b)) + 0.7 * s(0)
      l = nl; b = nb; s = s.drop(1) :+ ns
      (day, math.floor(fitted * 1e6 + 0.5) / 1e6)
    }
    val got = SparkEntry.queries("q_holt_winters")(spark, dir)
      .select(col("day"), col("fitted")).collect()
      .map(r => (r.getDate(0), r.getDouble(1)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gd, gf), (ed, ef)) =>
      assert(gd == ed)
      assert(gf == ef, s"fitted at $gd: $gf vs replay $ef")
    }
  }

  test("q_concentration: Gini/HHI/CR identities replay per segment") {
    val rows = SparkEntry.queries("q_concentration")(spark, dir).collect()
    assert(rows.length == 5) // the five TPC-H market segments
    val perCust = graft.ops.Tables.orders(spark, dir)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("c"))
      .groupBy("o_custkey").agg(sum(col("c")).as("v"))
      .join(graft.ops.Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
      .collect().map(r => (r.getString(2), r.getLong(0), r.getLong(1)))
    rows.foreach { row =>
      val seg = row.getAs[String]("segment")
      val vs = perCust.filter(_._1 == seg).sortBy(t => (t._3, t._2)).map(_._3)
      val n = BigInt(vs.length); val sv = vs.map(BigInt(_)).sum
      val siv = vs.zipWithIndex.map { case (v, i) => BigInt(i + 1) * v }.sum
      val gini = (BigInt(2) * siv - (n + 1) * sv) * 1000000 / (n * sv)
      assert(row.getAs[Long]("n_cust") == vs.length)
      assert(row.getAs[Long]("gini_e6") == gini.toLong, s"gini in $seg")
      val hhi = vs.map(v => BigInt(v) * v).sum * 1000000 / (sv * sv)
      assert(row.getAs[Long]("hhi_e6") == hhi.toLong, s"hhi in $seg")
      val cr10 = vs.sorted.reverse.take(10).map(BigInt(_)).sum * 1000000 / sv
      assert(row.getAs[Long]("cr10_e6") == cr10.toLong, s"cr10 in $seg")
      assert(row.getAs[Long]("cr1_e6") <= row.getAs[Long]("cr10_e6"))
    }
  }

  test("q_winnow_fingerprint: brute-force winnowing replay on sample docs") {
    // replay the standard algorithm (min per window, rightmost tie) for a
    // handful of docs straight from the token-hash chain
    val docs = graft.ops.Tables.documents(spark, dir).filter(col("doc_id") < 20)
    val hashed = docs.select(col("doc_id"),
        graft.ops.Dedup.tokenHashes(
          graft.ops.TextAnalysis.tokens(col("text"))).as("th"))
      .select(col("doc_id"),
        graft.ops.TextAnalysis.shingleHashesFromHashes(col("th"), 5).as("g"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val expected = hashed.map { case (id, g) =>
      val fps = scala.collection.mutable.Set.empty[(Long, Int)]
      for (p <- 0 to g.length - 4) {
        val win = (p until p + 4).map(i => (g(i), i))
        val m = win.map(_._1).min
        val sel = win.filter(_._1 == m).map(_._2).max // rightmost tie
        fps += ((g(sel), sel))
      }
      id -> fps.size
    }.toMap
    val got = SparkEntry.queries("q_winnow_fingerprint")(spark, dir)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), col("n_fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, nfp) =>
      assert(nfp == expected(id).toLong, s"doc $id: $nfp vs ${expected(id)}")
    }
    // density near the theoretical 2/(w+1) = 0.4 on the corpus
    val dens = SparkEntry.queries("q_winnow_fingerprint")(spark, dir)
      .filter(col("n_kgrams") >= 50)
      .agg(avg(col("density_e6"))).collect().head.getDouble(0)
    assert(dens > 300000 && dens < 500000, s"mean density $dens")
  }

  test("q_ngram_novelty: corpus invariants (first doc all-novel, totals)") {
    val df = SparkEntry.queries("q_ngram_novelty")(spark, dir).collect()
    val first = df.minBy(_.getAs[Long]("doc_id"))
    // the first-arriving doc introduces every one of its n-grams
    assert(first.getAs[Long]("n_novel") == first.getAs[Long]("n_ngrams"))
    df.foreach { r =>
      val n = r.getAs[Long]("n_ngrams"); val nov = r.getAs[Long]("n_novel")
      assert(nov <= n)
      if (n == 0) assert(r.isNullAt(r.fieldIndex("novelty_e6")))
      else assert(r.getAs[Long]("novelty_e6") == nov * 1000000L / n)
    }
    // total novel n-grams across docs == corpus-wide distinct n-grams
    val totalNovel = df.map(_.getAs[Long]("n_novel")).sum
    val distinctGrams = graft.ops.Tables.documents(spark, dir)
      .select(graft.ops.Dedup.tokenHashes(
        graft.ops.TextAnalysis.tokens(col("text"))).as("th"))
      .select(explode(
        graft.ops.TextAnalysis.shingleHashesFromHashes(col("th"), 5)).as("g"))
      .agg(countDistinct(col("g"))).collect().head.getLong(0)
    assert(totalNovel == distinctGrams)
  }
}
