package graft

import org.apache.spark.sql.functions._

/** Properties of the round-12 evaluation additions: the rank-sum AUC
  * identity behind q_roc_auc, and a driver-side sequential replay of
  * q_holt_linear's fold.
  */
class ForecastEvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q_roc_auc: rank-sum integer formula equals naive pairwise AUC") {
    // the query's math on arbitrary (label, score) data: AUC from
    // tie-averaged ranks (2r = 2p + t + 1 integers) must equal the
    // pairwise count (pos > neg) + 0.5 * (pos == neg)
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(300)((rnd.nextBoolean(), rnd.nextInt(40)))
    val pos = data.filter(_._1).map(_._2)
    val neg = data.filterNot(_._1).map(_._2)
    val pairwise = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum /
      (pos.size.toLong * neg.size)
    // integer rank-sum form over the score grid
    val grid = data.groupBy(_._2).map { case (s, xs) =>
      (s, xs.count(_._1).toLong, xs.count(!_._1).toLong)
    }.toSeq.sortBy(_._1)
    var p = 0L
    var r2a = BigInt(0)
    for ((_, ca, cb) <- grid) {
      val t = ca + cb
      r2a += BigInt(ca) * (2 * p + t + 1)
      p += t
    }
    val np = BigInt(pos.size); val nn = BigInt(neg.size)
    val aucE6 = ((r2a - np * (np + 1)) * 1000000) / (2 * np * nn)
    assert((aucE6.toDouble / 1e6 - pairwise).abs < 1e-6)
    // and the registered query emits a consistent row on real data
    val row = SparkEntry.queries("q_roc_auc")(spark, dir).collect().head
    val (nPos, nNeg) = (row.getAs[Long]("n_pos"), row.getAs[Long]("n_neg"))
    val auc = row.getAs[Long]("auc_e6")
    assert(nPos > 0 && nNeg > 0)
    assert(auc >= 0L && auc <= 1000000L)
    assert(row.getAs[Long]("gini_e6") == auc * 2 - 1000000L ||
      (row.getAs[Long]("gini_e6") - (auc * 2 - 1000000L)).abs <= 1,
      "gini must be 2*AUC-1 up to the independent floor")
  }

  test("q_holt_linear matches a driver-side sequential replay") {
    val daily = graft.ops.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts")).as("day"),
        floor(col("value") * 1e6 + 0.5).cast("long").as("vq"))
      .groupBy(col("day")).agg(sum(col("vq")).as("s"))
      .orderBy("day")
      .collect().map(r => (r.getDate(0), r.getLong(1) / 1e6))
    assert(daily.length >= 3)
    var l = daily(1)._2
    var b = daily(1)._2 - daily(0)._2
    val expected = daily.drop(2).map { case (day, y) =>
      val fitted = l + b
      val nl = 0.2 * y + 0.8 * (l + b)
      val nb = 0.1 * (nl - l) + 0.9 * b
      l = nl; b = nb
      (day, math.floor(fitted * 1e6 + 0.5) / 1e6)
    }
    val got = SparkEntry.queries("q_holt_linear")(spark, dir)
      .select(col("day"), col("fitted")).collect()
      .map(r => (r.getDate(0), r.getDouble(1)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gd, gf), (ed, ef)) =>
      assert(gd == ed)
      assert(gf == ef, s"fitted at $gd: $gf vs replay $ef")
    }
  }
}
