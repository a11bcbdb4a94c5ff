package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq(
    // (sym, t, px, seq)
    ("A", 10L, 1.0, 1), ("A", 20L, 2.0, 2), ("A", 20L, 2.5, 3), // same-t dup
    ("B", 15L, 9.0, 4))
    .toDF("sym", "t", "px", "seq")

  private def run(trades: org.apache.spark.sql.DataFrame) =
    AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "t",
        valueCols = Seq("px", "seq"), rightTieBreak = Seq("seq"))
      .as[(String, Long, Option[Double], Option[Int])].collect()
      .sortBy(r => (r._1, r._2)).toSeq

  test("backward asof: latest right <= left time; equal times match; ties take last") {
    val trades = Seq(("A", 5L), ("A", 10L), ("A", 19L), ("A", 20L), ("A", 99L),
      ("B", 14L)).toDF("sym", "t")
    assert(run(trades) == Seq(
      ("A", 5L, None, None),          // before any quote
      ("A", 10L, Some(1.0), Some(1)), // match AT the timestamp
      ("A", 19L, Some(1.0), Some(1)),
      ("A", 20L, Some(2.5), Some(3)), // same-time dup: last in seq order
      ("A", 99L, Some(2.5), Some(3)),
      ("B", 14L, None, None)))        // B's quote is later
  }

  test("null keys follow SQL join semantics: no null-to-null matching") {
    val q = Seq((Option.empty[String], 5L, 9.9, 1)).toDF("sym", "t", "px", "seq")
    val trades = Seq((Option.empty[String], 10L)).toDF("sym", "t")
    val got = AsOfJoin.backward(trades, q, Seq("sym"), "t", "t",
        valueCols = Seq("px"), rightTieBreak = Seq("seq"))
      .as[(Option[String], Long, Option[Double])].collect().head
    assert(got == ((None, 10L, None))) // left row kept, nothing matched
  }

  test("values travel as one row: no cross-row mixing when a column is null") {
    val q2 = Seq(("A", 10L, Some(1.0), 1), ("A", 20L, None, 2))
      .toDF("sym", "t", "px", "seq")
    val trades = Seq(("A", 30L)).toDF("sym", "t")
    val got = AsOfJoin.backward(trades, q2, Seq("sym"), "t", "t",
        valueCols = Seq("px", "seq"), rightTieBreak = Seq("seq"))
      .as[(String, Long, Option[Double], Option[Int])].collect().head
    // the matched row is (t=20): px null AND seq=2 — not px from t=10
    assert(got == (("A", 30L, None, Some(2))))
  }
}
