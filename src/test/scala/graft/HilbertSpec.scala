package graft

import org.apache.spark.sql.functions._

/** Hilbert key correctness: the defining curve properties (bijection
  * onto 0..n²−1 and unit-step adjacency — THE locality guarantee that
  * distinguishes it from Morton, whose quadrant seams teleport) checked
  * by the engine itself on a full order-2 and order-3 grid, plus pinned
  * order-8 values from the reference walk.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private def keys(order: Int): Seq[((Int, Int), Long)] = {
    val n = 1 << order
    val grid = (for (y <- 0 until n; x <- 0 until n) yield (x, y)).toDF("x", "y")
    graft.sink.Hilbert.withHilbertKey(grid, col("x"), col("y"), order, "hd")
      .as[(Int, Int, Long)].collect().map { case (x, y, d) => ((x, y), d) }.toSeq
  }

  test("order-2 and order-3 keys are a bijection with unit-step adjacency") {
    for (order <- Seq(2, 3)) {
      val n = 1 << order
      val ks = keys(order)
      assert(ks.map(_._2).sorted == (0L until n.toLong * n).toSeq,
        s"order $order: not a bijection onto 0..${n * n - 1}")
      val walk = ks.sortBy(_._2).map(_._1)
      assert(walk.zip(walk.tail).forall { case ((ax, ay), (bx, by)) =>
        math.abs(ax - bx) + math.abs(ay - by) == 1
      }, s"order $order: consecutive keys are not grid-adjacent")
    }
  }

  test("order-8 pinned values match the reference walk") {
    val got = Seq((0, 0), (255, 0), (0, 255), (255, 255), (3, 7)).toDF("x", "y")
    val ks = graft.sink.Hilbert.withHilbertKey(got, col("x"), col("y"), 8, "hd")
      .as[(Int, Int, Long)].collect().map { case (x, y, d) => ((x, y), d) }.toMap
    assert(ks((0, 0)) == 0L)
    assert(ks((255, 0)) == 65535L)
    assert(ks((0, 255)) == 21845L)
    assert(ks((255, 255)) == 43690L)
    assert(ks((3, 7)) == 48L)
  }

  test("morton seams jump, hilbert steps stay unit — the locality claim") {
    // walk key order over the full order-3 grid: max Manhattan step
    val n = 8
    val grid = (for (y <- 0 until n; x <- 0 until n) yield (x, y)).toDF("x", "y")
    val h = graft.sink.Hilbert.withHilbertKey(grid, col("x"), col("y"), 3, "k")
      .as[(Int, Int, Long)].collect().sortBy(_._3)
    val z = grid.withColumn("k", graft.sink.ZOrder.zValue(col("x"), col("y"), 3))
      .as[(Int, Int, Long)].collect().sortBy(_._3)
    def maxStep(s: Array[(Int, Int, Long)]) =
      s.zip(s.tail).map { case ((ax, ay, _), (bx, by, _)) =>
        math.abs(ax - bx) + math.abs(ay - by) }.max
    assert(maxStep(h) == 1)
    assert(maxStep(z) > 1)
  }
}
