package graft

import graft.ops.Dedup

/** Property-style invariants for connectedComponents after the round-12
  * multilevel rewrite (oriented-pair contraction + driver-kernel
  * union-find + distributed-loop fallback): seeded random graphs across
  * the shapes that stress each path — sparse scatter (many tiny
  * components), a dense clique block (one-pass star collapse), and long
  * chains (the propagation worst case the kernel loop must still walk) —
  * all compared against an independent in-memory union-find, on BOTH the
  * driver-kernel path and the forced distributed loop.
  */
class ComponentsPropertySpec extends SparkSpec {
  import spark.implicits._

  private def reference(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (x, y) = (find(a), find(b))
      if (x != y) { if (x < y) parent(y) = x else parent(x) = y }
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    // canonical representative = component minimum
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
  }

  test("random graphs match an in-memory union-find on both paths") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      // scatter pairs + a clique block + a chain, ids interleaved
      val scatter = (0 until 30).map { _ =>
        val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2)
      val cliqueIds = (100L to 106L)
      val clique = for (a <- cliqueIds; b <- cliqueIds if a < b) yield (a, b)
      val chain = (200L until 220L).map(i => (i, i + 1))
      val all = (scatter ++ clique ++ chain).distinct
      val df = all.toDF("id_a", "id_b")
      val want = reference(all).toSeq.sorted

      val fast = Dedup.connectedComponents(df, "id_a", "id_b", uniquePairs = true)
        .as[(Long, Long)].collect().toSeq.sorted
      assert(fast == want, s"seed $seed: driver-kernel path diverged")

      val loop = Dedup.connectedComponents(df, "id_a", "id_b",
          uniquePairs = true, kernelCap = -1L)
        .as[(Long, Long)].collect().toSeq.sorted
      assert(loop == want, s"seed $seed: distributed-loop path diverged")
    }
  }

  test("empty and single-pair graphs") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, "id_a", "id_b",
      uniquePairs = true).count() == 0L)
    val one = Seq((7L, 3L)).toDF("id_a", "id_b") // NOT a<b: general path
    val got = Dedup.connectedComponents(one, "id_a", "id_b")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((3L, 3L), (7L, 3L)))
  }

  test("general path: a node appearing ONLY as a self-pair keeps comp = id") {
    // round-12 ADVICE: the pa =!= pb edge filter silently dropped nodes
    // whose only appearance was a self-pair (a, a); the seed now draws
    // its node set from the unfiltered pair list
    val pairs = Seq((9L, 9L), (7L, 3L), (3L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((3L, 3L), (7L, 3L), (9L, 9L)),
      s"self-pair-only node 9 must be present with comp = 9, got $got")
  }

  test("kernel fast path is bypassed for fractional id types (ordering hazard)") {
    // longValue() truncates doubles — 1.2 and 1.7 would compare equal; the
    // gate must route non-integral id types to the distributed loop, whose
    // least/min uses native type semantics. 1.2 < 1.7 so comp = 1.2.
    val pairs = Seq((1.7, 1.2)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Double, Double)].collect().toSeq.sorted
    assert(got == Seq((1.2, 1.2), (1.7, 1.2)))
  }
}
