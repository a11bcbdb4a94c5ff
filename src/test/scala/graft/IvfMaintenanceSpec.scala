package graft

import org.apache.spark.sql.functions._

/** Invariants of the incremental IVF upsert (IvfMaintenanceQueries):
  * the merged sufficient statistics must equal a FULL recompute over
  * corpus ∪ assigned-batch (the whole point of mergeable state), and the
  * updated index must still retrieve — probing the post-upsert cells
  * keeps top-5 recall at or above the untrained-cells floor.
  */
class IvfMaintenanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def nano(c: org.apache.spark.sql.Column) =
    floor(c.cast("double") * 1e9 + 0.5).cast("long")

  test("q_ivf_upsert equals a full recompute over corpus + assigned batch") {
    // since round 13 the query emits the index STATE as scalar rows
    // (cell, pos 1-based, s_tot, n_old, n_new); reconstruct the merged
    // centroid here with the same two IEEE divisions the old array
    // emission used, so the bit-identity assertion below still holds
    val out = SparkEntry.queries("q_ivf_upsert")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .groupBy(_._1)
      .map { case (cell, rs) =>
        val sorted = rs.sortBy(_._2)
        assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
          s"cell $cell pos must be dense 1-based")
        (cell, (sorted.head._4, sorted.head._5,
          sorted.map(t => t._3.toDouble / 1e9 / (t._4 + t._5)).toSeq))
      }
    // replay: corpus stats + batch assignment exactly as the query defines
    val emb = graft.ops.Tables.embeddings(spark, dir)
    val isNew = pmod(col("vec_id"), lit(10)) === 7
    val corpus = emb.filter(!isNew)
    val batch = emb.filter(isNew)
    val oldStats = corpus
      .select(col("label").as("cell"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(nano(col("v"))).as("s"), count(lit(1)).as("n"))
    val cents = oldStats.groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"),
        (col("s").cast("double") / 1e9 / col("n")).as("m")))).as("pm"))
      .select(col("cell").as("label"),
        transform(col("pm"), e => e.getField("m")).as("centroid"))
    val assigned = graft.ops.Similarity.kmeansAssign(
      batch.select(col("vec_id"), col("embedding"), col("label")),
      cents, "vec_id", "embedding", "label")
      .localCheckpoint(true)
    // FULL recompute over the union with the post-assignment cells
    val union = corpus.select(col("label"), col("embedding"))
      .union(assigned.select(col("label"), col("embedding")))
    val full = union
      .select(col("label").as("cell"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(nano(col("v"))).as("s"), count(lit(1)).as("n"))
      .groupBy(col("cell"))
      .agg(max(col("n")).as("n"),
        array_sort(collect_list(struct(col("pos"),
          (col("s").cast("double") / 1e9 / col("n")).as("m")))).as("pm"))
      .select(col("cell"), col("n"),
        transform(col("pm"), e => e.getField("m")).as("centroid"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getSeq[Double](2))))
      .toMap
    assert(out.keySet == full.keySet)
    for ((cell, (nOld, nNew, centroid)) <- out) {
      val (nFull, cFull) = full(cell)
      assert(nOld + nNew == nFull, s"cell $cell count")
      assert(centroid == cFull,
        s"cell $cell merged centroid must be bit-identical to full recompute")
    }
    // recall on the POST-upsert index: probe 2 of 10 cells for the fixed
    // 8-query set and compare against brute-force truth; the untrained
    // label-cell floor is the ~0.2 scan fraction — assert above 0.15 so
    // the gate catches a broken merge/probe, not sampling noise
    val fullCells = corpus.select(col("vec_id"), col("embedding"), col("label"))
      .union(assigned.select(col("vec_id"), col("embedding"), col("label")))
    val qs = emb.filter(col("vec_id") < 8)
    val truth = graft.ops.Similarity.bruteForceTopK(
      emb, qs, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val probed = graft.ops.Similarity.ivfTopK(fullCells, qs,
      graft.ops.Similarity.centroidsLiteral(fullCells, "label", "embedding"),
      "vec_id", "embedding", "label", k = 5, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"))
    val nTruth = truth.count()
    val hits = truth.join(probed, Seq("query_id", "neighbor_id")).count()
    assert(nTruth == 40L)
    assert(hits.toDouble / nTruth >= 0.15,
      s"post-upsert recall collapsed: $hits/$nTruth")
  }

  test("q_ivf_multiprobe: hits monotone non-decreasing in nprobe, floors hold") {
    // the probe candidate sets NEST as p grows (the per-query cell
    // ranking is fixed), so recall can only rise with scan fraction —
    // the property that makes the sweep a meaningful cost knob
    val rows = SparkEntry.queries("q_ivf_multiprobe")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 5L))
    assert(rows.forall(_._2 == 40L), "n_truth must be 8 queries x top-5")
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sorted,
      s"hits must be monotone in nprobe: ${rows.map(_._3).toSeq}")
    assert(rows.forall(_._4), s"per-depth recall floors must hold: $rows")
  }
}
