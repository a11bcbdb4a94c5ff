package graft

import org.apache.spark.sql.functions._

/** The cross-run dedup composition (q_dedup_cross_run): the persisted
  * prior-run pair state + the incremental pass must reconstruct the
  * full-rebuild pair universe BYTE-IDENTICALLY, and the state seeded
  * from the session's filtered memo must equal an actual corpus-only
  * rebuild (the pairwise-independence claim its scaladoc makes).
  */
class CrossRunDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select(col("id_a"), col("id_b"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("filtered-memo state equals an actual corpus-only rebuild") {
    // LSH band membership and verify jaccard are pairwise properties, so
    // full-run pairs filtered to old×old must equal a from-scratch run
    // over the old docs alone — the identity that lets the persisted
    // state be seeded without a second LSH chain
    val docs = graft.ops.Tables.documents(spark, dir)
    val old = docs.filter(col("doc_id") % 20 =!= 0)
    val rebuilt = pairSet(graft.ops.Dedup.nearDupMinhash(
      old, "doc_id", "text", k = 16, bands = 4, minJaccard = 0.5))
    val filtered = pairSet(graft.queries.ExtensionQueries
      .minhashPairs(spark, dir)
      .filter(col("id_a") % 20 =!= 0 && col("id_b") % 20 =!= 0))
    assert(filtered == rebuilt,
      "old×old filter of the full pair set must equal the corpus-only run")
  }

  test("persisted state + incremental pass reconstruct the full rebuild") {
    // the end-to-end contract: what the prior run wrote to disk, plus
    // today's incremental pairs, IS the pair universe a full rebuild
    // would produce — no pair lost, none invented, jaccards identical
    val full = pairSet(graft.queries.ExtensionQueries.minhashPairs(spark, dir))
    val incr = pairSet(graft.queries.ExtensionQueries
      .minhashIncrPairs(spark, dir))
    // force the store write, then read the state back from DISK
    val storePath = graft.queries.CrossRunDedupQueries
      .persistedPairsPath(spark, dir)
    val state = pairSet(graft.sink.IndexStore.readMinhashPairs(
      spark, storePath))
    assert(state.forall { case (a, b, _) => a % 20 != 0 && b % 20 != 0 })
    assert(incr.forall { case (a, b, _) => a % 20 == 0 || b % 20 == 0 })
    assert((state ++ incr) == full,
      "state ∪ incremental must equal the full-rebuild pair set")
    assert(state.intersect(incr).isEmpty)
  }

  test("q_dedup_cross_run emits one verdict row per batch doc") {
    val rows = graft.SparkEntry.queries("q_dedup_cross_run")(spark, dir)
      .collect()
    val batchN = graft.ops.Tables.documents(spark, dir)
      .filter(col("doc_id") % 20 === 0).count()
    assert(rows.length.toLong == batchN)
    // a doc with partners must carry a non-null root that is not itself;
    // a doc without partners must be fully novel
    rows.foreach { r =>
      val (n, root) = (r.getAs[Long]("n_partners"),
        Option(r.getAs[java.lang.Long]("dup_root")))
      if (n == 0L) {
        assert(root.isEmpty && !r.getAs[Boolean]("joins_existing"))
      } else {
        assert(root.nonEmpty)
        assert(root.get.longValue() != r.getAs[Long]("doc_id"))
      }
    }
  }
}
