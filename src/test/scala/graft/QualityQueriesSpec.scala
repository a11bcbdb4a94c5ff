package graft

import org.apache.spark.sql.functions._

/** Properties of the data-quality / index-quality query family added in
  * round 9: bigram-LM perplexity, cross-source contamination, source
  * modularity, IVF silhouette. The DuckDB oracle hash-gates exact values;
  * these specs pin the structural invariants a hash can't express
  * (bounds, internal consistency across queries sharing a memoized
  * artifact). */
class QualityQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_lm_perplexity: positive scores, one row per multi-token doc, n_bigrams = tokens-1") {
    val got = run("q_lm_perplexity")
    val docs = graft.ops.Tables.documents(spark, dir)
      .select(col("doc_id"), graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), (size(col("toks")) - 1).cast("long").as("nb"))
    assert(got.count() == docs.count())
    val joined = got.join(docs, "doc_id")
    assert(joined.filter(col("n_bigrams") =!= col("nb")).count() == 0)
    // -ln(p) with add-one smoothing is strictly positive and at most
    // ln(max(c(a)) + V) — use a loose structural ceiling
    assert(joined.filter(col("cross_entropy") <= 0).count() == 0)
    assert(joined.filter(col("cross_entropy") > 30).count() == 0)
  }

  test("q_dedup_cross_source totals match the minhash pair set; modularity m agrees") {
    val pairs = run("q_dedup_minhash_pairs").count()
    val matrix = run("q_dedup_cross_source")
    val nSum = matrix.agg(sum(col("n_pairs"))).collect().head.getLong(0)
    assert(nSum == pairs, s"matrix pair total $nSum != pair set $pairs")
    // mean jaccard can only average verified pairs, all >= the 0.5 gate
    assert(matrix.filter(col("mean_jaccard") < 0.5).count() == 0)
    val mRow = run("q_dedup_src_modularity").collect().head
    assert(mRow.getAs[Long]("m") == pairs)
    val q = mRow.getAs[Double]("q_modularity")
    // Newman bounds: Q in [-0.5, 1]
    assert(q >= -0.5 && q <= 1.0, s"modularity $q out of bounds")
  }

  test("q_ivf_silhouette: covers every vector once; margins bounded by cosine range") {
    val sil = run("q_ivf_silhouette")
    val nVec = graft.ops.Tables.embeddings(spark, dir).count()
    assert(sil.agg(sum(col("n"))).collect().head.getLong(0) == nVec)
    // margin = cos_own - cos_other, each in [-1, 1] -> mean within [-2, 2]
    assert(sil.filter(col("mean_margin") < -2 || col("mean_margin") > 2).count() == 0)
    assert(sil.count() >= 2)
  }
}
