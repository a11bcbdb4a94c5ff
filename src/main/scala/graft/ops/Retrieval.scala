package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scored-retrieval operators beyond plain exhaustive ranking: MaxScore /
  * WAND-style upper-bound pruning (Turtle & Flood 1995; Broder et al.,
  * CIKM 2003 — public literature) re-expressed as a distributed dataflow.
  *
  * The input contract is a POSTINGS frame — one row per (doc_id, token)
  * with that pairing's exact per-term score `s` as DECIMAL(18,6) (the
  * bm25 family's determinism discipline: per-term doubles are floor-
  * pinned to 6dp then summed in decimal, so partial-aggregation order
  * cannot perturb a total and pruning thresholds compare EXACTLY on both
  * engines). Full document score = Σ s over the doc's matched terms.
  *
  * Pruning argument (why the pruned top-k is EXACT, not approximate):
  *  - ub(t) = max_d s(d,t): no doc can collect more than ub(t) from t.
  *  - θ0 = the k-th best FULL score among docs containing the seed term
  *    (the term with the largest ub — in practice the rarest/highest-idf
  *    one, so this subset is small). The k-th best over a SUBSET of docs
  *    is ≤ the true k-th best, so θ0 is a valid lower bound on the
  *    entry bar. If fewer than k docs contain the seed term, θ0 is
  *    undefined and no pruning happens (correctness first).
  *  - bound(d) = Σ_{t ∈ d∩Q} ub(t) ≥ score(d). A doc with
  *    bound(d) < θ0 has score(d) < θ0 ≤ true k-th score — it can
  *    neither enter the top k nor tie the boundary (ties need
  *    score = k-th score, but pruned docs are STRICTLY below). Every
  *    true top-k doc d has bound(d) ≥ score(d) ≥ k-th ≥ θ0, so the
  *    non-strict keep-filter `bound ≥ θ0` retains all of them.
  *
  * Scale shape: ub is a |Q|-row aggregate (broadcast); θ0 is one full
  * scoring pass over the seed term's postings only; bound(d) is a
  * group-sum over the narrow (doc, token) stream with a broadcast ub
  * join — NO per-doc length or tf work for docs that get pruned; only
  * survivors reach the final scoring aggregate. On a 100 TB corpus with
  * a selective seed term this turns "score every matching doc" into
  * "score the seed term's docs + the few whose matched-term bounds
  * clear the bar" (q_maxscore_prune_stats measures the ratio). The
  * final top-k window rides the survivors' aggregate and is map-side
  * bounded by WindowGroupLimit.
  */
object Retrieval {

  /** (ub frame, seed-term 1-row frame, θ 1-row frame, per-doc bounds,
    * surviving candidate ids) — shared by the ranked and stats outputs. */
  private def pruneParts(postings: DataFrame, k: Int):
      (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val ub = postings.groupBy(col("token")).agg(max(col("s")).as("ub"))
    val seedTok = ub
      .withColumn("urn", row_number().over(
        Window.orderBy(col("ub").desc, col("token").asc)))
      .filter(col("urn") === 1)
      .select(col("token"))
    val seedDocs = postings
      .join(broadcast(seedTok), "token")
      .select(col("doc_id"))
    val seedTop = postings
      .join(seedDocs, "doc_id")
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).as("score"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rn") <= k)
    val theta = seedTop.agg(count(lit(1)).as("n_top"), min(col("score")).as("kth"))
      .select(when(col("n_top") >= k, col("kth")).as("theta"))
    val bounds = postings
      .join(broadcast(ub), "token")
      .groupBy(col("doc_id"))
      .agg(sum(col("ub")).as("bound"))
    val candidates = bounds
      .crossJoin(broadcast(theta))
      .filter(col("theta").isNull || col("bound") >= col("theta"))
      .select(col("doc_id"))
    (ub, seedTok, theta, bounds, candidates)
  }

  /** MaxScore-pruned EXACT top-k: identical output to ranking every
    * matching document (the oracle replays the exhaustive form — a
    * hash-green row is the losslessness proof), computed by scoring only
    * the pruning survivors. Emits (doc_id, score_micros BIGINT, rn) —
    * the decimal score scaled to integer micros (the driver-hashable
    * emission surface). */
  def maxScoreTopK(postings: DataFrame, k: Int): DataFrame = {
    val (_, _, _, _, candidates) = pruneParts(postings, k)
    postings
      .join(candidates, "doc_id")
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).as("score"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rn") <= k)
      .select(col("doc_id"),
        (col("score") * 1000000).cast("bigint").as("score_micros"),
        col("rn"))
  }

  /** The pruning telemetry as one verifiable row: how many docs matched
    * any query term, how many contain the seed term, how many survived
    * the bound filter, and the θ0 bar itself (integer micros; -1 when
    * fewer than k seed docs exist and pruning is disabled). `pruned_frac`
    * is the rational ratio (floor-pinned double — no transcendentals). */
  def maxScorePruneStats(postings: DataFrame, k: Int): DataFrame = {
    val (_, seedTok, theta, _, candidates) = pruneParts(postings, k)
    val nMatch = postings.agg(countDistinct(col("doc_id")).as("n_match"))
    val nSeed = postings.join(broadcast(seedTok), "token")
      .agg(count(lit(1)).as("n_seed"))
    val nCand = candidates.agg(count(lit(1)).as("n_candidates"))
    nMatch.crossJoin(nSeed).crossJoin(nCand)
      .crossJoin(broadcast(theta))
      .select(col("n_match"), col("n_seed"), col("n_candidates"),
        (col("n_match") - col("n_candidates")).as("n_pruned"),
        coalesce((col("theta") * 1000000).cast("bigint"), lit(-1L))
          .as("theta_micros"),
        TextAnalysis.round6((col("n_match") - col("n_candidates"))
          .cast("double") / col("n_match").cast("double")).as("pruned_frac"))
  }
}
