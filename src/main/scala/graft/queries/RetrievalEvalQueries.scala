package graft.queries

import graft.QueryDef
import graft.ops.{Tables, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Retrieval-quality evaluation: nDCG@10 and MRR@10 over the engine's own
  * BM25 ranking — the measurement half of the retrieval stack
  * (q_bm25_topk ranks, q_hybrid_rrf fuses; these two grade). Each of the
  * three query terms is evaluated as its own retrieval query against
  * hash-derived graded relevance judgments (grades 0–3 from the
  * md5-prefix hash of term|doc — deterministic, engine-portable, and
  * uncorrelated with the BM25 score by construction, so the metric
  * genuinely varies).
  *
  * Scale shape: scoring explodes ONLY query-vocabulary tokens out of the
  * scan (the q_bm25_topk trick), so the shuffled stream is query-sized,
  * not corpus-sized; ranking windows are per-term and map-side-limited by
  * WindowGroupLimit at rank ≤ 10; the ideal-ranking frame for nDCG is
  * docs × |queries| with the 3-row query list broadcast — linear in the
  * corpus, never quadratic. Judgments in production are a capped labeled
  * set per query; here every doc carries a judgment, which only makes the
  * ideal window bigger, not differently shaped.
  *
  * Numeric discipline: the DCG term (2^rel − 1)/log2(pos+1) has a
  * 40-value domain (rel ∈ 0..3 × pos ∈ 1..10), so it is a LITERAL
  * lookup table of pre-rounded 9dp integer nano-units — neither engine
  * evaluates a transcendental (round-11 driver-red root cause: libm
  * `pow`/`ln` are not correctly rounded, so a 1-ulp build difference
  * flipped a floored digit). DCG sums and the final nDCG ratio
  * (integer cross-multiplication, `div`) are exact 64-bit arithmetic.
  */
object RetrievalEvalQueries {

  private def r6(c: Column): Column = TextAnalysis.round6(c)
  private val d289 = DecimalType(28, 9)
  private def f9(c: Column): Column = (floor(c * 1e9 + 0.5) / 1e9).cast(d289)

  private val terms = Seq("spark", "window", "merge")

  /** Per-(term, doc) BM25 score — the q_bm25_topk formula with the term
    * kept as a key — plus the retrieved rank rn per term. */
  private def retrieved(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .localCheckpoint(false)
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n"),
      (sum(size(col("toks"))).cast("double")
        / count(lit(1)).cast("double")).as("avgdl"))
    val dl = docs.select(col("doc_id"), size(col("toks")).cast("double").as("dl"))
    val tf = docs.select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(dfq, "term").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("term"), col("doc_id"),
        r6(log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
            * (col("tf") * 2.2)
            / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .cast(DecimalType(18, 6)).as("s"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("term")).orderBy(col("s").desc, col("doc_id"))))
  }

  /** graded relevance 0–3 from the md5-prefix hash of term|doc. */
  private def rel(term: Column, docId: Column): Column =
    TextAnalysis.hashBucket(concat(term, lit("|"), docId.cast("string")), 4)

  /** Pre-rounded floor((2^rel − 1)/log2(pos+1) · 1e9 + 0.5) in nano-units,
    * row-major by rel ∈ 0..3 then pos ∈ 1..10 (index = rel·10 + pos,
    * 1-based) — the single literal table both engines read, so no
    * transcendental is ever evaluated at query time. */
  private val dcgNanoTable: Seq[Long] = Seq(
    0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    1000000000L, 630929754L, 500000000L, 430676558L, 386852807L,
    356207187L, 333333333L, 315464877L, 301029996L, 289064826L,
    3000000000L, 1892789261L, 1500000000L, 1292029674L, 1160558422L,
    1068621561L, 1000000000L, 946394630L, 903089987L, 867194479L,
    7000000000L, 4416508275L, 3500000000L, 3014735907L, 2707969651L,
    2493450310L, 2333333333L, 2208254138L, 2107209970L, 2023453784L)

  /** The DCG term in integer nano-units: a literal-array lookup. */
  private def dcgNano(relC: Column, pos: Column): Column =
    element_at(array(dcgNanoTable.map(lit): _*),
      (relC * 10 + pos).cast("int"))

  private val oTerms = "(VALUES ('spark'), ('window'), ('merge')) AS q(term)"
  private def oRel(term: String, doc: String) =
    ExtensionQueries.dHash32(s"$term || '|' || CAST($doc AS VARCHAR)") + " % 4"
  private def oDcgNano(relC: String, pos: String) =
    s"([${dcgNanoTable.mkString(", ")}])[CAST(($relC) * 10 + ($pos) AS INTEGER)]"
  private def oRetrieved = {
    val dToks = ExtensionQueries.dToks("text")
    s"""docs AS (SELECT doc_id, $dToks AS toks FROM documents),
       |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |  CAST(SUM(len(toks)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
       |  FROM docs),
       |dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM docs),
       |tf AS (SELECT doc_id, token AS term, CAST(COUNT(*) AS DOUBLE) AS tf
       |       FROM (SELECT doc_id, unnest(toks) AS token FROM docs)
       |       WHERE token IN ('spark', 'window', 'merge') GROUP BY 1, 2),
       |dfq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
       |scored AS (SELECT tf.term, tf.doc_id,
       |    CAST(floor(ln((stats.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
       |      * (tf.tf * 2.2)
       |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
       |      * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS s
       |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
       |retrieved AS (SELECT term, doc_id, s, row_number() OVER
       |    (PARTITION BY term ORDER BY s DESC, doc_id) AS rn FROM scored)"""
      .stripMargin
  }

  /** nDCG@10 per query term: realized DCG over the BM25 top-10 vs the
    * ideal DCG over the globally best-graded 10 docs (rel desc, doc_id
    * tie-break — the deterministic ideal; "first-scanned wins" ideals are
    * not reproducible). DCG sums are exact nano-unit longs (≤ 10 terms ×
    * 7e9 = 7e10 ≪ 2^63); the ratio is floored 6dp integer division
    * (dcg·1e6 ≤ 7e16, still long-exact). */
  private val ndcg = QueryDef(
    fn = (spark, dir) => {
      val ret = retrieved(spark, dir).filter(col("rn") <= 10)
        .select(col("term"), col("doc_id"), col("rn"))
        .withColumn("rel", rel(col("term"), col("doc_id")))
      val dcg = ret.groupBy("term")
        .agg(sum(dcgNano(col("rel"), col("rn"))).as("dcg_nano"))
      val termsDf = spark.range(1)
        .select(explode(array(terms.map(lit): _*)).as("term"))
      val ideal = Tables.documents(spark, dir).select(col("doc_id"))
        .crossJoin(broadcast(termsDf))
        .withColumn("rel", rel(col("term"), col("doc_id")))
        .withColumn("irn", row_number().over(
          Window.partitionBy(col("term"))
            .orderBy(col("rel").desc, col("doc_id"))))
        .filter(col("irn") <= 10)
      val idcg = ideal.groupBy("term")
        .agg(sum(dcgNano(col("rel"), col("irn"))).as("idcg_nano"))
      dcg.join(idcg, "term")
        .select(col("term"), col("dcg_nano"), col("idcg_nano"),
          when(col("idcg_nano") === 0, lit(0L))
            .otherwise(expr("(dcg_nano * CAST(1000000 AS BIGINT)) div idcg_nano"))
            .as("ndcg_e6"))
        .orderBy("term")
    },
    oracle = Some(
      s"""WITH $oRetrieved,
         |graded AS (SELECT term, doc_id, rn, ${oRel("term", "doc_id")} AS rel
         |  FROM retrieved WHERE rn <= 10),
         |dcg AS (SELECT term,
         |    CAST(SUM(${oDcgNano("rel", "rn")}) AS BIGINT) AS dcg_nano
         |  FROM graded GROUP BY term),
         |ideal AS (SELECT term, doc_id, rel, row_number() OVER
         |    (PARTITION BY term ORDER BY rel DESC, doc_id) AS irn
         |  FROM (SELECT q.term, d.doc_id,
         |          ${oRel("q.term", "d.doc_id")} AS rel
         |        FROM documents d CROSS JOIN $oTerms)),
         |idcg AS (SELECT term,
         |    CAST(SUM(${oDcgNano("rel", "irn")}) AS BIGINT) AS idcg_nano
         |  FROM ideal WHERE irn <= 10 GROUP BY term)
         |SELECT term, dcg.dcg_nano, idcg.idcg_nano,
         |  CAST(CASE WHEN idcg.idcg_nano = 0 THEN 0
         |       ELSE (dcg.dcg_nano * 1000000) // idcg.idcg_nano END AS BIGINT)
         |    AS ndcg_e6
         |FROM dcg JOIN idcg USING (term) ORDER BY term""".stripMargin))

  /** MRR@10 per query term: reciprocal of the first rank whose judgment
    * is relevant (grade ≥ 2) in the BM25 top-10; 0 when no relevant doc
    * is retrieved. first_rel_pos = 0 encodes "none" (an INTEGER, not a
    * NULL, so the miss case is hash-pinned too). The reciprocal has an
    * 11-value domain (pos ∈ 0..10), so rr_e6 = ⌊10⁶/pos⌋ is pure integer
    * division — no double in the final schema (round-12 discipline). */
  private val mrr = QueryDef(
    fn = (spark, dir) => {
      val ret = retrieved(spark, dir).filter(col("rn") <= 10)
        .select(col("term"), col("doc_id"), col("rn"))
        .withColumn("rel", rel(col("term"), col("doc_id")))
      ret.groupBy("term")
        .agg(coalesce(min(when(col("rel") >= 2, col("rn"))), lit(0))
          .cast("int").as("first_rel_pos"))
        .select(col("term"), col("first_rel_pos"),
          when(col("first_rel_pos") === 0, lit(0L))
            .otherwise(expr("CAST(1000000 AS BIGINT) div first_rel_pos"))
            .as("rr_e6"))
        .orderBy("term")
    },
    oracle = Some(
      s"""WITH $oRetrieved,
         |graded AS (SELECT term, doc_id, rn, ${oRel("term", "doc_id")} AS rel
         |  FROM retrieved WHERE rn <= 10),
         |firstrel AS (SELECT term,
         |    CAST(COALESCE(MIN(CASE WHEN rel >= 2 THEN rn END), 0) AS INTEGER)
         |      AS first_rel_pos
         |  FROM graded GROUP BY term)
         |SELECT term, first_rel_pos,
         |  CAST(CASE WHEN first_rel_pos = 0 THEN 0
         |       ELSE 1000000 // first_rel_pos END AS BIGINT) AS rr_e6
         |FROM firstrel ORDER BY term""".stripMargin))

  /** MAP@10 + precision/recall@10 per query term, binary relevance =
    * grade ≥ 2 (the q_mrr threshold): hits10 = relevant retrieved in the
    * top-10, n_rel = relevant docs in the whole corpus (the judgment
    * set), P@10 = hits10/10, R@10 = hits10/n_rel, and average precision
    * AP@10 = Σ over relevant ranks k ≤ 10 of P@k, normalized by
    * min(n_rel, 10). All pure integer: the running hit count comes from
    * a rows-frame window over the ≤ 10 retrieved rows, each P@k is
    * ⌊hits_k·10⁶/k⌋, and AP is the floored division of their sum —
    * sum-of-floors is the DECLARED statistic, replayed digit-identically
    * by the oracle (the dcgNanoTable discipline: no real-valued
    * intermediate exists on either engine).
    *
    * Scale shape: identical to q_ndcg — query-sized retrieved rows, one
    * corpus × |queries| broadcast pass for the judgment totals. */
  private val mapAtK = QueryDef(
    fn = (spark, dir) => {
      val ret = retrieved(spark, dir).filter(col("rn") <= 10)
        .select(col("term"), col("doc_id"), col("rn"))
        .withColumn("isrel",
          when(rel(col("term"), col("doc_id")) >= 2, 1L).otherwise(0L))
      val wRun = Window.partitionBy(col("term")).orderBy(col("rn"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val perTerm = ret
        .withColumn("hits_k", sum(col("isrel")).over(wRun))
        .groupBy(col("term"))
        .agg(sum(col("isrel")).as("hits10"),
          sum(when(col("isrel") === 1L,
            expr("(hits_k * CAST(1000000 AS BIGINT)) div rn"))
            .otherwise(0L)).as("sum_prec_e6"))
      val termsDf = spark.range(1)
        .select(explode(array(terms.map(lit): _*)).as("term"))
      val totals = Tables.documents(spark, dir).select(col("doc_id"))
        .crossJoin(broadcast(termsDf))
        .filter(rel(col("term"), col("doc_id")) >= 2)
        .groupBy(col("term")).agg(count(lit(1)).as("n_rel"))
      perTerm.join(totals, "term")
        .select(col("term"), col("hits10"), col("n_rel"),
          expr("(hits10 * CAST(1000000 AS BIGINT)) div 10").as("p10_e6"),
          expr("(hits10 * CAST(1000000 AS BIGINT)) div n_rel").as("r10_e6"),
          expr("sum_prec_e6 div least(n_rel, CAST(10 AS BIGINT))")
            .as("ap_e6"))
        .orderBy("term")
    },
    oracle = Some(
      s"""WITH $oRetrieved,
         |graded AS (SELECT term, doc_id, rn,
         |    CASE WHEN ${oRel("term", "doc_id")} >= 2 THEN 1 ELSE 0 END
         |      AS isrel
         |  FROM retrieved WHERE rn <= 10),
         |run AS (SELECT term, rn, isrel,
         |    SUM(isrel) OVER (PARTITION BY term ORDER BY rn
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hits_k
         |  FROM graded),
         |pt AS (SELECT term, CAST(SUM(isrel) AS BIGINT) AS hits10,
         |    CAST(SUM(CASE WHEN isrel = 1
         |      THEN (hits_k * 1000000) // rn ELSE 0 END) AS BIGINT)
         |      AS sum_prec_e6
         |  FROM run GROUP BY term),
         |tot AS (SELECT term, COUNT(*) AS n_rel
         |  FROM (SELECT q.term, d.doc_id FROM documents d CROSS JOIN $oTerms
         |        WHERE ${oRel("q.term", "d.doc_id")} >= 2)
         |  GROUP BY term)
         |SELECT term, hits10, n_rel,
         |  CAST((hits10 * 1000000) // 10 AS BIGINT) AS p10_e6,
         |  CAST((hits10 * 1000000) // n_rel AS BIGINT) AS r10_e6,
         |  CAST(sum_prec_e6 // least(n_rel, 10) AS BIGINT) AS ap_e6
         |FROM pt JOIN tot USING (term) ORDER BY term""".stripMargin))

  /** Truncated Rank-Biased Overlap (Webber, Moffat & Zobel 2010,
    * p = 0.9, depth 10) between the BM25 top-10 and the deterministic
    * IDEAL relevance ranking per query term — the ranking-agreement
    * readout retrieval teams use when two rankers must be compared
    * without clicks. The identity that keeps it exact: RBO₁₀ =
    * Σ_d w_d·|A_d ∩ B_d| with w_d = (1−p)p^{d−1}/d collapses to
    * Σ over MATCHED docs of W_{max(ra, rb)} where W_m = Σ_{d≥m} w_d —
    * so the whole statistic is ONE inner join of two top-10 lists plus
    * a literal 10-entry suffix-weight table in pico-units (the
    * dcgNanoTable discipline: no power/division is ever evaluated at
    * query time; rbo_e12 is an exact integer, 235416399426 = the
    * truncated-series maximum for identical prefixes).
    *
    * Scale shape: both rankings are the memo-free q_ndcg frames
    * (query-sized retrieved rows; corpus × |queries| broadcast ideal);
    * the RBO join touches ≤ 10 × terms rows. */
  private val rbo = QueryDef(
    fn = (spark, dir) => {
      // W_m = Σ_{d=m..10} round(1e12·(1−p)·p^{d−1}/d), p = 0.9
      val wSuffix = Seq(235416399426L, 135416399426L, 90416399426L,
        63416399426L, 45191399426L, 32069399426L, 22227899426L,
        14635885140L, 8657173890L, 3874204890L)
      val ret = retrieved(spark, dir).filter(col("rn") <= 10)
        .select(col("term"), col("doc_id"), col("rn").as("ra"))
      val termsDf = spark.range(1)
        .select(explode(array(terms.map(lit): _*)).as("term"))
      val ideal = Tables.documents(spark, dir).select(col("doc_id"))
        .crossJoin(broadcast(termsDf))
        .withColumn("rel", rel(col("term"), col("doc_id")))
        .withColumn("rb", row_number().over(
          Window.partitionBy(col("term"))
            .orderBy(col("rel").desc, col("doc_id"))))
        .filter(col("rb") <= 10)
        .select(col("term"), col("doc_id"), col("rb"))
      val matched = ret.join(ideal, Seq("term", "doc_id"))
        .select(col("term"),
          element_at(array(wSuffix.map(lit): _*),
            greatest(col("ra"), col("rb")).cast("int")).as("w"))
      // left join from the term list so a zero-overlap term still rows
      termsDf.join(
          matched.groupBy(col("term"))
            .agg(count(lit(1)).as("n_overlap"), sum(col("w")).as("rbo")),
          Seq("term"), "left")
        .select(col("term"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          coalesce(col("rbo"), lit(0L)).as("rbo_e12"))
        .orderBy("term")
    },
    oracle = Some {
      val wSuffix = Seq(235416399426L, 135416399426L, 90416399426L,
        63416399426L, 45191399426L, 32069399426L, 22227899426L,
        14635885140L, 8657173890L, 3874204890L)
      s"""WITH $oRetrieved,
         |ra AS (SELECT term, doc_id, rn AS ra FROM retrieved WHERE rn <= 10),
         |ideal AS (SELECT term, doc_id, rb FROM (
         |  SELECT term, doc_id, row_number() OVER
         |      (PARTITION BY term ORDER BY rel DESC, doc_id) AS rb
         |  FROM (SELECT q.term, d.doc_id,
         |          ${oRel("q.term", "d.doc_id")} AS rel
         |        FROM documents d CROSS JOIN $oTerms)) WHERE rb <= 10),
         |m AS (SELECT ra.term,
         |    ([${wSuffix.mkString(", ")}])[CAST(greatest(ra.ra, ideal.rb)
         |      AS INTEGER)] AS w
         |  FROM ra JOIN ideal USING (term, doc_id)),
         |agg AS (SELECT term, COUNT(*) AS n_overlap,
         |    CAST(SUM(w) AS BIGINT) AS rbo FROM m GROUP BY term)
         |SELECT q.term,
         |  COALESCE(n_overlap, 0) AS n_overlap,
         |  COALESCE(rbo, CAST(0 AS BIGINT)) AS rbo_e12
         |FROM $oTerms LEFT JOIN agg ON q.term = agg.term
         |ORDER BY q.term""".stripMargin
    })

  val defs: Map[String, QueryDef] = Map(
    "q_ndcg" -> ndcg,
    "q_mrr" -> mrr,
    "q_map_at_k" -> mapAtK,
    "q_rbo" -> rbo)
}
