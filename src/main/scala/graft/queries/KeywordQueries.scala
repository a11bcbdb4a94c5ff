package graft.queries

import graft.QueryDef
import graft.ops.{Tables, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010 — "Rapid
  * Automatic Keyword Extraction"): candidate phrases are the maximal
  * runs of non-stopword tokens; each word scores deg(w)/freq(w) (degree
  * = summed length of the phrases it appears in — co-occurrence rewards
  * words that live in long phrases); a phrase scores the sum of its
  * words' scores. The unsupervised keyword pass a corpus pipeline runs
  * when no model may touch the data.
  */
object KeywordQueries {

  /** Corpus-level RAKE top-20 keywords over the EN documents (the en
    * stopword list is the boundary set — the same literal list q_doc
    * _profile and the oracle share). Scores are exact integers: each
    * word's deg/freq ratio is ⌊deg·10⁶/freq⌋ and a phrase sums its
    * DISTINCT words' floored ratios (sum-of-floors is the declared
    * statistic, replayed digit-identically — the q_map_at_k stance);
    * ties break lexicographically, so the top-20 cut is total-ordered.
    *
    * Scale shape: phrase assembly is doc-local (tokens explode with
    * position, phrase id = running stopword count per doc — the ONE
    * corpus-token-sized shuffle, keyed (doc, phrase), AQE-splittable);
    * word stats and phrase scores run on the phrase/word DOMAIN, and
    * the final cut is orderBy+limit (TakeOrdered, no global sort).
    * Single-token phrases carry deg = freq contributions (RAKE's deg
    * includes the word itself per phrase length).
    */
  private val rakeKeywords = QueryDef(
    fn = (spark, dir) => {
      val stop = TextAnalysis.StopwordLists.toMap.apply("en")
      val toks = Tables.documents(spark, dir)
        .filter(col("lang") === "en")
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "token")))
        .withColumn("is_stop", col("token").isin(stop.map(lit): _*))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val phrases = toks
        .withColumn("grp", sum(when(col("is_stop"), 1L).otherwise(0L)).over(wDoc))
        .filter(!col("is_stop"))
        .groupBy(col("doc_id"), col("grp"))
        .agg(array_join(transform(array_sort(collect_list(
            struct(col("pos"), col("token")))), e => e.getField("token")), " ")
          .as("phrase"),
          count(lit(1)).as("len"))
      // word stats over phrase instances: freq = occurrences, deg = sum
      // of host-phrase lengths (multiplicity included, as RAKE defines)
      val words = phrases
        .select(col("phrase"), col("len"), explode(split(col("phrase"), " ")).as("w"))
      val wstats = words.groupBy(col("w"))
        .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
        .withColumn("wscore_e6", expr("(deg * CAST(1000000 AS BIGINT)) div freq"))
      // phrase TYPE score: distinct words of the phrase, summed once each
      val ptype = phrases.groupBy(col("phrase"))
        .agg(count(lit(1)).as("n_occur"), max(col("len")).as("len"))
      val pscore = ptype
        .select(col("phrase"), col("n_occur"), col("len"),
          explode(array_distinct(split(col("phrase"), " "))).as("w"))
        .join(wstats.select(col("w"), col("wscore_e6")), "w")
        .groupBy(col("phrase"), col("n_occur"), col("len"))
        .agg(sum(col("wscore_e6")).as("score_e6"))
      pscore
        .orderBy(col("score_e6").desc, col("phrase").asc)
        .limit(20)
        .select(col("phrase"), col("len"), col("n_occur"), col("score_e6"))
    },
    oracle = Some {
      val stop = TextAnalysis.StopwordLists.toMap.apply("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH toks AS (SELECT doc_id, ${ExtensionQueries.dToks("text")} AS ts
         |  FROM documents WHERE lang = 'en'),
         |tk AS (SELECT doc_id, generate_subscripts(ts, 1) AS pos,
         |    unnest(ts) AS token FROM toks),
         |st AS (SELECT doc_id, pos, token,
         |    list_contains($stop, token) AS is_stop FROM tk),
         |grp AS (SELECT doc_id, pos, token, is_stop,
         |    SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
         |      PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM st),
         |phrases AS (SELECT doc_id, grp,
         |    string_agg(token, ' ' ORDER BY pos) AS phrase,
         |    COUNT(*) AS len
         |  FROM grp WHERE NOT is_stop GROUP BY doc_id, grp),
         |words AS (SELECT phrase, len, unnest(string_split(phrase, ' ')) AS w
         |  FROM phrases),
         |wstats AS (SELECT w, COUNT(*) AS freq, SUM(len) AS deg
         |  FROM words GROUP BY 1),
         |ws AS (SELECT w, CAST((deg * 1000000) // freq AS BIGINT)
         |    AS wscore_e6 FROM wstats),
         |ptype AS (SELECT phrase, COUNT(*) AS n_occur, MAX(len) AS len
         |  FROM phrases GROUP BY 1),
         |pw AS (SELECT phrase, n_occur, len,
         |    unnest(list_distinct(string_split(phrase, ' '))) AS w
         |  FROM ptype),
         |ps AS (SELECT phrase, n_occur, len,
         |    CAST(SUM(wscore_e6) AS BIGINT) AS score_e6
         |  FROM pw JOIN ws USING (w) GROUP BY 1, 2, 3)
         |SELECT phrase, CAST(len AS BIGINT) AS len, n_occur, score_e6
         |FROM ps ORDER BY score_e6 DESC, phrase ASC LIMIT 20""".stripMargin
    })

  /** Trending terms between the corpus's arrival-order halves (ascending
    * doc_id as arrival order — the q_ngram_novelty convention): which
    * tokens' usage RATE rose most from the first half to the second?
    * The crawl-monitoring readout that surfaces topic drift before it
    * skews a training mix. Rate ratio with +1 smoothing on the early
    * count, emitted exactly: ratio_e6 = ⌊c₂·n₁·10⁶ / ((c₁+1)·n₂)⌋
    * (cross-multiplied — no rate is ever divided out); minimum late
    * support c₂ ≥ 5 keeps one-off tokens out; top-20 by (ratio desc,
    * token asc) via TakeOrdered.
    *
    * Scale shape: the half assignment is a rank cut (corpus-row window
    * at test scale; a production crawl carries an ingest timestamp and
    * splits by time — documented trade); token stats are ONE
    * partial-aggregatable groupBy(token) with conditional sums. */
  private val trendingTerms = QueryDef(
    fn = (spark, dir) => {
      val docs = Tables.documents(spark, dir)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("doc_id"))))
        .withColumn("n", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .select(col("doc_id"), col("text"),
          (col("rk") * 2 <= col("n")).as("early"))
      val tok = docs.select(col("early"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      val g = tok.groupBy(col("token")).agg(
        sum(when(col("early"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("early"), 1L).otherwise(0L)).as("c2"))
      val tot = g.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      g.crossJoin(broadcast(tot))
        .filter(col("c2") >= 5)
        .select(col("token"), col("c1"), col("c2"),
          expr("(c2 * CAST(n1 AS DECIMAL(38,0))" +
            " * CAST(1000000 AS DECIMAL(38,0)))" +
            " div ((c1 + 1) * CAST(n2 AS DECIMAL(38,0)))").as("ratio_e6"))
        .orderBy(col("ratio_e6").desc, col("token").asc)
        .limit(20)
    },
    oracle = Some(
      s"""WITH d AS (SELECT doc_id, text,
         |    row_number() OVER (ORDER BY doc_id) * 2
         |      <= COUNT(*) OVER () AS early
         |  FROM documents),
         |tok AS (SELECT early, unnest(${ExtensionQueries.dToks("text")})
         |    AS token FROM d),
         |g AS (SELECT token,
         |    CAST(SUM(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         |    CAST(SUM(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS c2
         |  FROM tok GROUP BY 1),
         |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         |    CAST(SUM(c2) AS BIGINT) AS n2 FROM g)
         |SELECT token, c1, c2,
         |  CAST((CAST(c2 AS HUGEINT) * n1 * 1000000)
         |    // ((c1 + 1) * CAST(n2 AS HUGEINT)) AS BIGINT) AS ratio_e6
         |FROM g CROSS JOIN t WHERE c2 >= 5
         |ORDER BY ratio_e6 DESC, token ASC LIMIT 20""".stripMargin))

  /** Pairwise vocabulary Jaccard between sources — which corpus shards
    * speak the same language? (High overlap argues for merged dedup and
    * shared tokenizer budgets; low overlap means a shard contributes
    * genuinely new vocabulary.) ONE pass computes every pair: each
    * distinct (source, token) collapses per token into a SOURCE BITMASK
    * (bit_or of 1 << source-rank — sources are a bounded domain by
    * design), the ≤ 2^k−1 mask histogram is domain-sized, and all k²/2
    * pairwise intersections/unions read off the mask counts — the
    * corpus is never rescanned per pair. jaccard_e6 exact integral
    * division.
    *
    * Scale shape: distinct (source, token) combine, a token-keyed
    * bit_or, then everything on the mask/pair domain. */
  private val vocabOverlap = QueryDef(
    fn = (spark, dir) => {
      val srcIdx = Tables.documents(spark, dir)
        .select(col("source")).distinct()
        .withColumn("idx", (row_number().over(
          Window.orderBy(col("source"))) - 1).cast("int"))
      val masks = Tables.documents(spark, dir)
        .select(col("source"), explode(TextAnalysis.tokens(col("text")))
          .as("token"))
        .distinct()
        .join(broadcast(srcIdx), "source")
        .groupBy(col("token"))
        .agg(expr("bit_or(CAST(1 AS BIGINT) << idx)").as("mask"))
        .groupBy(col("mask")).agg(count(lit(1)).as("c"))
      val pairs = srcIdx.select(col("source").as("src_a"), col("idx").as("ia"))
        .join(srcIdx.select(col("source").as("src_b"), col("idx").as("ib")),
          col("src_a") < col("src_b"))
      pairs.join(masks,
          expr("((mask >> ia) & 1) = 1 OR ((mask >> ib) & 1) = 1"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(
          sum(when(expr("((mask >> ia) & 1) = 1 AND ((mask >> ib) & 1) = 1"),
            col("c")).otherwise(0L)).as("n_both"),
          sum(when(expr("((mask >> ia) & 1) = 1"), col("c")).otherwise(0L))
            .as("v_a"),
          sum(when(expr("((mask >> ib) & 1) = 1"), col("c")).otherwise(0L))
            .as("v_b"))
        .select(col("src_a"), col("src_b"), col("v_a"), col("v_b"),
          col("n_both"),
          expr("(n_both * CAST(1000000 AS BIGINT))" +
            " div (v_a + v_b - n_both)").as("jaccard_e6"))
        .orderBy("src_a", "src_b")
    },
    oracle = Some(
      s"""WITH si AS (SELECT source,
         |    CAST(row_number() OVER (ORDER BY source) - 1 AS INTEGER)
         |      AS idx
         |  FROM (SELECT DISTINCT source FROM documents)),
         |st AS (SELECT DISTINCT source, unnest(${ExtensionQueries.dToks("text")})
         |    AS token FROM documents),
         |mk AS (SELECT token,
         |    bit_or(CAST(1 AS BIGINT) << idx) AS mask
         |  FROM st JOIN si USING (source) GROUP BY token),
         |mc AS (SELECT mask, COUNT(*) AS c FROM mk GROUP BY 1),
         |p AS (SELECT a.source AS src_a, a.idx AS ia,
         |    b.source AS src_b, b.idx AS ib
         |  FROM si a JOIN si b ON a.source < b.source)
         |SELECT src_a, src_b,
         |  CAST(SUM(CASE WHEN ((mask >> ia) & 1) = 1 THEN c ELSE 0 END)
         |    AS BIGINT) AS v_a,
         |  CAST(SUM(CASE WHEN ((mask >> ib) & 1) = 1 THEN c ELSE 0 END)
         |    AS BIGINT) AS v_b,
         |  CAST(SUM(CASE WHEN ((mask >> ia) & 1) = 1
         |    AND ((mask >> ib) & 1) = 1 THEN c ELSE 0 END) AS BIGINT)
         |    AS n_both,
         |  CAST((SUM(CASE WHEN ((mask >> ia) & 1) = 1
         |      AND ((mask >> ib) & 1) = 1 THEN c ELSE 0 END) * 1000000)
         |    // (SUM(CASE WHEN ((mask >> ia) & 1) = 1 THEN c ELSE 0 END)
         |      + SUM(CASE WHEN ((mask >> ib) & 1) = 1 THEN c ELSE 0 END)
         |      - SUM(CASE WHEN ((mask >> ia) & 1) = 1
         |        AND ((mask >> ib) & 1) = 1 THEN c ELSE 0 END))
         |    AS BIGINT) AS jaccard_e6
         |FROM p JOIN mc ON ((mask >> ia) & 1) = 1 OR ((mask >> ib) & 1) = 1
         |GROUP BY src_a, src_b
         |ORDER BY src_a, src_b""".stripMargin))

  /** Vocabulary-growth curve (Heaps' law readout) over arrival order:
    * at each decile of the corpus (ascending doc_id — the
    * q_ngram_novelty arrival convention), the cumulative token volume
    * and the cumulative DISTINCT vocabulary. The curve a tokenizer
    * budgeter reads: if vocabulary still grows steeply at 100%, the
    * corpus has not saturated and a frozen vocab will orphan the tail.
    * One pass: each token type collapses to its FIRST arrival decile
    * (min doc rank), token volume to a per-decile count; the cumulative
    * curve is a running sum over the 10-row decile grid. No per-prefix
    * rescan — the first-arrival attribution IS the prefix-distinct
    * count.
    *
    * Scale shape: one corpus-token groupBy(token) min + one decile
    * rollup; windows on the 10-row grid. The decile cut is rank
    * arithmetic (⌈rk·10/n⌉, the q_gains_table discipline). */
  private val vocabGrowth = QueryDef(
    fn = (spark, dir) => {
      val docs = Tables.documents(spark, dir)
        .withColumn("rk", row_number().over(Window.orderBy(col("doc_id"))))
        .withColumn("n", count(lit(1)).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .select(col("text"), expr("(rk * 10 + n - 1) div n").as("decile"))
      val tok = docs.select(col("decile"),
        explode(TextAnalysis.tokens(col("text"))).as("token"))
      val vol = tok.groupBy(col("decile")).agg(count(lit(1)).as("n_tokens"))
      val firsts = tok.groupBy(col("token"))
        .agg(min(col("decile")).as("decile"))
        .groupBy(col("decile")).agg(count(lit(1)).as("n_new_types"))
      val wCum = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      vol.join(firsts, Seq("decile"), "left")
        .select(col("decile"), col("n_tokens"),
          coalesce(col("n_new_types"), lit(0L)).as("n_new_types"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(wCum))
        .withColumn("cum_vocab", sum(col("n_new_types")).over(wCum))
        .orderBy("decile")
    },
    oracle = Some(
      s"""WITH d AS (SELECT text,
         |    (row_number() OVER (ORDER BY doc_id) * 10
         |     + COUNT(*) OVER () - 1) // COUNT(*) OVER () AS decile
         |  FROM documents),
         |tok AS (SELECT decile, unnest(${ExtensionQueries.dToks("text")})
         |    AS token FROM d),
         |vol AS (SELECT decile, COUNT(*) AS n_tokens FROM tok GROUP BY 1),
         |fs AS (SELECT decile, COUNT(*) AS n_new_types FROM (
         |    SELECT token, MIN(decile) AS decile FROM tok GROUP BY 1)
         |  GROUP BY 1),
         |j AS (SELECT vol.decile, n_tokens,
         |    COALESCE(n_new_types, 0) AS n_new_types
         |  FROM vol LEFT JOIN fs USING (decile))
         |SELECT CAST(decile AS BIGINT) AS decile, n_tokens,
         |  CAST(n_new_types AS BIGINT) AS n_new_types,
         |  CAST(SUM(n_tokens) OVER (ORDER BY decile
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_tokens,
         |  CAST(SUM(n_new_types) OVER (ORDER BY decile
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_vocab
         |FROM j ORDER BY decile""".stripMargin))

  val defs: Map[String, QueryDef] = Map(
    "q_rake_keywords" -> rakeKeywords,
    "q_trending_terms" -> trendingTerms,
    "q_vocab_growth" -> vocabGrowth,
    "q_vocab_overlap" -> vocabOverlap)
}
