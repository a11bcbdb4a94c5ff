package graft.queries

import graft.QueryDef
import graft.ops.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 curation selection: Maximal Marginal Relevance (Carbonell &
  * Goldstein 1998) — the relevance-vs-redundancy greedy that picks a
  * DIVERSE subset from a candidate pool, the standard last step of both
  * retrieval reranking and training-example selection ("don't spend the
  * budget on five near-identical examples").
  */
object CurationQueries {

  /** Integer-e6 cosine: floor(dot/(|a||b|)·10⁶ + 0.5) as BIGINT. The dot
    * and norms are the exact sequential folds the ANN family uses
    * (IEEE-correctly-rounded ops in identical order on both engines), and
    * the single floor lands on an integer — no rounded double survives
    * into downstream ARITHMETIC, which is the difference from round6:
    * MMR composes scores (7·rel − 3·sim), and composing 6dp doubles
    * would re-round. */
  private def cos6(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    floor(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))) * 1e6 + 0.5)
      .cast("long")
  }

  /** MMR selection of 5 diverse neighbors for query vector 0 from its
    * brute-force top-20 cosine candidates, λ = 0.7: step t picks
    * argmax over remaining candidates of
    * score10_e6 = 7·rel_e6 − 3·max_{s ∈ selected} sim_e6(c, s)
    * (the λ-blend scaled by 10 — pure integer), ties by vec_id asc; the
    * first pick is plain argmax(rel). The five steps are UNROLLED into
    * one lazy plan (no driver loop, no checkpoint churn) and the oracle
    * replays them as five chained CTEs — the fixed-iteration
    * q_pagerank/q_label_propagation discipline.
    *
    * Scale shape: the corpus-sized work is exactly one brute top-k pass
    * (in production: any ANN index — the pool is whatever retrieval
    * returns); the greedy runs on the POOL (20 rows, pool² = 400
    * pairwise sims), which is bounded by construction — MMR's cost is
    * never corpus-shaped. Output: rank, vec_id, rel_e6, and the
    * redundancy penalty max_sim_e6 at selection time (0 for the first
    * pick, so the column stays integral and NOT NULL).
    */
  private val mmrSelect = QueryDef(
    fn = (spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") === 0L)
        .select(col("embedding").as("qv"))
      val pool = emb.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("embedding"),
          cos6(col("embedding"), col("qv")).as("rel_e6"))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("rel_e6").desc, col("vec_id").asc)))
        .filter(col("rn") <= 20)
        .drop("rn")
        .localCheckpoint(true) // pool²+steps reference it; 20 rows
      val sims = pool.select(col("vec_id").as("ca"), col("embedding").as("ea"))
        .join(pool.select(col("vec_id").as("cb"), col("embedding").as("eb")),
          col("ca") =!= col("cb"))
        .select(col("ca"), col("cb"), cos6(col("ea"), col("eb")).as("sim_e6"))
      val cands = pool.select(col("vec_id"), col("rel_e6"))
      // one selection step: from `remaining`, score against `selected`
      def step(selected: DataFrame, rank: Int): DataFrame = {
        val pen = sims
          .join(selected.select(col("vec_id").as("cb")), "cb")
          .groupBy(col("ca").as("vec_id"))
          .agg(max(col("sim_e6")).as("max_sim_e6"))
        cands
          .join(selected.select(col("vec_id"), lit(1).as("__in")),
            Seq("vec_id"), "left_anti")
          .join(pen, Seq("vec_id"), "left")
          .select(col("vec_id"), col("rel_e6"),
            coalesce(col("max_sim_e6"), lit(0L)).as("max_sim_e6"),
            (lit(7L) * col("rel_e6")
              - lit(3L) * coalesce(col("max_sim_e6"), lit(0L)))
              .as("score10_e6"))
          .withColumn("r", row_number().over(
            Window.orderBy(col("score10_e6").desc, col("vec_id").asc)))
          .filter(col("r") === 1)
          .select(col("vec_id"), col("rel_e6"), col("max_sim_e6"),
            lit(rank).as("rank"))
      }
      val s1 = cands
        .withColumn("r", row_number().over(
          Window.orderBy(col("rel_e6").desc, col("vec_id").asc)))
        .filter(col("r") === 1)
        .select(col("vec_id"), col("rel_e6"), lit(0L).as("max_sim_e6"),
          lit(1).as("rank"))
      val s2 = step(s1, 2)
      val s3 = step(s1.unionByName(s2), 3)
      val s4 = step(s1.unionByName(s2).unionByName(s3), 4)
      val s5 = step(s1.unionByName(s2).unionByName(s3).unionByName(s4), 5)
      s1.unionByName(s2).unionByName(s3).unionByName(s4).unionByName(s5)
        .select(col("rank"), col("vec_id"), col("rel_e6"), col("max_sim_e6"))
        .orderBy("rank")
    },
    oracle = Some {
      def oDot(a: String, b: String) = ExtensionQueries.dSumD(
        s"list_transform(range(1, len($a) + 1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))")
      def oCos6(a: String, b: String) =
        s"CAST(floor(${oDot(a, b)} / (sqrt(${oDot(a, a)}) * sqrt(${oDot(b, b)})) * 1000000.0 + 0.5) AS BIGINT)"
      def oStep(i: Int): String = {
        val sel = (1 until i).map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
        s"""p$i AS (SELECT ca AS vec_id, MAX(sim_e6) AS max_sim_e6
           |  FROM sims WHERE cb IN ($sel) GROUP BY 1),
           |s$i AS (SELECT vec_id, rel_e6, max_sim_e6, $i AS rank FROM (
           |  SELECT c.vec_id, c.rel_e6,
           |    COALESCE(p$i.max_sim_e6, 0) AS max_sim_e6,
           |    row_number() OVER (ORDER BY
           |      7 * c.rel_e6 - 3 * COALESCE(p$i.max_sim_e6, 0) DESC,
           |      c.vec_id ASC) AS r
           |  FROM cands c LEFT JOIN p$i USING (vec_id)
           |  WHERE c.vec_id NOT IN ($sel)) WHERE r = 1)""".stripMargin
      }
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |pool AS (SELECT vec_id, embedding, rel_e6 FROM (
         |  SELECT e.vec_id, e.embedding,
         |    ${oCos6("e.embedding", "q.qv")} AS rel_e6,
         |    row_number() OVER (ORDER BY ${oCos6("e.embedding", "q.qv")} DESC,
         |      e.vec_id ASC) AS rn
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0) WHERE rn <= 20),
         |sims AS (SELECT a.vec_id AS ca, b.vec_id AS cb,
         |    ${oCos6("a.embedding", "b.embedding")} AS sim_e6
         |  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
         |cands AS (SELECT vec_id, rel_e6 FROM pool),
         |s1 AS (SELECT vec_id, rel_e6, CAST(0 AS BIGINT) AS max_sim_e6,
         |    1 AS rank FROM (
         |  SELECT vec_id, rel_e6, row_number() OVER (
         |    ORDER BY rel_e6 DESC, vec_id ASC) AS r FROM cands) WHERE r = 1),
         |${oStep(2)},
         |${oStep(3)},
         |${oStep(4)},
         |${oStep(5)}
         |SELECT CAST(rank AS INTEGER) AS rank, vec_id, rel_e6, max_sim_e6
         |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
         |      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
         |      UNION ALL SELECT * FROM s5)
         |ORDER BY rank""".stripMargin
    })

  val defs: Map[String, QueryDef] = Map(
    "q_mmr_select" -> mmrSelect)
}
