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
    * first pick is plain argmax(rel).
    *
    * Scale split: the corpus-sized work — score every vector against the
    * query and keep the top-20 — is ONE distributed pass (in production:
    * any ANN index; the pool is whatever retrieval returns). The greedy
    * itself runs on the COLLECTED pool (20 rows, metadata-scale by
    * construction — the centroid-literal / component-kernel pattern):
    * a head reranker is driver-scale everywhere it is deployed, and the
    * unrolled-distributed alternative measured 3.6-5.1 s of pure
    * job-round latency for 400 integer comparisons. Determinism across
    * engines: the driver greedy uses the IDENTICAL double fold as the
    * scoring expression (sequential dot, sqrt, one floor into integer
    * e6), after which every comparison is pure integer — the oracle
    * replays the five steps as chained CTEs and hash-matches. Output:
    * rank, vec_id, rel_e6, and the redundancy penalty max_sim_e6 at
    * selection time (0 for the first pick).
    */
  private val mmrSelect = QueryDef(
    fn = (spark, dir) => {
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") === 0L)
        .select(col("embedding").as("qv"))
      // orderBy+limit = TakeOrdered (per-partition top-20 then a 20-row
      // merge — no global sort, no single-partition row_number window);
      // (rel desc, vec_id) is a total order, so the cut is deterministic
      val pool = emb.filter(col("vec_id") =!= 0L)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("embedding"),
          cos6(col("embedding"), col("qv")).as("rel_e6"))
        .orderBy(col("rel_e6").desc, col("vec_id").asc)
        .limit(20)
        .collect() // ≤ 20 rows by construction — bounded, like centroids
      // driver greedy on exact integers; the double fold mirrors cos6's
      // expression order bit for bit (zip_with product, left fold from
      // 0.0, sqrt·sqrt then divide, one floor)
      def dot(a: Seq[Float], b: Seq[Float]): Double = {
        var acc = 0.0; var i = 0
        while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
        acc
      }
      def c6(a: Seq[Float], b: Seq[Float]): Long =
        math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
          * 1e6 + 0.5).toLong
      case class Cand(id: Long, emb: IndexedSeq[Float], rel: Long)
      val cands = pool.map(r =>
        Cand(r.getLong(0), r.getSeq[Float](1).toIndexedSeq, r.getLong(2))).toSeq
      val picked = scala.collection.mutable.ArrayBuffer.empty[(Cand, Long)]
      for (_ <- 1 to math.min(5, cands.size)) {
        val remaining = cands.filterNot(c => picked.exists(_._1.id == c.id))
        val scored = remaining.map { c =>
          val maxSim = if (picked.isEmpty) 0L
            else picked.map(p => c6(c.emb, p._1.emb)).max
          (c, maxSim, 7L * c.rel - 3L * maxSim)
        }
        val best = scored.minBy { case (c, _, s) => (-s, c.id) }
        picked += ((best._1, best._2))
      }
      val rows = picked.zipWithIndex.map { case ((c, maxSim), i) =>
        org.apache.spark.sql.Row(i + 1, c.id, c.rel, maxSim)
      }
      spark.createDataFrame(
        java.util.Arrays.asList(rows.toSeq: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("rel_e6",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("max_sim_e6",
            org.apache.spark.sql.types.LongType, nullable = false))))
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
