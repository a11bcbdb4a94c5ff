package graft

import graft.ops.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unit contracts for the ANN evaluation family (AnnEvalQueries): the
  * SQ8 asymmetric scorer's algebra, and its measured approximation
  * error on real testdata. The driver-gate oracles prove the end-to-end
  * sweeps; these pin the scorer itself. */
class AnnEvalSpec extends SparkSpec {

  import spark.implicits._

  /** The query family's SQ8 encoder: round(x / max|x| * 127). */
  private def sq8(vecCol: String): org.apache.spark.sql.Column = {
    val maxAbs = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    when(maxAbs > 0, transform(col(vecCol),
      x => floor(x.cast("double") / maxAbs * 127 + 0.5).cast("int")))
  }

  test("SQ8 codes are scale-invariant, so cosineInt scores are too") {
    val v = Seq(
      (1L, Array(0.3f, -0.7f, 0.1f, 0.5f)),
      (2L, Array(0.9f, -2.1f, 0.3f, 1.5f))) // = 3 × row 1
      .toDF("id", "vec")
    val codes = v.select(col("id"), sq8("vec").as("codes"))
      .as[(Long, Array[Int])].collect().toMap
    assert(codes(1L) === codes(2L),
      "codes must depend only on the vector's direction pattern, not scale")
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "qv")
    val scored = q.crossJoin(v.select(sq8("vec").as("codes"), col("id").as("cid")))
      .select(col("cid"), Similarity.cosineInt(col("qv"), col("codes")).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(scored(1L) === scored(2L))
  }

  test("cosineInt maps zero-norm codes to NULL") {
    val df = Seq((1L, Array(1.0f, 0.0f), Array(0, 0)))
      .toDF("id", "qv", "codes")
      .select(Similarity.cosineInt(col("qv"), col("codes")).as("s"))
    assert(df.collect().head.isNullAt(0))
  }

  test("SQ8 approximation error stays under 0.02 cosine on testdata") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.ops.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("cv"),
      sq8("embedding").as("codes"))
    val err = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select((abs(Similarity.cosineInt(col("qv"), col("codes"))
        - Similarity.cosine(col("qv"), col("cv")))).as("e"))
      .agg(max(col("e")).as("max_err"))
      .as[Double].collect().head
    assert(err < 0.02,
      s"int8 quantization of unit-ish 64-dim vectors should cost < 0.02 " +
        s"cosine, measured $err")
  }
}
