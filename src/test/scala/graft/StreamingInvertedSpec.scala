package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming inverted-index maintenance (StreamingOps.invertedStateSink):
  * BM25 served from the folded state after N micro-batches must be
  * BIT-identical to the one-shot scorer over the union of batches (corpus
  * stats df / n_docs / Σdl are associative counts over disjoint doc
  * sets), a replayed stats fold must be a no-op, and GC must keep exactly
  * the last two stat generations. The driver gate (q_bm25_stream) proves
  * the same contract against DuckDB on the harness corpus; these tests
  * pin it in-process with a MemoryStream, including mid-stream df/avgdl
  * drift.
  */
class StreamingInvertedSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft-invspec-" +
      s"${ProcessHandle.current().pid()}-$tag"
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(path, true)
    p
  }

  private val terms = Seq("dup", "join", "scan")

  /** One-shot exhaustive BM25 on a (doc_id, text) frame — the
    * MaxScoreQueries postings arithmetic, scored without pruning. */
  private def oneShotTopK(docs: org.apache.spark.sql.DataFrame,
      k: Int): Seq[(Long, Long, Int)] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val toks = docs.select(col("doc_id"),
      graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
    val stats = toks.agg(count(lit(1)).cast("double").as("n"),
      (sum(size(col("toks"))).cast("double")
        / count(lit(1)).cast("double")).as("avgdl"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("double").as("dl"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfq = tf.groupBy(col("token")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(dfq, "token").join(dl, "doc_id").crossJoin(broadcast(stats))
      .select(col("doc_id"), graft.ops.TextAnalysis.round6(
        (((col("n") - col("df") + 0.5) / (col("df") + 0.5))
          * (col("tf") * 2.2))
          / (col("tf") + lit(1.2)
            * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .cast(DecimalType(18, 6)).as("s"))
      .groupBy(col("doc_id")).agg(sum(col("s")).as("score"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rn") <= k)
      .select(col("doc_id"),
        (col("score") * 1000000).cast("bigint").as("m"), col("rn"))
      .as[(Long, Long, Int)].collect().toSeq
  }

  test("BM25 from streamed state equals the one-shot scorer; replay + GC") {
    implicit val sc = spark.sqlContext
    val all = graft.ops.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val batches = (0 until 3).map(i => all.filter(_._1 % 3 == i))
    assert(batches.forall(_.nonEmpty))
    val (idx, ckpt) = (tmp("idx"), tmp("ckpt"))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.invertedStateSink(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", idx, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val served = graft.streaming.StreamingOps
      .invertedStateBm25(spark, idx, terms, 10)
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._3)
    val oneShot = oneShotTopK(all.toDF("doc_id", "text"), 10)
    assert(served.nonEmpty)
    assert(served === oneShot,
      "BM25 from the maintained index must be bit-identical to one-shot")
    // mid-stream state differs from the final state (df/avgdl drift is
    // real): generation 1's df snapshot must not equal generation 2's
    val gens = new java.io.File(s"$idx/df").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(gens == Seq("batch_id=1", "batch_id=2"),
      s"GC must keep exactly the last two stat generations, got $gens")
    val df1 = spark.read.parquet(s"$idx/df/batch_id=1")
      .as[(String, Long)].collect().toMap
    val df2 = spark.read.parquet(s"$idx/df/batch_id=2")
      .as[(String, Long)].collect().toMap
    assert(df1 != df2, "df must drift as batches arrive")
    assert(terms.forall(t => df1.getOrElse(t, 0L) <= df2.getOrElse(t, 0L)),
      "df is a monotone count over arriving docs")
    // replay the LAST fold exactly as a foreachBatch retry would
    graft.streaming.StreamingOps.foldTextStats(spark, idx, 2L)
    val replayed = graft.streaming.StreamingOps
      .invertedStateBm25(spark, idx, terms, 10)
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._3)
    assert(replayed === oneShot, "a replayed fold must not change the state")
  }

  test("a doc landing later re-ranks earlier docs through df drift") {
    // batch 1: doc 1 is the only holder of 'rare' (df=1, big idf). batch
    // 2 floods 'rare' into many docs — doc 1's served score must DROP
    // (stats drift applies retroactively to already-indexed postings,
    // which is exactly what per-batch stat snapshots are for).
    implicit val sc = spark.sqlContext
    val (idx, ckpt) = (tmp("idx2"), tmp("ckpt2"))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.invertedStateSink(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", idx, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    def servedScore: Long = graft.streaming.StreamingOps
      .invertedStateBm25(spark, idx, Seq("rare"), 10)
      .filter(col("doc_id") === 1L)
      .select(col("score_micros")).as[Long].collect().head
    try {
      in.addData((1L, "rare word among filler filler"),
        (2L, "filler text only"))
      q.processAllAvailable()
      val early = servedScore
      in.addData((10L, "rare rare things"), (11L, "rare stuff"),
        (12L, "rare again"), (13L, "more rare"))
      q.processAllAvailable()
      val late = servedScore
      assert(late < early,
        s"df drift must devalue doc 1's 'rare' score: early=$early late=$late")
    } finally q.stop()
  }
}
