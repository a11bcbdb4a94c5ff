package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming cross-run dedup (StreamingOps.minhashStateSink): after N
  * micro-batches the accumulated pair store must equal the one-shot
  * batch near-dup over the union of all batches, byte-identically; the
  * prepared-digest operator must equal the text-side incremental
  * operator; and a replayed micro-batch must not duplicate pairs.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft-dedupstream-" +
      s"${ProcessHandle.current().pid()}-$name"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select(col("id_a"), col("id_b"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prepared-digest operator equals the text-side incremental operator") {
    val docs = graft.ops.Tables.documents(spark, dir)
    val newDf = docs.filter(col("doc_id") % 3 === 0)
    val oldDf = docs.filter(col("doc_id") % 3 =!= 0)
    val text = pairSet(graft.ops.Dedup.nearDupMinhashIncremental(
      newDf, oldDf, "doc_id", "text", k = 16, bands = 4, minJaccard = 0.5))
    val state = pairSet(graft.ops.Dedup.nearDupMinhashFromState(
      graft.ops.Dedup.minhashPrepared(newDf, "doc_id", "text"),
      graft.ops.Dedup.minhashPrepared(oldDf, "doc_id", "text"),
      k = 16, bands = 4, minJaccard = 0.5))
    assert(state == text,
      "digest-side incremental must be byte-identical to the text side")
  }

  test("streamed pair store equals the one-shot batch build; replay idempotent") {
    implicit val sc = spark.sqlContext
    val all = graft.ops.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val batches = (0 until 3).map(i => all.filter(_._1 % 3 == i))
    assert(batches.forall(_.nonEmpty))
    val (sigStore, pairStore, ckpt) =
      (tmp("sigs"), tmp("pairs"), tmp("ckpt"))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.minhashStateSink(
      in.toDF().toDF("doc_id", "text"),
      "doc_id", "text", sigStore, pairStore, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = pairSet(
      graft.streaming.StreamingOps.minhashStatePairs(spark, pairStore))
    val oneShot = pairSet(graft.ops.Dedup.nearDupMinhash(
      all.toDF("doc_id", "text"), "doc_id", "text",
      k = 16, bands = 4, minJaccard = 0.5))
    assert(streamed == oneShot,
      "pair store after 3 micro-batches must equal the one-shot build")
    // no pair may appear in two partitions (each pair touches exactly one
    // batch's earliest-arriving doc... stronger: global multiset = set)
    val n = graft.streaming.StreamingOps
      .minhashStatePairs(spark, pairStore).count()
    assert(n.toInt == streamed.size, "pair store must hold no duplicates")

    // replay the LAST batch exactly as a foreachBatch retry would: rewrite
    // its digests and re-run the incremental pass into the same partition
    val lastId = spark.read.parquet(sigStore)
      .select(max(col("batch_id")).cast("long")).head.getLong(0)
    val replayBatch = batches.last.toDF("doc_id", "text")
    graft.ops.Dedup.minhashPrepared(replayBatch, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$sigStore/batch_id=$lastId")
    val landed = spark.read.parquet(s"$sigStore/batch_id=$lastId")
      .select(col("id"), col("sig"), col("toks"))
    val prior = spark.read.parquet(sigStore)
      .filter(col("batch_id").cast("long") < lastId)
      .select(col("id"), col("sig"), col("toks"))
    graft.ops.Dedup.nearDupMinhashFromState(landed, prior)
      .write.mode("overwrite").parquet(s"$pairStore/batch_id=$lastId")
    val replayed = pairSet(
      graft.streaming.StreamingOps.minhashStatePairs(spark, pairStore))
    assert(replayed == oneShot, "a replayed batch must not change the store")
  }

  test("streamed roots snapshot equals full-graph components; replay idempotent") {
    implicit val sc = spark.sqlContext
    val all = graft.ops.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val batches = (0 until 3).map(i => all.filter(_._1 % 3 == i))
    assert(batches.forall(_.nonEmpty))
    val (sigStore, pairStore, rootsStore, ckpt) =
      (tmp("rsigs"), tmp("rpairs"), tmp("roots"), tmp("rckpt"))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.rootsStateSink(
      in.toDF().toDF("doc_id", "text"),
      "doc_id", "text", sigStore, pairStore, rootsStore, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    def rootSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = rootSet(
      graft.streaming.StreamingOps.minhashStateRoots(spark, rootsStore))
    val oneShotPairs = graft.ops.Dedup.nearDupMinhash(
      all.toDF("doc_id", "text"), "doc_id", "text",
      k = 16, bands = 4, minJaccard = 0.5)
    val oneShot = rootSet(graft.ops.Dedup.connectedComponents(
      oneShotPairs.select(col("id_a"), col("id_b")),
      "id_a", "id_b", uniquePairs = true))
    assert(streamed.nonEmpty, "sf0.001 must produce near-dup clusters")
    assert(streamed == oneShot,
      "roots after 3 micro-batches must equal the one-shot component build")
    // GC keeps only the newest snapshot and its immediate predecessor
    val gens = new java.io.File(rootsStore).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(gens == Seq("batch_id=1", "batch_id=2"),
      s"GC must keep exactly the last two generations, got $gens")
    // replay the LAST batch's fold exactly as a foreachBatch retry would:
    // the predecessor snapshot is still there, the pair partition is
    // deterministic, so the recomputed snapshot must not change the state
    graft.streaming.StreamingOps.foldRootsSnapshot(
      spark, pairStore, rootsStore, 2L)
    val replayed = rootSet(
      graft.streaming.StreamingOps.minhashStateRoots(spark, rootsStore))
    assert(replayed == oneShot, "a replayed fold must not change the store")
  }
}
