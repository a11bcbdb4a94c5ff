package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the streaming roots-sink build: replays the
  * q_dedup_roots_stream memo build step by step with wall-clock timers
  * so the 40+ s first-touch cost decomposes into stage / fold / write
  * terms. Not part of the shipped library surface. */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STEP $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = s"/tmp/graft-streamprof-${ProcessHandle.current().pid()}"
    val fs = new org.apache.hadoop.fs.Path(base + "-src")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("-src", "-sigs", "-pairs", "-roots", "-ckpt").foreach(s =>
      fs.delete(new org.apache.hadoop.fs.Path(base + s), true))
    val srcDir = new org.apache.hadoop.fs.Path(base + "-src")
    fs.mkdirs(srcDir)
    val docs = graft.ops.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    time("stage 3 source files") {
      (0 until 3).foreach { i =>
        val stage = new org.apache.hadoop.fs.Path(s"$base-stage-$i")
        docs.filter(col("doc_id") % 3 === i)
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = fs.listStatus(stage).map(_.getPath)
          .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet")).get
        fs.rename(part, new org.apache.hadoop.fs.Path(srcDir, f"batch-$i%03d.parquet"))
        fs.delete(stage, true)
      }
    }
    // replay the foreachBatch body manually per batch
    (0 until 3).foreach { i =>
      val batchId = i.toLong
      val batch = spark.read.parquet(f"$srcDir/batch-$i%03d.parquet")
        .repartition(32)
      time(s"batch $i sign+write") {
        graft.ops.Dedup.minhashPrepared(batch, "doc_id", "text", 16)
          .write.mode("overwrite").parquet(s"$base-sigs/batch_id=$batchId")
      }
      val landed = spark.read.parquet(s"$base-sigs/batch_id=$batchId")
        .select(col("id"), col("sig"), col("toks"))
      val prior = spark.read.parquet(s"$base-sigs")
        .filter(col("batch_id").cast("long") < batchId)
        .select(col("id"), col("sig"), col("toks"))
      time(s"batch $i pair join+write") {
        graft.ops.Dedup.nearDupMinhashFromState(landed, prior, 16, 4, 0.5)
          .write.mode("overwrite").parquet(s"$base-pairs/batch_id=$batchId")
      }
      time(s"batch $i fold roots") {
        val m = graft.streaming.StreamingOps.getClass
          .getDeclaredMethods.find(_.getName == "foldRootsSnapshot").get
        m.setAccessible(true)
        m.invoke(graft.streaming.StreamingOps,
          spark, s"$base-pairs", s"$base-roots", java.lang.Long.valueOf(batchId))
      }
    }
    Seq("-src", "-sigs", "-pairs", "-roots", "-ckpt").foreach(s =>
      fs.delete(new org.apache.hadoop.fs.Path(base + s), true))
    spark.stop()
  }
}
