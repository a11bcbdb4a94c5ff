package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — not part of the shipped library. Replays the
  * minhash-chain first-touch (the bench suite's most expensive single
  * item) stage by stage in a fresh JVM, mirroring what Bench's
  * q_cluster_terms first run pays. */
object Prof {
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
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.ops.Tables.documents(spark, dir)
    println("docs=" + docs.count())
    val pairs = time("nearDupMinhash") {
      graft.ops.Dedup.nearDupMinhash(docs, "doc_id", "text",
        k = 16, bands = 4, minJaccard = 0.5).localCheckpoint(true)
    }
    println("pairs=" + pairs.count())
    val comps = time("components") {
      graft.ops.Dedup.connectedComponents(pairs, "id_a", "id_b",
        uniquePairs = true).localCheckpoint(true)
    }
    println("comps=" + comps.count())
    time("cluster_terms body") {
      val sizes = comps.groupBy(col("comp")).agg(count(lit(1)).as("sz"))
        .filter(col("sz") >= 2)
      val members = comps.join(sizes.select(col("comp")), Seq("comp"))
        .select(col("id").as("doc_id"), col("comp"))
      val toks = docs.join(members, Seq("doc_id"))
        .select(col("comp"),
          explode(graft.ops.TextAnalysis.tokens(col("text"))).as("token"))
      toks.groupBy(col("comp"), col("token")).agg(count(lit(1)).as("tf")).count()
    }
    spark.stop()
  }
}
