package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — not part of the shipped library. */
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
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.ops.Tables.documents(spark, dir)
    println("docs=" + docs.count())
    spark.range(1000000).selectExpr("sum(id)").collect()
    val sigs = time("sig-build") {
      docs.select(col("doc_id").as("id"),
          graft.ops.Dedup.minhashSignature(
            graft.ops.TextAnalysis.tokenSet(col("text")), 16).as("sig"))
        .repartition(col("id")).localCheckpoint(true)
    }
    val banded = sigs
      .select(col("id"), explode(graft.ops.Dedup.bandKeys(col("sig"), 4, 4)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    val candidates = time("cand-join") {
      banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") &&
            col("x.band_key") === col("y.band_key") && col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
        .distinct().localCheckpoint(true)
    }
    println("cands=" + candidates.count())
    val candIds = candidates.select(col("id_a").as("id"))
      .union(candidates.select(col("id_b").as("id"))).distinct()
    val candToks = time("cand-tokenize") {
      docs.select(col("doc_id").as("id"), col("text").as("__text"))
        .join(candIds, "id")
        .select(col("id"),
          graft.ops.TextAnalysis.tokenSet(col("__text")).as("toks"))
        .localCheckpoint(true)
    }
    val a = candToks.select(col("id").as("id_a"), col("toks").as("toks_a"))
    val b = candToks.select(col("id").as("id_b"), col("toks").as("toks_b"))
    val pairs = time("verify") {
      candidates.join(a, "id_a").join(b, "id_b")
        .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
        .withColumn("jaccard", floor(col("inter").cast("double")
          / (size(col("toks_a")) + size(col("toks_b")) - col("inter"))
            .cast("double") * 1e6 + 0.5) / 1e6)
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .localCheckpoint(true)
    }
    println("pairs=" + pairs.count())
    val comps = time("components") {
      graft.ops.Dedup.connectedComponents(pairs, "id_a", "id_b")
        .localCheckpoint(true)
    }
    println("comps=" + comps.count())
    spark.stop()
  }
}
