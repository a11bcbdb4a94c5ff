package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Sketch guarantees that the oracle hash-compare can't articulate:
  * CMS one-sided error, Bloom no-false-negatives for every inserted
  * member, and the fixed-size scaling claims.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_cms_topk: estimates never undercount (CMS one-sided error)") {
    val rows = q("q_cms_topk")
      .select("exact_n", "est_n", "overestimate_only")
      .as[(Long, Long, Boolean)].collect()
    assert(rows.length == 20)
    rows.foreach { case (exact, est, flag) =>
      assert(est >= exact && flag, s"CMS undercounted: est $est < exact $exact")
    }
  }

  test("q_bloom_decontaminate: every exact match is a bloom hit (no false negatives)") {
    val bad = q("q_bloom_decontaminate")
      .filter(!col("no_false_negative") || col("n_bloom_hits") < col("n_exact_hits"))
      .count()
    assert(bad == 0)
  }

  test("bloomBits: every inserted member probes positive on a literal set") {
    val items = (1 to 200).map(i => s"item-$i").toDF("g")
    val bloom = items
      .select(explode(Sketches.bloomBits($"g", 3, 64)).as("b"))
      .select($"b.word".as("word"), $"b.mask".as("mask"))
      .groupBy($"word").agg(expr("bit_or(mask)").as("bits"))
    val missing = items
      .select($"g", explode(Sketches.bloomBits($"g", 3, 64)).as("b"))
      .select($"g", $"b.word".as("word"), $"b.mask".as("mask"))
      .join(bloom, Seq("word"), "left_outer")
      .groupBy($"g")
      .agg(min(when($"bits".isNotNull && ($"bits".bitwiseAND($"mask") =!= 0L), 1)
        .otherwise(0)).as("all_hit"))
      .filter($"all_hit" === 0).count()
    assert(missing == 0, "an inserted member probed negative")
  }

  test("cms sketch size is depth*width regardless of stream size") {
    val toks = graft.ops.Tables.documents(spark, sf)
      .select(explode(graft.ops.TextAnalysis.tokens($"text")).as("tok"))
    val cells = toks.select(explode(Sketches.cmsCells($"tok", 4, 64)).as("c"))
      .groupBy($"c.d", $"c.cell").count()
    assert(cells.count() <= 4L * 64)
  }

  test("bloom masks stay positive (32-bit blocks dodge the 1<<63 trap)") {
    val bad = (1 to 500).map(i => s"m$i").toDF("g")
      .select(explode(Sketches.bloomBits($"g", 3, 8)).as("b"))
      .filter($"b.mask" <= 0L || $"b.word" < 0L || $"b.word" >= 8L)
      .count()
    assert(bad == 0)
  }
}
