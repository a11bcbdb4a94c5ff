package graft

import graft.ops.{Similarity, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, Array(1f, 0f, 0f)),
    (2L, Array(0.9f, 0.1f, 0f)),
    (3L, Array(0f, 1f, 0f)),
    (4L, Array(-1f, 0f, 0f)),
    (5L, Array(0.8f, 0.2f, 0f))).toDF("vec_id", "embedding")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f, 3f), Array(3f, -1.5f, 0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")).as("same"),
      Similarity.cosine(col("a"), col("c")).as("orth"),
      Similarity.cosine(col("a"), expr("transform(a, x -> -x)")).as("opp"))
      .collect().head
    assert(r.getAs[Double]("same") == 1.0)
    assert(r.getAs[Double]("orth") == 0.0)
    assert(r.getAs[Double]("opp") == -1.0)
  }

  test("fused native CosineSimilarity expression is bit-identical to the HOF form") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val both = emb.as("x").join(emb.as("y"),
        col("x.vec_id") % 7 === 0 && col("y.vec_id") % 11 === 0)
      .select(
        Similarity.cosine(col("x.embedding"), col("y.embedding")).as("fused"),
        Similarity.cosineHof(col("x.embedding"), col("y.embedding")).as("hof"))
    assert(both.filter(col("fused") =!= col("hof")).count() == 0)
    assert(both.count() > 1000)
  }

  test("bruteForceTopK ranks by cosine desc, excludes self, k rows per query") {
    val got = Similarity.bruteForceTopK(corpus, corpus.filter(col("vec_id") === 1),
        "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(got.map(_._2).toSeq == Seq(2L, 5L, 3L)) // 0.994, 0.970, 0.0
    assert(got.map(_._4).toSeq == Seq(1, 2, 3))
    assert(got.forall(_._1 == 1L))
  }

  test("signBucket packs sign bits of leading dims") {
    val got = Seq((Array(1f, -1f, 1f, -1f)))
      .toDF("v").select(Similarity.signBucket(col("v"), 4).as("b"))
      .as[Long].collect().head
    assert(got == (1 | 4)) // bits 0 and 2 set
  }

  test("lshTopK only pairs within a bucket; results are a subset of brute force") {
    val brute = Similarity.bruteForceTopK(corpus, corpus, "vec_id", "embedding", 3)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2)).toSet
    val lsh = Similarity.lshTopK(corpus, corpus, "vec_id", "embedding", 3, nBits = 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(lsh.nonEmpty)
    assert(lsh.map(r => (r._1, r._2)).toSet.subsetOf(brute))
    // vec 4 (negative x) sits alone in its bucket -> no neighbors
    assert(!lsh.exists(_._1 == 4L))
  }

  test("AND-OR amplification: 16x4-bit tables recover the recall one table cannot") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = emb.filter(col("vec_id") < 8)
    val truth = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def hits(tables: Int, nBits: Int): Int =
      Similarity.lshTopK(emb, qs, "vec_id", "embedding", 5, nBits = nBits, tables = tables)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
        .intersect(truth).size
    val one = hits(tables = 1, nBits = 4)
    val amplified = hits(tables = 16, nBits = 4)
    // measured on this fixture: single 4-bit table well below the floor,
    // the 16-table OR family at 39/40 — the floor q_ann_recall asserts
    assert(amplified >= math.ceil(truth.size * 0.8).toInt,
      s"amplified recall $amplified/${truth.size} under the 0.8 floor")
    assert(amplified > one,
      s"amplification gained nothing: tables=16 -> $amplified, tables=1 -> $one")
  }

  test("lshTopK rejects vectors narrower than tables*nBits per row") {
    val ex = intercept[Exception] {
      Similarity.lshTopK(corpus, corpus, "vec_id", "embedding", 3,
        nBits = 4, tables = 2).collect() // 3-dim vectors, 8 sign dims needed
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("lshTopK")))
  }

  test("ivfTopK: centroids are per-cell means; probing all cells equals brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.centroids(emb, "label", "embedding")
    val nCells = cents.count().toInt
    assert(nCells > 1)
    // with nprobe = all cells, IVF degenerates to exact brute force
    val ivf = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
        cents, "vec_id", "embedding", "label", k = 3, nprobe = nCells)
      .as[(Long, Long, Double, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(ivf == brute)
    // with nprobe = 1, results are a (possibly strict) subset per query
    val ivf1 = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5),
        cents, "vec_id", "embedding", "label", k = 3, nprobe = 1)
      .as[(Long, Long, Double, Int)].collect()
    assert(ivf1.nonEmpty)
  }

  test("kmeansAssign: one Lloyd step raises mean vector-to-own-centroid cosine") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def quality(assigned: org.apache.spark.sql.DataFrame): Double = {
      val cents = Similarity.centroids(assigned, "label", "embedding")
        .withColumnRenamed("label", "__c")
      assigned.join(cents, col("label") === col("__c"))
        .select(avg(
          Similarity.dot(col("embedding"), col("centroid").cast("array<float>"))
            / (Similarity.norm(col("embedding"))
              * Similarity.norm(col("centroid").cast("array<float>")))).as("q"))
        .collect().head.getDouble(0)
    }
    val before = quality(emb)
    val step1 = Similarity.kmeansAssign(emb,
      Similarity.centroids(emb, "label", "embedding"), "vec_id", "embedding", "label")
    assert(step1.count() == emb.count(), "every vector must get exactly one cell")
    val after = quality(step1)
    assert(after > before,
      s"Lloyd step must not worsen clustering: before=$before after=$after")
    // and the retrained cells compose with ivfTopK unchanged
    val ivf = Similarity.ivfTopK(step1, step1.filter(col("vec_id") < 3),
      Similarity.centroids(step1, "label", "embedding"),
      "vec_id", "embedding", "label", k = 3, nprobe = 2)
    assert(ivf.count() > 0)
  }

  test("zero vectors never rank as neighbors and never pass near-dup thresholds") {
    val withZero = corpus.union(
      Seq((99L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding"))
    val top = Similarity.bruteForceTopK(withZero,
        withZero.filter(col("vec_id") === 1), "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Int)].collect()
    assert(!top.exists(_._2 == 99L), "zero vector must not be a neighbor")
    val pairs = Similarity.cosineNearDupPairs(withZero, "vec_id", "embedding", 0.1)
      .as[(Long, Long, Double)].collect()
    assert(!pairs.exists(p => p._1 == 99L || p._2 == 99L))
  }

  test("fused cosine yields NULL on length mismatch, like the HOF twin") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")).as("fused"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("silhouetteMargin: separated clusters yield positive margins; own/other correct") {
    val clustered = Seq(
      (1L, Array(1f, 0f, 0f), 0),
      (2L, Array(0.9f, 0.1f, 0f), 0),
      (3L, Array(0f, 1f, 0f), 1),
      (4L, Array(0.1f, 0.9f, 0f), 1)).toDF("vec_id", "embedding", "cell")
    val cents = Similarity.centroidsLiteral(clustered, "cell", "embedding")
    val got = Similarity.silhouetteMargin(clustered, cents, "embedding", "cell")
      .select(col("vec_id"), col("cos_own"), col("cos_other"))
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.size == 4)
    // every vector sits with its own cluster: cos_own > cos_other, both in [-1, 1]
    got.foreach { case (id, own, other) =>
      assert(own > other, s"vec $id: own $own <= other $other")
      assert(own <= 1.0 && own >= -1.0 && other <= 1.0 && other >= -1.0)
    }
    // vec 1 vs its own centroid (0.95, 0.05, 0) is near-parallel
    assert(got.head._2 > 0.99)
  }

  test("silhouetteMargin rejects a single-cell centroid set") {
    val one = Seq((1L, Array(1f, 0f), 0), (2L, Array(0.9f, 0.1f), 0))
      .toDF("vec_id", "embedding", "cell")
    val cents = Similarity.centroidsLiteral(one, "cell", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.silhouetteMargin(one, cents, "embedding", "cell")
    }
  }

  test("cosineNearDupPairs returns ordered pairs above threshold") {
    val got = Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding", 0.95)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2)).toSeq
    // cos(1,2)=0.994, cos(1,5)=0.970, cos(2,5)=0.991 — all >= 0.95
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L), (1L, 5L), (2L, 5L)))
    assert(got.forall(p => p._1 < p._2 && p._3 >= 0.95))
  }
}
