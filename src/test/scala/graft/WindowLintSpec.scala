package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Suite-wide plan lint: no registered query may carry an UNPARTITIONED
  * window over a corpus-sized input — the single-reducer global sort that
  * killed q_gains_table (round 12) and q_trending_terms / q_vocab_growth
  * (round 13) at the 100 TB design point. The EmissionSurfaceSpec pattern
  * applied to plans: tools/check.py guards the emission surface per run,
  * this spec guards the plan surface at `sbt test` time so the class can
  * never come back.
  *
  * Heuristic (the round-13 verdict's): a `Window` with an empty
  * partitionSpec is fine ONLY when every path from its child to a leaf
  * crosses a row-bounding node first — an Aggregate (grid frames: the
  * window rides a bounded groupBy domain), a GlobalLimit (top-k frames),
  * or a Deduplicate — or bottoms out in a driver-literal LocalRelation /
  * OneRowRelation / Range / LogicalRDD leaf (collected-literal grids and
  * localCheckpoints of already-bounded frames; corpus tables always enter
  * as parquet relations, never as RDDs). A path that reaches a file
  * relation unbounded means the window globally sorts data-sized input.
  * Windows inside subquery expressions are not walked (none of the
  * registered plans window inside a subquery).
  *
  * The allowlist is CLOSED (the check.py grandfather convention): adding
  * a name requires a written justification here, and the empty list is
  * the goal state — round 14 starts empty.
  */
class WindowLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Names of queries allowed to keep an unpartitioned corpus window,
    * each with its justification. Empty — keep it that way. */
  private val allowlist: Map[String, String] = Map.empty

  private def boundedLeaf(l: LeafNode): Boolean =
    l.getClass.getSimpleName match {
      case "LocalRelation" | "OneRowRelation" | "Range" | "LogicalRDD" => true
      case _ => false // file relations: corpus-sized
    }

  private def unbounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: GlobalLimit | _: Deduplicate => false
    case l: LeafNode => !boundedLeaf(l)
    case other => other.children.exists(unbounded)
  }

  /** An all-foldable partitionSpec (e.g. partitionBy(lit(1))) is ONE
    * partition at runtime — the same single reducer as no spec at all;
    * the lint must not be evadable by a constant key. */
  private def effectivelyUnpartitioned(w: Window): Boolean =
    w.partitionSpec.forall(_.foldable)

  /** The offending windows of one plan, rendered for the failure message. */
  private def offending(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case w: Window if effectivelyUnpartitioned(w) && unbounded(w.child) =>
        s"Window(order=${w.orderSpec.map(_.sql).mkString(", ")})"
    }

  test("no registered query windows unpartitioned over corpus-sized input") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if allowlist.contains(name) => Nil
      case (name, fn) =>
        val off = offending(fn(spark, dir))
        if (off.isEmpty) Nil else Seq(s"$name -> [${off.mkString("; ")}]")
    }
    assert(bad.isEmpty,
      "unpartitioned corpus-sized window (single-reducer global sort at " +
        s"100 TB): ${bad.mkString(", ")} — rewrite onto a bounded bin grid " +
        "(the q_gains_table / KeywordQueries.arrivalBuckets discipline)")
  }

  test("the detector flags the retired q_trending_terms pattern") {
    // the exact round-13 shape: global row_number over the documents scan
    val old = graft.ops.Tables.documents(spark, dir)
      .withColumn("rk", row_number().over(W.orderBy(col("doc_id"))))
    assert(offending(old).nonEmpty,
      "a global row_number over a parquet scan must be flagged")
  }

  test("a constant partition key does not evade the detector") {
    val evading = graft.ops.Tables.documents(spark, dir)
      .withColumn("rk", row_number().over(
        W.partitionBy(lit(1)).orderBy(col("doc_id"))))
    assert(offending(evading).nonEmpty,
      "partitionBy(lit(1)) is still one reducer and must be flagged")
  }

  test("the detector passes grid-shaped windows (aggregate below the window)") {
    val grid = graft.ops.Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        W.orderBy(col("lang")).rowsBetween(Long.MinValue, 0)))
    assert(offending(grid).isEmpty,
      "a window over a bounded groupBy grid must pass")
  }
}
