package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._

/** Suite-wide join lint — the WindowLintSpec discipline applied to the
  * OTHER single-machine scale-killer: a join with no equality conjunct
  * (cross join, missing condition, or pure-range/OR predicates) executes
  * as a nested loop, and if BOTH sides are corpus-sized that is |L|·|R|
  * work no cluster survives. The house rules this lint encodes:
  *
  *  - cross joins are legal ONLY to attach row-bounded frames
  *    (broadcast global-aggregate totals, collected-literal grids);
  *  - non-equi pair joins are legal ONLY over bounded-DOMAIN frames
  *    (value grids — an Aggregate sits below them by construction);
  *  - deliberately-quadratic oracle twins are named in the allowlist
  *    with a justification, the check.py grandfather convention.
  *
  * Boundedness reuses the WindowLint walk: a side is unbounded iff some
  * path reaches a file relation without crossing an Aggregate /
  * GlobalLimit / Deduplicate or ending in a driver-literal leaf.
  * Equality detection is a conjunct-level heuristic (an EqualTo under a
  * top-level OR still reads as equi here — documented false negative;
  * PlanAuditSpec's physical no-cartesian pins cover the named hot
  * paths).
  */
class JoinLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries allowed an unbounded×unbounded nested loop, with why. */
  private val allowlist: Map[String, String] = Map(
    "q_sim_cosine_pairs" ->
      ("deliberately-quadratic oracle twin over a pre-sampled sub-corpus" +
        " (documented in PlanAuditSpec's sanctioned-cross-joins pin)"),
    "q_dedup_simhash_pairs" ->
      ("pre-sampled (doc_id % 2) quadratic baseline; " +
        "q_dedup_simhash_banded is the output-identical scale path" +
        " (Dedup.simhashPairs scaladoc + TextDedupSpec equivalence)"),
    "q_dedup_simhash_h3" ->
      ("same pre-sampled quadratic baseline at maxHamming=3; " +
        "q_dedup_simhash_banded_h3 is the scale path"),
    "q_media_phash_pairs" ->
      ("pre-sampled (doc_id % 2) quadratic dHash baseline; " +
        "q_media_phash_banded is the output-identical scale path " +
        "(MultimodalDedupSpec equivalence + shared oracle form)"),
    "q_dedup_containment" ->
      ("measured trade on THIS degenerate 31-token corpus: 7M of 12.5M " +
        "pairs qualify, so any index still pays the Θ(output) floor and " +
        "the bitmap all-pairs loop is 10× faster (1.7 vs 17.9 s sf0.1); " +
        "q_dedup_containment_prefix is the realistic-vocabulary scale " +
        "path, equivalence spec-pinned"))

  private def boundedLeaf(l: LeafNode): Boolean =
    l.getClass.getSimpleName match {
      case "LocalRelation" | "OneRowRelation" | "Range" | "LogicalRDD" => true
      case _ => false
    }

  private def unbounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: GlobalLimit | _: Deduplicate => false
    case l: LeafNode => !boundedLeaf(l)
    case other => other.children.exists(unbounded)
  }

  private def hasEquiConjunct(j: Join): Boolean =
    j.condition.exists(c => c.collectFirst {
      case _: EqualTo | _: EqualNullSafe => ()
    }.nonEmpty)

  private def offending(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if !hasEquiConjunct(j)
          && unbounded(j.left) && unbounded(j.right) =>
        s"Join(${j.joinType}, cond=${j.condition.map(_.sql).getOrElse("none")})"
    }

  test("no registered query nested-loops two corpus-sized inputs") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if allowlist.contains(name) => Nil
      case (name, fn) =>
        val off = offending(fn(spark, dir))
        if (off.isEmpty) Nil else Seq(s"$name -> [${off.mkString("; ")}]")
    }
    assert(bad.isEmpty,
      "equality-free join over two corpus-sized inputs (|L|x|R| nested " +
        s"loop at 100 TB): ${bad.mkString(", ")} — add an equi blocking " +
        "key, aggregate a side onto a bounded grid, or justify in the " +
        "allowlist")
  }

  test("the detector flags a corpus×corpus range join") {
    val d = graft.ops.Tables.documents(spark, dir)
    val bad = d.select(col("doc_id").as("a"), col("n_chars").as("la"))
      .join(d.select(col("doc_id").as("b"), col("n_chars").as("lb")),
        col("la") < col("lb"))
    assert(offending(bad).nonEmpty,
      "a pure-range corpus×corpus join must be flagged")
  }

  test("the detector passes scalar attachments and grid pair joins") {
    val d = graft.ops.Tables.documents(spark, dir)
    val tot = d.agg(count(lit(1)).as("n")) // global aggregate: 1 row
    assert(offending(d.crossJoin(broadcast(tot))).isEmpty,
      "a broadcast-scalar cross attachment must pass")
    val grid = d.groupBy(col("lang")).agg(count(lit(1)).as("c"))
    val pairs = grid.select(col("lang").as("l1"), col("c").as("c1"))
      .join(grid.select(col("lang").as("l2"), col("c").as("c2")),
        col("l1") < col("l2")) // bounded-domain grid×grid, the house idiom
    assert(offending(pairs).isEmpty,
      "a grid×grid non-equi pair join must pass")
  }
}
