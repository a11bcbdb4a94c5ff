package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator from SURVEY.md §2 is registered here as a named query;
  * SQL-expressible ones carry a DuckDB oracle twin for the driver's
  * hash-compare gate.
  */
object SparkEntry {

  private def all: Map[String, QueryDef] =
    CoreQueries.defs ++ PricenowQueries.defs ++ FunctionQueries.defs ++
      ExtensionQueries.defs ++ RelationalExtras.defs ++ AnalyticQueries.defs ++
      WarehouseQueries.defs ++ GraphQueries.defs ++ StatsQueries.defs ++
      RankStatsQueries.defs ++ LayoutQueries.defs ++ ClassifierQueries.defs ++
      SpatialQueries.defs ++ GovernanceQueries.defs ++ ActivityQueries.defs ++
      SamplingQueries.defs ++ ExperimentQueries.defs ++ Experiment2Queries.defs ++
      RetrievalEvalQueries.defs ++ Experiment3Queries.defs ++
      IvfMaintenanceQueries.defs ++ TextNoveltyQueries.defs ++
      AgreementQueries.defs ++ CurationQueries.defs ++ KeywordQueries.defs ++
      TpchShapeQueries.defs ++ CrossRunDedupQueries.defs ++
      KnnGraphQueries.defs ++ MaxScoreQueries.defs ++ AnnEvalQueries.defs

  /** Flagship smoke on /root/testdata/sf0.001; driver checks rows>0.
    * One row from each of the engine's three pillars — reference-parity
    * LOCF, exact dedup, ANN retrieval — gated so the row is emitted ONLY
    * when every pillar returns data: a broken pillar (not just a broken
    * flagship) makes the smoke return 0 rows and fail (round-16 verdict
    * task 6). The cross joins attach one-row scalar aggregates. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val dir = "/root/testdata/sf0.001"
    val locf = CoreQueries.defs("f1_locf_events").fn(spark, dir)
    val dedup = ExtensionQueries.defs("q_dedup_exact_docs").fn(spark, dir)
    val ann = ExtensionQueries.defs("q_sim_ann_brute").fn(spark, dir)
    locf.agg(count(lit(1)).as("locf_rows"))
      .crossJoin(dedup.agg(count(lit(1)).as("dedup_rows")))
      .crossJoin(ann.agg(count(lit(1)).as("ann_rows")))
      .filter(col("locf_rows") > 0 && col("dedup_rows") > 0 &&
        col("ann_rows") > 0)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
