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
      TpchShapeQueries.defs ++ CrossRunDedupQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.defs("f1_locf_events").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
