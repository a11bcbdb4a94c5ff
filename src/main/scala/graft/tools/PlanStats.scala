package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Optimization-round measurement harness (guide §1): for every (or a
  * filtered subset of) registered query, writes `.explain("formatted")`
  * to `<outDir>/<name>.txt` and prints one TSV row with
  *   - t_plan  seconds to construct the DataFrame and force executedPlan
  *             (driver-side analysis/optimization/physical planning)
  *   - t_count seconds for the bench's timed action (`.count()`)
  *   - t_noop  seconds for a noop-sink write (computes every column)
  *   - plan-shape counters: #Exchange, #SortMergeJoin, #BroadcastHashJoin,
  *     #ShuffledHashJoin, #BroadcastNestedLoopJoin, #CartesianProduct,
  *     #parquet scans, #WholeStageCodegen spans, #rowToColumnar
  * so plan-shape outliers and planning-bound queries are visible at a
  * glance. `runMain graft.tools.PlanStats <sfDir> <outDir> [name-substrings]`.
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val pats = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq(""))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup as Bench so first-touch costs don't pollute the rows
    try {
      spark.range(0, 1000000).selectExpr("sum(id)").collect()
      SparkEntry.entry(spark).count()
    } catch { case _: Throwable => () }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => pats.exists(n.contains))
    println("name\tt_plan\tt_count\tt_noop\texch\tsmj\tbhj\tshj\tbnlj\tcart\tscans\twsc")
    names.foreach { name =>
      try {
        spark.sparkContext.setJobDescription(name)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        val tPlan = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        df.count()
        val tCount = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val tNoop = (System.nanoTime() - t2) / 1e9
        // post-execution final (AQE) plan for the shape counters
        val fin = df.queryExecution.executedPlan.toString
        def c(s: String, pat: String) = pat.r.findAllIn(s).size
        val row = Seq(
          f"$tPlan%.3f", f"$tCount%.3f", f"$tNoop%.3f",
          c(fin, "Exchange "), c(fin, "SortMergeJoin"),
          c(fin, "BroadcastHashJoin"), c(fin, "ShuffledHashJoin"),
          c(fin, "BroadcastNestedLoopJoin"), c(fin, "CartesianProduct"),
          c(fin, "Scan parquet"), c(fin, "WholeStageCodegen")
        ).mkString("\t")
        println(s"$name\t$row")
        val formatted =
          try {
            val sb = new StringBuilder
            sb ++= "== executedPlan (post-run, AQE-final where applicable) ==\n"
            sb ++= fin
            sb ++= "\n\n== explain formatted ==\n"
            sb ++= df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            sb.toString
          } catch { case e: Throwable => s"explain failed: $e\n$plan" }
        java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
          formatted.getBytes("UTF-8"))
      } catch { case e: Throwable =>
        println(s"$name\tFAILED\t${e.getMessage}")
      } finally spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
