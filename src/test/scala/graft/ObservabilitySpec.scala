package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** `Dataset.observe` instrumentation: the metrics must arrive with the
  * frame's own action (no second scan), match a direct computation, and
  * surface per micro-batch in streaming progress.
  */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  test("batch: quality metrics ride the action and match direct computation") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, -3.5), (null, 7.0), (4L, null), (5L, 0.0))
      .toDF("k", "v")
    val (instrumented, obs) = graft.ops.Observability.qualityObserved(df, "k", "v")
    // the ONE action both produces the result and lands the metrics
    assert(instrumented.count() == 5)
    val m = obs.get
    assert(m("n_rows") == 5L)
    assert(m("n_null_key") == 1L)
    assert(m("n_null_value") == 1L)
    assert(m("n_negative") == 1L)
    assert(m("value_min") == -3.5 && m("value_max") == 10.0)
  }

  test("streaming: observed metrics surface per micro-batch in query progress") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val exprs = graft.ops.Observability.qualityMetricExprs("k", "v")
    val q = in.toDF().toDF("k", "v")
      .observe("quality", exprs.head, exprs.tail: _*)
      .writeStream.format("memory").queryName("obsq")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, 5.0), (2L, -1.0))
      q.processAllAvailable()
      val progress = q.recentProgress
        .flatMap(p => Option(p.observedMetrics.get("quality"))).lastOption
      assert(progress.isDefined, "observed metrics missing from progress")
      val row = progress.get
      assert(row.getAs[Long]("n_rows") == 2L)
      assert(row.getAs[Long]("n_negative") == 1L)
      assert(row.getAs[Double]("value_max") == 5.0)
    } finally q.stop()
  }
}
