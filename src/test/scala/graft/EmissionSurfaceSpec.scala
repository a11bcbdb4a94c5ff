package graft

import org.apache.spark.sql.types._

/** Build-time mirror of the tools/check.py emission-surface lint.
  *
  * Round-12 root cause: the driver's hash gate cannot faithfully hash
  * top-level DECIMAL result columns and its pandas row-sorter crashes on
  * ARRAY columns — across all 297 round-12 outputs, the only emitters of
  * either type were exactly the four driver-red queries. check.py now
  * fails the class, but it only runs when someone runs it; this spec
  * enforces the same rule at `sbt test` time, so a new query can never
  * reintroduce the class. The allowed set is the driver-proven scalar
  * surface: integral (INT/BIGINT), DOUBLE, VARCHAR, DATE, TIMESTAMP,
  * BOOLEAN. DECIMALs/arrays/structs/maps remain fine INSIDE plans.
  *
  * Schema inspection only needs analysis, not execution, so walking all
  * registered queries at sf0.001 stays cheap (queries that collect
  * bounded literals at construction pay their usual tiny-fixture cost).
  */
class EmissionSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def offending(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if !allowed(f.dataType) => s"${f.name}: ${f.dataType.sql}"
    }

  private def allowed(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case DoubleType => true
    case StringType => true
    case DateType | TimestampType | TimestampNTZType => true
    case BooleanType => true
    case _ => false // Decimal, Array, Map, Struct, Binary, Float, ...
  }

  test("every registered query emits only driver-hashable scalar columns") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val off = offending(fn(spark, dir).schema)
        if (off.isEmpty) Nil else Seq(s"$name -> [${off.mkString("; ")}]")
    }
    assert(bad.isEmpty,
      s"driver-unhashable top-level column types (round-12 class): " +
        s"${bad.mkString(", ")} — emit scaled BIGINT / exact-integer " +
        s"VARCHAR / exploded scalar rows instead")
  }

  test("the checker rejects the round-12 emission class (DECIMAL / ARRAY)") {
    import spark.implicits._
    val decimals = Seq("1").toDF("x")
      .selectExpr("CAST(x AS DECIMAL(38,0)) AS d_num")
    assert(offending(decimals.schema).nonEmpty,
      "a DECIMAL(38,0) column (q_ks_test's r12 surface) must be rejected")
    val arrays = Seq(1).toDF("x")
      .selectExpr("array(CAST(x AS DOUBLE)) AS centroid")
    assert(offending(arrays.schema).nonEmpty,
      "an array<double> column (q_ivf_upsert's r12 surface) must be rejected")
  }
}
