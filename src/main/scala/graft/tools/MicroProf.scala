package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch micro-profiling main for the optimization rounds — measures
  * per-call costs of shared infrastructure (table loader construction,
  * planning of trivial aggregates) so systemic overhead is sized with
  * numbers, not guesses. Not part of the shipped library surface. */
object MicroProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    (1 to 3).foreach(_ => spark.read.parquet(s"$dir/lineitem.parquet").schema)
    var t0 = System.nanoTime()
    (1 to 50).foreach(_ => spark.read.parquet(s"$dir/lineitem.parquet").schema)
    println(f"read.parquet construction: ${(System.nanoTime() - t0) / 50e6}%.2f ms/call")
    t0 = System.nanoTime()
    (1 to 50).foreach(_ => graft.ops.Tables.lineitem(spark, dir).schema)
    println(f"Tables.lineitem: ${(System.nanoTime() - t0) / 50e6}%.2f ms/call")
    (1 to 3).foreach(_ => graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("sum(l_quantity)").collect())
    t0 = System.nanoTime()
    (1 to 20).foreach(_ => graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("sum(l_quantity)").collect())
    println(f"scan+sum end-to-end: ${(System.nanoTime() - t0) / 20e6}%.2f ms/call")
    // pre-supplied schema: skips footer-based inference
    val sch = spark.read.parquet(s"$dir/lineitem.parquet").schema
    t0 = System.nanoTime()
    (1 to 50).foreach(_ =>
      spark.read.schema(sch).parquet(s"$dir/lineitem.parquet").schema)
    println(f"read with supplied schema: ${(System.nanoTime() - t0) / 50e6}%.2f ms/call")
    t0 = System.nanoTime()
    (1 to 20).foreach(_ => spark.read.schema(sch)
      .parquet(s"$dir/lineitem.parquet")
      .selectExpr("sum(l_quantity)").collect())
    println(f"supplied-schema scan+sum: ${(System.nanoTime() - t0) / 20e6}%.2f ms/call")
    // small table for contrast
    (1 to 3).foreach(_ => spark.read.parquet(s"$dir/nation.parquet").schema)
    t0 = System.nanoTime()
    (1 to 50).foreach(_ => spark.read.parquet(s"$dir/nation.parquet").schema)
    println(f"read.parquet nation: ${(System.nanoTime() - t0) / 50e6}%.2f ms/call")
    spark.stop()
  }
}
