package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** In-JVM A/B timing for the optimization rounds: runs each named query
  * `reps` times with the Tables schema cache ON and OFF, interleaved
  * (ABAB…), so box drift cancels and the cache's true effect isolates.
  * `runMain graft.tools.AbProf <sfDir> <name-substrings> [reps]`.
  * Not part of the shipped library surface. */
object AbProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val pats = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
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
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => pats.exists(n.contains))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // untimed warmup both ways
      Seq("true", "false").foreach { v =>
        System.setProperty("graft.tables.noSchemaCache", v)
        try fn(spark, sfDir).count() catch { case e: Throwable =>
          println(s"ABPROF $name FAILED: ${e.getMessage}") }
      }
      val on = collection.mutable.ArrayBuffer.empty[Double]
      val off = collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ =>
        Seq(("false", on), ("true", off)).foreach { case (v, acc) =>
          System.setProperty("graft.tables.noSchemaCache", v)
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          acc += (System.nanoTime() - t0) / 1e9
        }
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"ABPROF $name%-28s cacheON med=${med(on.toSeq)}%6.3f " +
        f"cacheOFF med=${med(off.toSeq)}%6.3f  (on: ${on.map(x => f"$x%.2f").mkString(",")} | off: ${off.map(x => f"$x%.2f").mkString(",")})")
      System.setProperty("graft.tables.noSchemaCache", "false")
    }
    spark.stop()
  }
}
