package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Input-bytes profiler for the optimization rounds: runs each named
  * query once (warm, after one untimed throwaway run) and reports total
  * task input bytes + records — the direct evidence for "this change
  * removed a duplicate scan" claims that plan strings can't settle when
  * AQE reuse happens at runtime. `runMain graft.tools.IoProf <sfDir>
  * <name-substrings>`. Not part of the shipped library surface. */
object IoProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val pats = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(""))
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
    val inBytes = new LongAdder
    val inRecs = new LongAdder
    val shufBytes = new LongAdder
    val tasks = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          inBytes.add(m.inputMetrics.bytesRead)
          inRecs.add(m.inputMetrics.recordsRead)
          shufBytes.add(m.shuffleReadMetrics.totalBytesRead)
          tasks.add(1)
        }
      }
    })
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => pats.exists(n.contains))
    names.foreach { name =>
      try {
        SparkEntry.queries(name)(spark, sfDir).count() // warm / first-touch
        Thread.sleep(300)
        inBytes.reset(); inRecs.reset(); shufBytes.reset(); tasks.reset()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener drain
        println(f"IOPROF $name%-30s ${secs}%6.2f s  in=${inBytes.sum / 1e6}%8.2f MB" +
          f" recs=${inRecs.sum}%10d shuf=${shufBytes.sum / 1e6}%8.2f MB tasks=${tasks.sum}%5d")
      } catch { case e: Throwable =>
        println(s"IOPROF $name FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
