package graft

import graft.ops.ForwardFill
import org.apache.spark.sql.functions._

/** Property-style invariants for the F1 centerpiece (SURVEY.md §5), driven
  * by seeded random change sets (deterministic, 15 seeds × 12 changes):
  *   1. output matches an independent in-memory LOCF reference model
  *      (latest change <= day, last-in-ingest-order on equal days);
  *   2. output is dense per id: contiguous days ending at the grid end;
  *   3. ids with no usable change emit nothing (covered by the model);
  *   4. nulls and post-end changes never surface.
  */
class ForwardFillPropertySpec extends SparkSpec {
  import spark.implicits._

  private val Start = java.time.LocalDate.parse("2025-12-13")
  private val End = java.time.LocalDate.parse("2025-12-22") // 10-day grid

  test("forward-fill invariants hold for seeded random change sets") {
    for (seed <- 1 to 15) {
      val rnd = new scala.util.Random(seed)
      val changes = (0 until 12).map { ord =>
        val id = 1 + rnd.nextInt(4)
        val day = if (rnd.nextInt(10) == 0) None
          else Some(Start.plusDays(rnd.nextInt(18) - 5)) // pre-start..post-end
        val value = if (rnd.nextInt(10) == 0) None else Some(1 + rnd.nextInt(999))
        (id, day, value, ord)
      }
      val df = changes.map { case (id, d, v, ord) => (id, d.map(_.toString), v, ord) }
        .toDF("id", "day_s", "value", "ord")
        .withColumn("day", to_date(col("day_s"))).drop("day_s")
      val got = ForwardFill.dailyGrid(df, "id", "day", "value",
          tieBreak = Seq("ord"), start = Start.toString, end = End.toString)
        .as[(Int, java.sql.Date, Int)].collect()
        .map { case (id, d, v) => (id, d.toLocalDate, v) }

      // independent reference model (mirrors scripts/pricenow_etl.py:200-240)
      val usable = changes.collect {
        case (id, Some(d), Some(v), ord) if !d.isAfter(End) => (id, d, v, ord)
      }
      val expected = usable.groupBy(_._1).flatMap { case (id, chs) =>
        val sorted = chs.sortBy(c => (c._2.toEpochDay, c._4))
        Iterator.iterate(Start)(_.plusDays(1)).takeWhile(!_.isAfter(End)).flatMap { day =>
          sorted.filter(!_._2.isAfter(day)).lastOption.map(c => (id, day, c._3))
        }
      }.toSet
      assert(got.toSet == expected, s"seed=$seed")

      got.groupBy(_._1).foreach { case (id, rows) =>
        val days = rows.map(_._2).sortBy(_.toEpochDay)
        assert(days.last == End, s"seed=$seed id=$id not extending to end")
        days.sliding(2).filter(_.length == 2).foreach { w =>
          assert(w(1) == w(0).plusDays(1), s"seed=$seed id=$id gap")
        }
      }
    }
  }
}
