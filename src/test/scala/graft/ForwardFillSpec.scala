package graft

import graft.ops.ForwardFill
import org.apache.spark.sql.functions._

/** The SURVEY.md §7.4 semantic traps for the F1 centerpiece, each as its own
  * case: leading gaps emit no row, pre-season changes seed the fill,
  * same-day duplicates resolve to the last in tie-break order, end-day
  * changes apply, post-season changes are ignored, null days/values drop.
  */
class ForwardFillSpec extends SparkSpec {
  import spark.implicits._

  private def fill(rows: Seq[(Int, Option[String], Option[Int], Int)],
                   start: String = "2025-12-13", end: String = "2025-12-17") =
    ForwardFill.dailyGrid(
        rows.toDF("id", "day_s", "value", "ord")
          .withColumn("day", to_date(col("day_s"))).drop("day_s"),
        "id", "day", "value", tieBreak = Seq("ord"), start = start, end = end)
      .as[(Int, java.sql.Date, Int)].collect()
      .map { case (id, d, v) => (id, d.toString, v) }.sorted.toSeq

  test("pre-start change seeds the whole grid (ref :220-225)") {
    val got = fill(Seq((1, Some("2025-12-01"), Some(100), 1)))
    assert(got == (13 to 17).map(d => (1, f"2025-12-$d%02d", 100)))
  }

  test("leading gap before first change emits no row (ref :233-239)") {
    val got = fill(Seq((1, Some("2025-12-15"), Some(100), 1)))
    assert(got == (15 to 17).map(d => (1, f"2025-12-$d%02d", 100)))
  }

  test("same-day duplicate changes: last in tie-break order wins (ref :229-231)") {
    val got = fill(Seq(
      (1, Some("2025-12-13"), Some(100), 1),
      (1, Some("2025-12-13"), Some(200), 2)))
    assert(got.forall(_._3 == 200))
  }

  test("mid-grid change switches the carried value on its own day") {
    val got = fill(Seq(
      (1, Some("2025-12-13"), Some(100), 1),
      (1, Some("2025-12-15"), Some(200), 2)))
    assert(got == Seq(
      (1, "2025-12-13", 100), (1, "2025-12-14", 100),
      (1, "2025-12-15", 200), (1, "2025-12-16", 200), (1, "2025-12-17", 200)))
  }

  test("change after grid end is ignored; change ON end day applies") {
    val got = fill(Seq(
      (1, Some("2025-12-17"), Some(300), 1),
      (1, Some("2025-12-18"), Some(999), 2)))
    assert(got == Seq((1, "2025-12-17", 300)))
  }

  test("null day or null value rows are dropped (ref :205-208)") {
    val got = fill(Seq(
      (1, None, Some(999), 1),
      (1, Some("2025-12-13"), None, 2),
      (1, Some("2025-12-14"), Some(100), 3)))
    assert(got == (14 to 17).map(d => (1, f"2025-12-$d%02d", 100)))
  }

  test("ids fill independently; id with no usable change emits nothing") {
    val got = fill(Seq(
      (1, Some("2025-12-16"), Some(100), 1),
      (2, None, Some(5), 2)))
    assert(got.map(_._1).distinct == Seq(1))
  }

  test("row count per id = grid days minus leading gap (property)") {
    // 40 ids with a first change at day (id % 10) inside a 10-day grid
    val rows = (1 to 40).map { id =>
      (id, Some(f"2025-12-${13 + id % 5}%02d"), Some(id * 10), id)
    }
    val got = fill(rows)
    val byId = got.groupBy(_._1).view.mapValues(_.size).toMap
    (1 to 40).foreach { id => assert(byId(id) == 5 - id % 5, s"id=$id") }
  }

  // --- interpolatedGrid: the continuous sibling ----------------------------

  private def interp(rows: Seq[(Int, Option[String], Option[Int], Int)],
                     start: String = "2025-12-13", end: String = "2025-12-17") =
    ForwardFill.interpolatedGrid(
        rows.toDF("id", "day_s", "value", "ord")
          .withColumn("day", to_date(col("day_s"))).drop("day_s"),
        "id", "day", "value", tieBreak = Seq("ord"), start = start, end = end)
      .as[(Int, java.sql.Date, Double)].collect()
      .map { case (id, d, v) => (id, d.toString, v) }.sorted.toSeq

  test("interpolation: gap days lie on the straight line between points") {
    val got = interp(Seq(
      (1, Some("2025-12-13"), Some(10), 1),
      (1, Some("2025-12-17"), Some(30), 2)))
    assert(got == Seq(
      (1, "2025-12-13", 10.0), (1, "2025-12-14", 15.0), (1, "2025-12-15", 20.0),
      (1, "2025-12-16", 25.0), (1, "2025-12-17", 30.0)))
  }

  test("interpolation: change days take their own value exactly (LOCF parity)") {
    val rows = Seq(
      (1, Some("2025-12-13"), Some(100), 1),
      (1, Some("2025-12-15"), Some(200), 2))
    val byDay = interp(rows).map { case (_, d, v) => d -> v }.toMap
    assert(byDay("2025-12-13") == 100.0 && byDay("2025-12-15") == 200.0)
  }

  test("interpolation: flat carry after the last change, no row before the first") {
    val got = interp(Seq((1, Some("2025-12-14"), Some(50), 1)))
    assert(got == (14 to 17).map(d => (1, f"2025-12-$d%02d", 50.0)))
  }

  test("interpolation: pre-grid seed point anchors the line") {
    // change at 12-11 (value 0) and 12-16 (value 50): grid starts mid-line
    val got = interp(Seq(
      (1, Some("2025-12-11"), Some(0), 1),
      (1, Some("2025-12-16"), Some(50), 2)))
    assert(got == Seq(
      (1, "2025-12-13", 20.0), (1, "2025-12-14", 30.0), (1, "2025-12-15", 40.0),
      (1, "2025-12-16", 50.0), (1, "2025-12-17", 50.0)))
  }

  test("interpolation: same-day duplicates — tie-break winner is the anchor") {
    val got = interp(Seq(
      (1, Some("2025-12-13"), Some(999), 1),
      (1, Some("2025-12-13"), Some(10), 2),
      (1, Some("2025-12-15"), Some(20), 3)))
    val byDay = got.map { case (_, d, v) => d -> v }.toMap
    assert(byDay("2025-12-13") == 10.0, "last same-day change wins as anchor")
    assert(byDay("2025-12-14") == 15.0)
  }
}
