package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of forward-fill onto a dense daily calendar (LOCF) — the reference's
  * centerpiece operator (`scripts/pricenow_etl.py:200-240`,
  * `forward_fill_daily_grid`). Semantics reproduced exactly:
  *
  *   - change rows with a null day or null value are dropped
  *     (ref :205-208, T4);
  *   - a change strictly before the grid start still seeds the fill
  *     (ref :220-225 scans for the last change <= season_start);
  *   - the fill value on day d is the latest change with day' <= d; a change
  *     dated d applies on d itself (ref :229-231);
  *   - days before an id's first change emit NO row — leading gaps are
  *     dropped, not null-filled (ref :233-239);
  *   - several changes on one (id, day): the last in tie-break order wins
  *     (ref :214 stable sort + pointer walk — last-in-order wins).
  *
  * Spark-first design — ONE shuffle total: instead of (join grid with
  * changes) + (window over id) — two shuffles — we UNION the change points
  * with the generated grid rows and run a single running
  * `last(value, ignoreNulls)` window partitioned by id. Change rows sort
  * before the grid row of the same day (kind 0 < 1), so the frame ending at
  * each grid row sees exactly the changes <= that day, latest last. At 100 TB
  * the window partitions by id (bounded state: one running value per
  * partition, no spill risk); skewed ids are handled by AQE since the only
  * exchange is the window's hash partitioning.
  */
object ForwardFill {

  /** @param changes  change-point rows (any extra columns are dropped)
    * @param idCol    partition key (reference: productDefinitionId)
    * @param dayCol   DateType column of the change day
    * @param valueCol value carried forward (reference: price)
    * @param tieBreak ascending columns ordering same-day changes; the last
    *                 one wins (reference: ingest order, Python stable sort)
    * @param start    grid start, ISO `yyyy-MM-dd` (inclusive)
    * @param end      grid end, ISO (inclusive)
    * @return (idCol, dayCol, valueCol) dense over [max(start, first change), end]
    */
  def dailyGrid(
      changes: DataFrame,
      idCol: String,
      dayCol: String,
      valueCol: String,
      tieBreak: Seq[String],
      start: String,
      end: String): DataFrame = {
    val valueType = changes.schema(changes.schema.fieldIndex(valueCol)).dataType
    val pts = changes
      .select((Seq(idCol, dayCol, valueCol) ++ tieBreak).map(col): _*)
      .na.drop(Seq(idCol, dayCol, valueCol))
      .filter(col(dayCol) <= to_date(lit(end)))
      .withColumn("__kind", lit(0))

    // Dense calendar per id that has at least one usable change point.
    // sequence+explode is generated map-side off the (small) distinct-id set.
    val grid = pts
      .select(col(idCol)).distinct()
      .select(
        col(idCol),
        explode(sequence(to_date(lit(start)), to_date(lit(end)), expr("interval 1 day")))
          .as(dayCol))
      .withColumn(valueCol, lit(null).cast(valueType))
      .withColumn("__kind", lit(1))
    val gridAligned = tieBreak.foldLeft(grid) { (df, c) =>
      df.withColumn(c, lit(null).cast(pts.schema(pts.schema.fieldIndex(c)).dataType))
    }

    // __kind dominates the tie-break columns, so grid rows (all-null ties)
    // sort after every change row of the same day.
    val order = (Seq(col(dayCol), col("__kind")) ++ tieBreak.map(col)).map(_.asc)
    val w = Window
      .partitionBy(col(idCol))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    pts.unionByName(gridAligned)
      .withColumn("__filled", last(col(valueCol), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1 && col("__filled").isNotNull)
      .select(col(idCol), col(dayCol), col("__filled").as(valueCol))
  }
}
