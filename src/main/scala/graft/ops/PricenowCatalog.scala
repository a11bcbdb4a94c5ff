package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product-catalog ingest: nested-JSON flatten + filter + duration parse.
  * Reproduces the reference's `make_pricenow_products_df`
  * (`scripts/pricenow_etl.py:287-326`): double UNNEST of
  * `data[].productDefinitions[]` (T1), struct projection of
  * `attributes.age.value` / `attributes.duration.value` (T2), the
  * `small_child` filter (T3, ref :322), and the `'4h'->1` / `'13d'->13`
  * duration parse (T5, ref :315-318). The envelope normalizer accepts
  * `data`/`items`/`results` wrappers or a bare JSON array (S5, ref :153-161).
  *
  * Spark-first: `from_json` with an explicit nested StructType + two
  * `explode`s — all built-in Generators/expressions, fully codegen'd, no UDF.
  */
object PricenowCatalog {

  val productDefSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("attributes", StructType(Seq(
      StructField("age", StructType(Seq(StructField("value", StringType)))),
      StructField("duration", StructType(Seq(StructField("value", StringType)))))))))

  val productSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("productDefinitions", ArrayType(productDefSchema))))

  private val envelopeSchema = StructType(
    Seq("data", "items", "results").map(k => StructField(k, ArrayType(productSchema))))

  /** S5: accept `{data|items|results: [...]}` or a bare top-level array. */
  def normalizeEnvelope(json: Column): Column = {
    val env = from_json(json, envelopeSchema)
    coalesce(
      env.getField("data"),
      env.getField("items"),
      env.getField("results"),
      from_json(json, ArrayType(productSchema)))
  }

  /** T5 (ref :315-318): '4h' -> 1 day; else strip 'd' and cast int. */
  def durationDays(duration: Column): Column =
    when(duration === "4h", lit(1))
      .otherwise(regexp_replace(duration, "d", "").cast(IntegerType))

  /** Full catalog flatten over a DataFrame with one JSON-string column. */
  def flatten(raw: DataFrame, jsonCol: String): DataFrame =
    raw
      .select(explode(normalizeEnvelope(col(jsonCol))).as("p"))
      .select(col("p.name").as("category"), explode(col("p.productDefinitions")).as("pd"))
      .select(
        col("pd.id").as("product_id"),
        col("category"),
        col("pd.attributes.age.value").as("age"),
        col("pd.attributes.duration.value").as("duration"))
      .filter(!(col("age") <=> "small_child")) // null-safe: ref :322 keeps null ages
      .withColumn("duration_days", durationDays(col("duration")))
}
