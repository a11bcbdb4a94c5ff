package object graft {
  /** A registered engine query: the Spark plan builder plus (when the
    * semantics are ANSI-SQL-expressible) a DuckDB oracle twin. The driver
    * hash-compares the two on the same parquet inputs (see Verify.scala).
    */
  case class QueryDef(
      fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
      oracle: Option[String])
}
