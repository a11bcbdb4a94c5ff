package graft.queries

import graft.QueryDef
import graft.ops.{Tables, TextAnalysis}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 physical-data-layout family: the planning queries a lakehouse
  * runs ABOUT its own storage before touching 100 TB — zone-map pruning
  * effectiveness (does the current file layout let min/max statistics
  * skip data for the hot predicate?), small-file compaction planning
  * (how many target-size files does each source pack into?), and
  * functional-dependency profiling (which column dependencies hold, i.e.
  * which normalizations / dictionary encodings are safe?).
  *
  * These are first-class at warehouse scale precisely because they are
  * cheap: each is one or two partial-aggregatable groupBys whose output
  * is bounded by the FILE/KEY domain, not the row count — the reports
  * that decide whether the next 1000-executor scan reads 1% or 100% of
  * the table.
  */
object LayoutQueries {

  private def r6(c: Column): Column = TextAnalysis.round6(c)

  // --- zone-map pruning effectiveness --------------------------------------

  /** Zone-map (per-file min/max) pruning simulation for the hot predicate
    * `l_shipdate in March 1998` under two layouts: INSERT ORDER (files
    * cover l_orderkey ranges — min/max shipdate per file spans almost the
    * whole calendar, so nothing prunes) vs DATE PARTITIONED (files cover
    * ship months — the predicate prunes to one file). Reports, per
    * layout: file counts before/after pruning, rows read vs rows actually
    * matching, and the scan amplification factor — the number that says
    * whether a sort/partition rewrite pays for itself.
    *
    * Scale shape: one groupBy(file) per layout over lineitem (both
    * partial-aggregatable), then single-row reductions over the bounded
    * file domain. The simulation IS the planning math a real zone map
    * performs; no row is ever re-read.
    */
  private val zoneMapPrune = QueryDef(
    fn = (spark, dir) => {
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
      val lo = lit("1998-03-01").cast("date")
      val hi = lit("1998-03-31").cast("date")
      def report(layout: String, fileCol: Column) = li
        .withColumn("f", fileCol)
        .groupBy(col("f"))
        .agg(count(lit(1)).as("rows"), min(col("sd")).as("mn"),
          max(col("sd")).as("mx"),
          sum(when(col("sd").between(lo, hi), 1L).otherwise(0L)).as("mt"))
        .agg(count(lit(1)).as("files_total"),
          sum(when(col("mn") <= hi && col("mx") >= lo, 1L).otherwise(0L))
            .as("files_scanned"),
          sum(col("rows")).as("rows_total"),
          sum(when(col("mn") <= hi && col("mx") >= lo, col("rows"))
            .otherwise(0L)).as("rows_scanned"),
          sum(col("mt")).as("rows_matching"))
        .select(lit(layout).as("layout"), col("files_total"),
          col("files_scanned"), col("rows_total"), col("rows_scanned"),
          col("rows_matching"),
          r6(col("rows_scanned").cast("double")
            / col("rows_matching").cast("double")).as("scan_amplification"),
          r6(lit(1.0) - col("files_scanned").cast("double")
            / col("files_total").cast("double")).as("prune_ratio"))
      report("insert_order", floor(col("l_orderkey") / 256.0).cast("long"))
        .unionAll(report("date_partitioned",
          (year(col("sd")) * 12 + month(col("sd"))).cast("long")))
        .orderBy(col("layout"))
    },
    oracle = Some {
      def rep(layout: String, fileExpr: String) =
        s"""SELECT '$layout' AS layout, COUNT(*) AS files_total,
           |    SUM(CASE WHEN mn <= DATE '1998-03-31' AND mx >= DATE '1998-03-01'
           |      THEN 1 ELSE 0 END) AS files_scanned,
           |    SUM(rows) AS rows_total,
           |    SUM(CASE WHEN mn <= DATE '1998-03-31' AND mx >= DATE '1998-03-01'
           |      THEN rows ELSE 0 END) AS rows_scanned,
           |    SUM(mt) AS rows_matching
           |  FROM (SELECT $fileExpr AS f, COUNT(*) AS rows,
           |      MIN(sd) AS mn, MAX(sd) AS mx,
           |      SUM(CASE WHEN sd BETWEEN DATE '1998-03-01' AND DATE '1998-03-31'
           |        THEN 1 ELSE 0 END) AS mt
           |    FROM b GROUP BY 1) g""".stripMargin
      s"""WITH b AS (SELECT l_orderkey, CAST(l_shipdate AS DATE) AS sd
         |  FROM lineitem),
         |u AS (${rep("insert_order", "CAST(floor(l_orderkey / 256.0) AS BIGINT)")}
         |UNION ALL
         |${rep("date_partitioned",
            "CAST(year(sd) * 12 + month(sd) AS BIGINT)")})
         |SELECT layout, files_total,
         |  CAST(files_scanned AS BIGINT) AS files_scanned,
         |  CAST(rows_total AS BIGINT) AS rows_total,
         |  CAST(rows_scanned AS BIGINT) AS rows_scanned,
         |  CAST(rows_matching AS BIGINT) AS rows_matching,
         |  floor(CAST(rows_scanned AS DOUBLE) / CAST(rows_matching AS DOUBLE)
         |    * 1000000.0 + 0.5) / 1000000.0 AS scan_amplification,
         |  floor((1.0 - CAST(files_scanned AS DOUBLE)
         |      / CAST(files_total AS DOUBLE))
         |    * 1000000.0 + 0.5) / 1000000.0 AS prune_ratio
         |FROM u ORDER BY layout""".stripMargin
    })

  // --- compaction planning -------------------------------------------------

  /** Small-file compaction plan: pack each source's documents (in stable
    * doc_id order) into target-size output files by cumulative size —
    * bin = floor(bytes_before / target), the streaming first-fit that a
    * compaction job executes without ever holding more than a running
    * sum. Reports per source: document and bin counts, total bytes, the
    * largest produced bin (a document straddling a boundary lands in its
    * floor bin, so bins can exceed the target by at most one document),
    * and the mean fill factor.
    *
    * Scale shape: one cumulative-sum window PARTITIONED by source (the
    * same per-key running pattern as q_inventory_balance — parallel
    * across sources), two grouped reductions. Target is 2048 chars so
    * the plan is non-trivial at every test SF.
    */
  private val compactionPlan = QueryDef(
    fn = (spark, dir) => {
      val target = 2048L
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val binned = Tables.documents(spark, dir)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("cb", coalesce(sum(col("n_chars")).over(w), lit(0L)))
        .withColumn("bin", expr(s"cb div $target"))
      val perBin = binned.groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("bytes"))
      perBin.groupBy(col("source"))
        .agg(sum(col("docs")).as("n_docs"), count(lit(1)).as("n_bins"),
          sum(col("bytes")).as("total_chars"),
          max(col("bytes")).as("max_bin_chars"),
          sum(when(col("bytes") > target, 1L).otherwise(0L))
            .as("overfull_bins"))
        .select(col("source"), col("n_docs"), col("n_bins"),
          col("total_chars"), col("max_bin_chars"), col("overfull_bins"),
          r6(col("total_chars").cast("double")
            / (col("n_bins") * target).cast("double")).as("avg_fill"))
        .orderBy(col("source"))
    },
    oracle = Some(
      """WITH b AS (SELECT source, doc_id, n_chars,
        |    COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM documents),
        |pb AS (SELECT source, cb // 2048 AS bin, COUNT(*) AS docs,
        |    SUM(n_chars) AS bytes
        |  FROM b GROUP BY 1, 2),
        |s AS (SELECT source, SUM(docs) AS n_docs, COUNT(*) AS n_bins,
        |    SUM(bytes) AS total_chars, MAX(bytes) AS max_bin_chars,
        |    SUM(CASE WHEN bytes > 2048 THEN 1 ELSE 0 END) AS overfull_bins
        |  FROM pb GROUP BY 1)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_bins,
        |  CAST(total_chars AS BIGINT) AS total_chars,
        |  CAST(max_bin_chars AS BIGINT) AS max_bin_chars,
        |  CAST(overfull_bins AS BIGINT) AS overfull_bins,
        |  floor(CAST(total_chars AS DOUBLE) / CAST(n_bins * 2048 AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS avg_fill
        |FROM s ORDER BY source""".stripMargin))

  // --- functional-dependency profile ---------------------------------------

  /** Functional-dependency profile over the part dimension: for each
    * candidate dependency lhs → rhs, does every lhs value map to exactly
    * one rhs value, and if not, how many keys and rows violate it (rows
    * outside their key's majority rhs — the count a repair would touch)?
    * The report that decides which dictionary encodings, normalizations,
    * and PK candidates are safe before a 100 TB rewrite bakes them in.
    *
    * Scale shape: per dependency, one groupBy(lhs, rhs) then a
    * key-domain reduction — all partial-aggregatable, output bounded by
    * the dependency list. p_partkey → p_name doubles as a
    * uniqueness/PK check (it holds iff p_partkey is unique per name
    * mapping).
    */
  private val fdProfile = QueryDef(
    fn = (spark, dir) => {
      val part = Tables.part(spark, dir)
      val deps = Seq(
        ("p_partkey", "p_name"), ("p_brand", "p_type"),
        ("p_type", "p_brand"), ("p_brand", "p_size"),
        ("p_name", "p_brand"))
      deps.map { case (lhs, rhs) =>
        part.groupBy(col(lhs).cast("string").as("l"),
            col(rhs).cast("string").as("r"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("l"))
          .agg(sum(col("c")).as("kr"), max(col("c")).as("mc"),
            count(lit(1)).as("dr"))
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("dr") > 1, 1L).otherwise(0L)).as("viol_keys"),
            sum(col("kr") - col("mc")).as("viol_rows"))
          .select(lit(s"$lhs->$rhs").as("dep"), col("n_keys"),
            col("viol_keys"), col("viol_rows"),
            (col("viol_keys") === 0L).as("holds"))
      }.reduce(_ unionAll _).orderBy(col("dep"))
    },
    oracle = Some {
      val deps = Seq(
        ("p_partkey", "p_name"), ("p_brand", "p_type"),
        ("p_type", "p_brand"), ("p_brand", "p_size"),
        ("p_name", "p_brand"))
      deps.map { case (lhs, rhs) =>
        s"""SELECT '$lhs->$rhs' AS dep, COUNT(*) AS n_keys,
           |    CAST(SUM(CASE WHEN dr > 1 THEN 1 ELSE 0 END) AS BIGINT) AS viol_keys,
           |    CAST(SUM(kr - mc) AS BIGINT) AS viol_rows,
           |    SUM(CASE WHEN dr > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |  FROM (SELECT l, SUM(c) AS kr, MAX(c) AS mc, COUNT(*) AS dr
           |    FROM (SELECT CAST($lhs AS VARCHAR) AS l,
           |        CAST($rhs AS VARCHAR) AS r, COUNT(*) AS c
           |      FROM part GROUP BY 1, 2) g GROUP BY 1) k"""
          .stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) u ORDER BY dep")
    })

  /** Dictionary-encoding advisor over the part dimension's string
    * columns: per column — row/distinct counts, the top-1 value share,
    * raw byte cost (Σ value lengths), the dictionary cost (Σ DISTINCT
    * value lengths + ⌈rows·code_bits/8⌉ for fixed-width codes,
    * code_bits = ⌈log₂ distinct⌉), the savings ratio, and the
    * dict-wins verdict — the per-column decision a columnar writer makes
    * before a 100 TB rewrite bakes an encoding in (the fd-profile's
    * sibling: THAT says which dependencies make encodings safe, this
    * says which ones pay).
    *
    * Exactness: everything is exact integer arithmetic except
    * ⌈log₂ n⌉, whose ln-ratio is 9dp-rounded before the ceil (the house
    * transcendental discipline — a power-of-two boundary cannot flip on
    * libm noise). Scale shape: per column, ONE value-domain
    * aggregation (partial-aggregatable; the shuffle carries distinct
    * values, not rows) then a single-row reduction; the report is
    * columns-sized.
    */
  private val dictEncoding = QueryDef(
    fn = (spark, dir) => {
      val part = Tables.part(spark, dir)
      def report(c: String) = part
        .select(col(c).cast("string").as("v"))
        .filter(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_distinct"),
          max(col("n")).as("top1"),
          sum(length(col("v")).cast("long") * col("n")).as("raw_chars"),
          sum(length(col("v")).cast("long")).as("dict_chars"))
        .withColumn("code_bits",
          greatest(ceil(floor((log(col("n_distinct").cast("double"))
            / math.log(2.0)) * 1e9 + 0.5) / 1e9).cast("long"), lit(1L)))
        .withColumn("dict_bytes",
          col("dict_chars")
            + ceil(col("n_rows").cast("double") * col("code_bits") / 8.0)
              .cast("long"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_distinct"),
          r6(col("top1").cast("double") / col("n_rows").cast("double"))
            .as("top1_share"),
          col("raw_chars"), col("code_bits"), col("dict_bytes"),
          r6(lit(1.0) - col("dict_bytes").cast("double")
            / col("raw_chars").cast("double")).as("savings"),
          (col("dict_bytes") < col("raw_chars")).as("dict_wins"))
      Seq("p_brand", "p_name", "p_type").map(report).reduce(_ unionAll _)
        .orderBy("column_name")
    },
    oracle = Some {
      def rep(c: String) =
        s"""SELECT '$c' AS column_name, CAST(n_rows AS BIGINT) AS n_rows,
           |  n_distinct,
           |  floor(CAST(top1 AS DOUBLE) / CAST(n_rows AS DOUBLE)
           |    * 1000000.0 + 0.5) / 1000000.0 AS top1_share,
           |  CAST(raw_chars AS BIGINT) AS raw_chars,
           |  code_bits,
           |  CAST(dict_chars + CAST(ceil(CAST(n_rows AS DOUBLE) * code_bits / 8.0)
           |    AS BIGINT) AS BIGINT) AS dict_bytes,
           |  floor((1.0 - CAST(dict_chars + CAST(ceil(CAST(n_rows AS DOUBLE)
           |        * code_bits / 8.0) AS BIGINT) AS DOUBLE)
           |      / CAST(raw_chars AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
           |    AS savings,
           |  dict_chars + CAST(ceil(CAST(n_rows AS DOUBLE) * code_bits / 8.0)
           |    AS BIGINT) < raw_chars AS dict_wins
           |FROM (
           |  SELECT SUM(n) AS n_rows, COUNT(*) AS n_distinct, MAX(n) AS top1,
           |    SUM(CAST(len(v) AS BIGINT) * n) AS raw_chars,
           |    SUM(CAST(len(v) AS BIGINT)) AS dict_chars,
           |    GREATEST(CAST(ceil(floor(ln(COUNT(*)) / ln(2)
           |      * 1000000000.0 + 0.5) / 1000000000.0) AS BIGINT), 1) AS code_bits
           |  FROM (SELECT CAST($c AS VARCHAR) AS v, COUNT(*) AS n
           |        FROM part WHERE $c IS NOT NULL GROUP BY 1))""".stripMargin
      Seq("p_brand", "p_name", "p_type").map(rep)
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) u ORDER BY column_name")
    })

  val defs: Map[String, QueryDef] = Map(
    "q_zone_map_prune" -> zoneMapPrune,
    "q_compaction_plan" -> compactionPlan,
    "q_dict_encoding" -> dictEncoding,
    "q_fd_profile" -> fdProfile)
}
