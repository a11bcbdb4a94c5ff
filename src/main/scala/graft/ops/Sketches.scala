package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distributed probabilistic sketches built from the repo's deterministic
  * md5-fold hashes ([[TextAnalysis.tokenHash32]]), so every bit is
  * engine-portable: the DuckDB oracles replay the identical sketch rather
  * than trusting opaque binary state (contrast with Spark's built-in
  * `count_min_sketch`/`bloom_filter_agg`, whose serialized form no other
  * engine can audit).
  *
  * Scale rationale: both sketches reduce an unbounded key space to a
  * FIXED-size aggregate (depth*width counters, `words` longs) that builds
  * with map-side partial aggregation in one shuffle and then BROADCASTS —
  * the membership/frequency side of a 100 TB pipeline stops being a join
  * against a data-sized table and becomes a tiny hash-side lookup.
  */
object Sketches {

  /** Count-Min Sketch cell coordinates for one item: an array of
    * (d, cell) structs, cell_d = hash("d:" || item) % width. Explode over
    * the item stream and count per (d, cell) to build the sketch; probe
    * with the same cells and take min over d.
    */
  def cmsCells(item: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && width >= 1)
    array((0 until depth).map { d =>
      struct(lit(d).as("d"),
        pmod(TextAnalysis.tokenHash32(concat(lit(s"$d:"), item)), lit(width.toLong))
          .as("cell"))
    }: _*)
  }

  /** DuckDB twin of [[cmsCells]]'s cell for hash row `d` (SQL text).
    * `hash32Sql` must be the caller's md5-fold-to-BIGINT renderer (the
    * shared `dHash32` oracle helper). */
  def cmsCellSql(hash32Sql: String => String, item: String, d: String, width: Int): String =
    s"(${hash32Sql(s"CAST($d AS VARCHAR) || ':' || $item")}) % $width"

  /** Blocked Bloom filter coordinates for one item: an array of
    * (word, mask) structs — k bit positions over `words` 32-bit blocks
    * (32, not 64: DuckDB's checked BIGINT shift rejects `1 << 63`, and a
    * 31-max shift keeps every mask positive in signed 64-bit on both
    * engines), pos_j = hash("bj:" || item) % (words*32). Build: explode +
    * groupBy word + BIT_OR(mask) — a `words`-row table. Probe: an item is
    * a member iff all k of its (word, mask) rows land on words with
    * (bits & mask) != 0. No false negatives by construction.
    */
  def bloomBits(item: Column, k: Int, words: Int): Column = {
    require(k >= 1 && words >= 1)
    val m = words * 32L
    // variable-amount shift: functions.shiftleft only takes a literal
    // amount, so wrap the Catalyst ShiftLeft node directly
    def shl1(amount: Column): Column =
      org.apache.spark.sql.graftbridge.Bridge.column(
        org.apache.spark.sql.catalyst.expressions.ShiftLeft(
          org.apache.spark.sql.catalyst.expressions.Literal(1L),
          org.apache.spark.sql.graftbridge.Bridge.expression(amount)))
    array((0 until k).map { j =>
      val pos = pmod(TextAnalysis.tokenHash32(concat(lit(s"b$j:"), item)), lit(m))
      struct(shiftright(pos, 5).as("word"),
        shl1(pos.bitwiseAND(lit(31L)).cast("int")).as("mask"))
    }: _*)
  }

  /** DuckDB twin of [[bloomBits]]: (word, mask) SQL expression pair for
    * hash row `j`. */
  def bloomBitSql(hash32Sql: String => String, item: String, j: Int, words: Int): (String, String) = {
    val pos = s"((${hash32Sql(s"'b$j:' || $item")}) % ${words * 32L})"
    (s"($pos // 32)", s"(CAST(1 AS BIGINT) << CAST($pos % 32 AS INTEGER))")
  }
}
