package graft

/** Properties of the physical-data-layout family (LayoutQueries): each
  * report is replayed sequentially on the driver from raw rows, and the
  * layout-specific invariants (pruning soundness, packing bounds,
  * dependency arithmetic) are asserted directly.
  */
class LayoutQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_zone_map_prune: pruning is sound and the date layout prunes harder") {
    val rows = run("q_zone_map_prune").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("insert_order", "date_partitioned"))
    val li = graft.ops.Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS sd").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val lo = java.time.LocalDate.of(1998, 3, 1)
    val hi = java.time.LocalDate.of(1998, 3, 31)
    def inPred(d: java.time.LocalDate) = !d.isBefore(lo) && !d.isAfter(hi)
    for ((layout, fileOf) <- Seq[(String, ((Long, java.time.LocalDate)) => Long)](
      ("insert_order", t => t._1 / 256),
      ("date_partitioned", t => t._2.getYear.toLong * 12 + t._2.getMonthValue))) {
      val files = li.groupBy(fileOf)
      val scanned = files.filter { case (_, rs) =>
        val ds = rs.map(_._2)
        !ds.max.isBefore(lo) && !ds.min.isAfter(hi)
      }
      val r = rows(layout)
      assert(r.getAs[Long]("files_total") === files.size.toLong)
      assert(r.getAs[Long]("files_scanned") === scanned.size.toLong)
      assert(r.getAs[Long]("rows_scanned") ===
        scanned.values.map(_.length.toLong).sum)
      assert(r.getAs[Long]("rows_matching") === li.count(t => inPred(t._2)).toLong)
      // soundness: every matching row lives in a scanned file
      val matchingInScanned = scanned.values.flatten.count(t => inPred(t._2))
      assert(matchingInScanned.toLong === r.getAs[Long]("rows_matching"))
    }
    // the whole point of the rewrite: date layout reads (far) fewer rows
    assert(rows("date_partitioned").getAs[Long]("rows_scanned") <
      rows("insert_order").getAs[Long]("rows_scanned"))
  }

  test("q_compaction_plan matches the sequential streaming-fill replay") {
    val target = 2048L
    val got = run("q_compaction_plan").collect()
      .map(r => r.getString(0) -> r).toMap
    val docs = graft.ops.Tables.documents(spark, dir)
      .selectExpr("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.keySet === docs.map(_._1).toSet)
    for ((src, ds) <- docs.groupBy(_._1)) {
      val ordered = ds.sortBy(_._2)
      var cum = 0L
      val bins = scala.collection.mutable.Map.empty[Long, Long]
      for ((_, _, n) <- ordered) {
        val b = cum / target
        bins(b) = bins.getOrElse(b, 0L) + n
        cum += n
      }
      val r = got(src)
      assert(r.getAs[Long]("n_docs") === ordered.length.toLong)
      assert(r.getAs[Long]("n_bins") === bins.size.toLong)
      assert(r.getAs[Long]("total_chars") === ordered.map(_._3).sum)
      assert(r.getAs[Long]("max_bin_chars") === bins.values.max)
      // packing bound: a bin exceeds target by at most one document
      val maxDoc = ordered.map(_._3).max
      assert(bins.values.forall(_ <= target + maxDoc))
      assert(r.getAs[Long]("overfull_bins") ===
        bins.values.count(_ > target).toLong)
    }
  }

  test("q_fd_profile matches the driver dependency replay; PK dep holds") {
    val got = run("q_fd_profile").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("viol_keys"),
          r.getAs[Long]("viol_rows"), r.getAs[Boolean]("holds"))).toMap
    val part = graft.ops.Tables.part(spark, dir)
      .selectExpr("CAST(p_partkey AS STRING)", "p_name", "p_brand", "p_type",
        "CAST(p_size AS STRING)").collect()
      .map(r => Map("p_partkey" -> r.getString(0), "p_name" -> r.getString(1),
        "p_brand" -> r.getString(2), "p_type" -> r.getString(3),
        "p_size" -> r.getString(4)))
    for ((lhs, rhs) <- Seq(("p_partkey", "p_name"), ("p_brand", "p_type"),
      ("p_type", "p_brand"), ("p_brand", "p_size"), ("p_name", "p_brand"))) {
      val byKey = part.groupBy(_(lhs))
      val violKeys = byKey.count(_._2.map(_(rhs)).distinct.size > 1)
      val violRows = byKey.values.map { rs =>
        rs.size - rs.groupBy(_(rhs)).values.map(_.size).max
      }.sum
      val (nk, vk, vr, holds) = got(s"$lhs->$rhs")
      assert(nk === byKey.size.toLong)
      assert(vk === violKeys.toLong)
      assert(vr === violRows.toLong)
      assert(holds === (violKeys == 0))
    }
    // p_partkey is the PK: its dependency must hold exactly
    assert(got("p_partkey->p_name")._4)
  }

  test("q_dict_encoding matches the driver cost replay; low-cardinality column wins") {
    val got = run("q_dict_encoding").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("p_brand", "p_name", "p_type"))
    val part = graft.ops.Tables.part(spark, dir)
      .selectExpr("p_brand", "p_name", "p_type").collect()
    for ((c, i) <- Seq(("p_brand", 0), ("p_name", 1), ("p_type", 2))) {
      val vs = part.map(_.getString(i)).filter(_ != null)
      val counts = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nd = counts.size.toLong
      val bits = math.max(1L,
        math.ceil(math.floor(math.log(nd.toDouble) / math.log(2.0) * 1e9 + 0.5) / 1e9).toLong)
      // keysIterator: a Set's .map would collapse equal LENGTHS
      val dictBytes = counts.keysIterator.map(_.length.toLong).sum +
        math.ceil(vs.length.toDouble * bits / 8.0).toLong
      val r = got(c)
      assert(r.getAs[Long]("n_rows") === vs.length.toLong)
      assert(r.getAs[Long]("n_distinct") === nd)
      assert(r.getAs[Long]("code_bits") === bits)
      assert(r.getAs[Long]("dict_bytes") === dictBytes)
      assert(r.getAs[Long]("raw_chars") === vs.map(_.length.toLong).sum)
      assert(r.getAs[Boolean]("dict_wins") ===
        (dictBytes < vs.map(_.length.toLong).sum))
    }
    // the advisory point: the 25-value p_brand column always compresses
    assert(got("p_brand").getAs[Boolean]("dict_wins"))
    // p_brand saves a larger fraction than the near-unique name column
    assert(got("p_brand").getAs[Double]("savings") >
      got("p_name").getAs[Double]("savings"))
  }
}
