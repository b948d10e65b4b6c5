package graft.ops

import graft.SparkSpec

/** q78 end-to-end: the registered query's scan must list ONLY the data
  * dirs the manifest stats keep — the 1992-1993 and 1994-1995 batches are
  * provably disjoint from the `>= 1996-06-01` predicate, so their files
  * never reach the file index (value correctness is the DuckDB oracle's
  * job; this pins the data-skipping behavior the query exists to ship).
  */
class StoreOpsSpec extends SparkSpec {

  test("q78's readWhere prunes the year-ranged batch dirs the predicate " +
      "cannot match") {
    val df = graft.SparkEntry.queries("q78_store_readwhere")(
      spark, "/root/testdata/sf0.001")
    val files = df.inputFiles
    assert(files.nonEmpty, "scan lists no files")
    assert(files.forall(f =>
        f.contains("/batch-2-") || f.contains("/batch-3-")),
      s"pruned dirs leaked into the scan:\n${files.mkString("\n")}")
    assert(files.exists(_.contains("/batch-2-")) &&
      files.exists(_.contains("/batch-3-")),
      s"expected both kept dirs in the scan:\n${files.mkString("\n")}")
    assert(df.count() > 0)
  }

  test("q86's time-travel read serves version 2 from the first two " +
      "batch dirs only") {
    val df = graft.SparkEntry.queries("q86_store_timetravel")(
      spark, "/root/testdata/sf0.001")
    val files = df.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(f =>
        f.contains("/batch-0-") || f.contains("/batch-1-")),
      s"version 2 leaked later batches:\n${files.mkString("\n")}")
  }

  test("q93's clustered rewrite restores dir-level skipping the " +
      "interleaved batches cannot give") {
    val df = graft.SparkEntry.queries("q93_store_clustered")(
      spark, "/root/testdata/sf0.001")
    val files = df.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains("/__cluster=")),
      s"non-clustered dir in scan:\n${files.mkString("\n")}")
    val dirs = files.map(_.replaceAll("/[^/]+$", "")).distinct
    assert(dirs.length < 4,
      s"predicate pruned nothing — all $dirs served the scan")
  }

  test("q116's incremental MV equals the full recompute, and the delta " +
      "aggregate scans only the two new batch dirs") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val dir = "/root/testdata/sf0.001"
    val mvOut = graft.SparkEntry.queries("q116_incremental_mv")(spark, dir)
      .collect().map(_.toSeq).toSeq
    // full recompute straight off the base table — the MV's decimal
    // partial fold is exactly associative, so equality is bit-for-bit
    val t = sum(col("o_totalprice").cast(DecimalType(18, 2)))
      .cast(DecimalType(28, 2))
    val full = graft.engine.Tables(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), t.as("t"))
      .select(col("o_orderpriority"), col("n_orders"),
        col("t").cast("double").as("total"),
        (col("t").cast("double") / col("n_orders")).as("avg_price"))
      .orderBy("o_orderpriority")
      .collect().map(_.toSeq).toSeq
    assert(mvOut == full)
    // the refresh's input: ONLY the dirs holding the new batch ids —
    // the base table's earlier dirs never reach the delta scan
    val base = new graft.engine.ManifestTableStore(
      graft.engine.Materialize.keyedPath(spark, "orders_store", dir))
    val files = base.readChanges(spark, 2, 4).inputFiles
    assert(files.nonEmpty)
    assert(files.forall(f =>
        f.contains("/batch-2-") || f.contains("/batch-3-")),
      s"delta scan read pre-existing dirs:\n${files.mkString("\n")}")
  }

  test("q117's bloom-pruned point lookup opens exactly one batch dir " +
      "(min/max ranges all overlap the key)") {
    val df = graft.SparkEntry.queries("q117_store_pointlookup")(
      spark, "/root/testdata/sf0.001")
    val files = df.inputFiles
    assert(files.nonEmpty)
    val dirs = files.map(_.replaceAll("/[^/]+$", "")).distinct
    assert(dirs.length == 1,
      s"bloom pruning left more than one dir in the scan:\n$dirs")
    assert(df.count() == 1L)
  }

  test("q87's post-compaction scan reads exactly one data dir") {
    val df = graft.SparkEntry.queries("q87_store_compact")(
      spark, "/root/testdata/sf0.001")
    val files = df.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains("/compact-")),
      s"non-compacted dir in scan:\n${files.mkString("\n")}")
    assert(files.map(_.replaceAll("/[^/]+$", "")).distinct.length == 1,
      "more than one data dir after compaction")
  }
}
