package graft.engine

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec
import graft.engine.Pin.Pinnable

/** The conf-gated materialization primitive: both modes produce the
  * same data eagerly; `persist` keeps lineage (cluster-recoverable)
  * where `localCheckpoint` truncates it; one conf flips every site.
  */
class PinSpec extends SparkSpec {

  import spark.implicits._

  test("default mode is eager localCheckpoint (lineage truncated)") {
    val d = spark.range(0, 1000).toDF("v").pinned
    // the returned frame reads the materialized RDD, not the lineage
    assert(d.queryExecution.optimizedPlan.toString
      .contains("LogicalRDD"), "localCheckpoint should truncate lineage")
    assert(d.count() == 1000)
  }

  test("persist mode returns identical data, keeps lineage, and is " +
      "already materialized at return") {
    spark.conf.set(Pin.ModeKey, "persist")
    try {
      val d = spark.range(0, 1000).toDF("v").pinned
      assert(d.storageLevel == StorageLevel.MEMORY_AND_DISK)
      assert(!d.queryExecution.optimizedPlan.toString
        .contains("LogicalRDD"), "persist must keep lineage")
      assert(d.count() == 1000)
      d.unpersist()
    } finally spark.conf.unset(Pin.ModeKey)
  }

  test("a pin-using query returns the same result under both modes " +
      "(the conf flips every site at once)") {
    def run(): Set[(Long, Long)] =
      ExactRank.ranked(
        spark.range(0, 500).selectExpr("id % 7 AS x"), "x")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaCheckpoint = run()
    spark.conf.set(Pin.ModeKey, "persist")
    val viaPersist = try run() finally spark.conf.unset(Pin.ModeKey)
    assert(viaCheckpoint == viaPersist)
  }

  test("REAL pin-using oracle pipelines are mode-independent: the " +
      "iterative near-dup clustering and the rank-select histogram " +
      "return identical rows under persist") {
    val dir = "/root/testdata/sf0.001"
    def run(q: String): Seq[String] =
      graft.SparkEntry.queries(q)(spark, dir)
        .collect().map(_.toString).sorted.toSeq
    val queries =
      Seq("q193_length_quality_hist", "q49_neardup_reps")
    val default = queries.map(q => q -> run(q)).toMap
    spark.conf.set(Pin.ModeKey, "persist")
    try queries.foreach { q =>
      assert(run(q) == default(q), s"$q diverged under persist mode")
    } finally spark.conf.unset(Pin.ModeKey)
  }

  test("an unknown mode refuses loudly") {
    spark.conf.set(Pin.ModeKey, "nope")
    try intercept[IllegalArgumentException] {
      spark.range(1).toDF("v").pinned
    } finally spark.conf.unset(Pin.ModeKey)
  }
}
