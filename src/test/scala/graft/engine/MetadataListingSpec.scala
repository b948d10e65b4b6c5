package graft.engine

import java.nio.file.Files

import graft.SparkSpec

/** SHOW PARTITIONS / DESCRIBE DETAIL at huge partition counts: above
  * the dir-count threshold the recursive listing runs as a distributed
  * job; below it the driver walk is unchanged. Both paths must agree
  * exactly.
  */
class MetadataListingSpec extends SparkSpec {

  import spark.implicits._

  private val Key = ManifestTableStore.DistributedListingThresholdConf

  private def withThreshold[T](n: Int)(body: => T): T = {
    val prev = spark.conf.getOption(Key)
    spark.conf.set(Key, n.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Key, v)
      case None => spark.conf.unset(Key)
    }
  }

  test("the distributed and driver listings agree on partitions, file " +
      "count, and byte size — incl. two-level partitions, clustered " +
      "dirs, and a null partition value") {
    val base = Files.createTempDirectory("mdlist-")
    base.toFile.deleteOnExit()
    val cat = new StoreCatalog(base.toString)
    cat.exec(spark,
      """CREATE TABLE mp (day STRING, region STRING, n INT)
        |USING graft_store PARTITIONED BY (day, region)""".stripMargin)
    // several batches → several data dirs; one null partition value
    cat.exec(spark,
      "INSERT INTO mp VALUES ('d1', 'eu', 1), ('d1', 'us', 2)",
      batchId = Some(0L))
    cat.exec(spark,
      "INSERT INTO mp VALUES ('d2', 'eu', 3), ('d3', 'ap', 4)",
      batchId = Some(1L))
    cat.exec(spark,
      "INSERT INTO mp VALUES ('d3', CAST(NULL AS STRING), 5)",
      batchId = Some(2L))
    // clustered compaction nests __cluster=k ABOVE the partition dirs
    // — the innermost-segments extraction must not be fooled
    cat.store("mp").compactZOrder(spark, Seq("n"), buckets = 2)
    val store = cat.store("mp")
    val (driverParts, driverDetail) = withThreshold(1000) {
      (store.listPartitions(spark),
        store.describeDetail(spark).head())
    }
    val (distParts, distDetail) = withThreshold(0) {
      (store.listPartitions(spark),
        store.describeDetail(spark).head())
    }
    assert(driverParts.nonEmpty && driverParts == distParts,
      s"driver=$driverParts dist=$distParts")
    assert(driverParts.exists(_.contains("__HIVE_DEFAULT_PARTITION__")))
    // numFiles / sizeBytes identical across both paths
    assert(driverDetail.getLong(4) == distDetail.getLong(4) &&
      driverDetail.getLong(4) > 0)
    assert(driverDetail.getLong(5) == distDetail.getLong(5) &&
      driverDetail.getLong(5) > 0)
    // SQL surface unchanged (routes through the same store methods)
    val sqlParts = cat.exec(spark, "SHOW PARTITIONS mp")
      .as[String].collect().toSeq
    assert(sqlParts == driverParts)
  }
}
