package graft.engine

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelineSpec extends SparkSpec {

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  test("full platform pass: governance + normalization + gold query") {
    val bronze = tmp("plat-bronze-")
    val wh = tmp("plat-wh-")
    val silver = tmp("plat-silver-")
    val r7dir = Files.createDirectory(bronze.resolve("rapid7.assets.raw"))
    val fgdir = Files.createDirectory(bronze.resolve("fortisiem.devices.raw"))
    Fixtures.rapid7Records.zipWithIndex.foreach { case (doc, i) =>
      Files.writeString(r7dir.resolve(s"a$i.json"), doc)
    }
    Fixtures.fortisiemRecords.zipWithIndex.foreach { case (doc, i) =>
      Files.writeString(fgdir.resolve(s"d$i.json"), doc)
    }
    val result = Pipeline.runOnce(spark, bronze.toString, wh.toString,
      Seq(
        Pipeline.Source(SourceSpec.rapid7, r7dir.toString,
          tmp("ck-r7-").toString),
        Pipeline.Source(SourceSpec.fortisiem, fgdir.toString,
          tmp("ck-fg-").toString)),
      new ParquetTableStore(silver.toString))

    // governance produced a schema per topic
    assert(result.governance.count(_.isInstanceOf[SchemaRegistry.Updated]) == 2)
    val reg = new SchemaRegistry(spark, bronze.toString, wh.toString)
    assert(reg.readSchema("rapid7.assets.raw").get.fieldNames.contains("hostName"))

    // silver holds both sources, corrupt rows dropped
    assert(result.silver.count() == 6) // 4 r7 + 2 forti good records
    // gold query over silver: latest-version dedup by asset_uid
    val gold = result.silver
      .groupBy("asset_uid")
      .agg(count(lit(1)).as("versions"))
    assert(gold.count() == 5) // uid collapses the case-variant duplicate
  }
}
