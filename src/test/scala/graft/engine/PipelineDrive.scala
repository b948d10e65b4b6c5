package graft.engine

import java.nio.file.Files

/** Manual end-to-end drive of the composed platform path.
  * Run: `sbt "Test/runMain graft.engine.PipelineDrive"`.
  */
object PipelineDrive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4, "pipeline-drive")
    val bronze = Files.createTempDirectory("drive-bronze-")
    val r7 = Files.createDirectory(bronze.resolve("rapid7.assets.raw"))
    val fg = Files.createDirectory(bronze.resolve("fortisiem.devices.raw"))
    Fixtures.rapid7Records.zipWithIndex.foreach { case (d, i) =>
      Files.writeString(r7.resolve(s"a$i.json"), d) }
    Fixtures.fortisiemRecords.zipWithIndex.foreach { case (d, i) =>
      Files.writeString(fg.resolve(s"d$i.json"), d) }
    val result = Pipeline.runOnce(spark, bronze.toString,
      Files.createTempDirectory("drive-wh-").toString,
      Seq(
        Pipeline.Source(SourceSpec.rapid7, r7.toString,
          Files.createTempDirectory("ck1-").toString),
        Pipeline.Source(SourceSpec.fortisiem, fg.toString,
          Files.createTempDirectory("ck2-").toString)),
      new ParquetTableStore(
        Files.createTempDirectory("drive-silver-").toString))
    result.governance.foreach(o => println(s"DRIVE governance $o"))
    println(s"DRIVE silver_rows=${result.silver.count()}")
    result.silver.groupBy("source_system").count().show()
    spark.stop()
  }
}
