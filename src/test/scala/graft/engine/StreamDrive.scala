package graft.engine

import java.nio.file.Files

/** Manual end-to-end drive of the streaming bronze→silver path through the
  * public API (bronze JSON files on disk → StreamRunner → silver parquet →
  * read-back). Run: `sbt "Test/runMain graft.engine.StreamDrive"`.
  */
object StreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4, "stream-drive")
    val src = Files.createTempDirectory("drive-bronze-")
    val ckpt = Files.createTempDirectory("drive-ckpt-")
    val out = Files.createTempDirectory("drive-silver-")
    Fixtures.rapid7Pretty.zipWithIndex.foreach { case (doc, i) =>
      Files.writeString(src.resolve(s"asset_$i.json"), doc)
    }
    val store = new ParquetTableStore(out.toString)
    StreamRunner.runAvailableNow(spark,
      Seq((SourceSpec.rapid7, src.toString, ckpt.toString)), store)
    val silver = store.read(spark)
    println(s"DRIVE_ROWS=${silver.count()}")
    silver.select("asset_uid", "source_system", "rapid7_id", "primary_ip",
      "vuln_total", "batch_id").show(10, truncate = false)
    spark.stop()
  }
}
