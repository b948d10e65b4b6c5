package graft.engine

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamRunnerSpec extends SparkSpec {

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  private def writeFile(dir: Path, name: String, content: String): Unit =
    Files.writeString(dir.resolve(name), content)

  test("streaming bronze→silver: multiLine files, corrupt dropped, appended") {
    val src = tmp("bronze-r7-")
    val ckpt = tmp("ckpt-r7-")
    val out = tmp("silver-")
    Fixtures.rapid7Pretty.zipWithIndex.foreach { case (doc, i) =>
      writeFile(src, s"asset_$i.json", doc)
    }
    val store = new ParquetTableStore(out.toString)
    StreamRunner.runAvailableNow(spark,
      Seq((SourceSpec.rapid7, src.toString, ckpt.toString)), store)
    val silver = store.read(spark)
    // 3 files: 2 good (one pretty multi-line), 1 corrupt → 2 rows
    assert(silver.count() == 2)
    assert(silver.columns.contains("batch_id"))
    val ids = silver.select("rapid7_id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("201", "202"))
    // multiLine=true parsed the pretty-printed nested struct
    assert(silver.filter(col("rapid7_id") === "201").head()
      .getAs[Int]("vuln_total") == 3)
  }

  test("checkpoint resume: old files are not reprocessed, new ones are") {
    val src = tmp("bronze-resume-")
    val ckpt = tmp("ckpt-resume-")
    val out = tmp("silver-resume-")
    writeFile(src, "a.json", """{"id": 1, "ip": "10.0.0.1", "hostName": "h1"}""")
    val store = new ParquetTableStore(out.toString)
    val sources = Seq((SourceSpec.rapid7, src.toString, ckpt.toString))
    StreamRunner.runAvailableNow(spark, sources, store)
    assert(store.read(spark).count() == 1)
    // second run, same checkpoint, nothing new → still 1 row
    StreamRunner.runAvailableNow(spark, sources, store)
    assert(store.read(spark).count() == 1)
    // add a file, rerun → exactly one more row
    writeFile(src, "b.json", """{"id": 2, "ip": "10.0.0.2", "hostName": "h2"}""")
    StreamRunner.runAvailableNow(spark, sources, store)
    val rows = store.read(spark)
    assert(rows.count() == 2)
    assert(rows.select("rapid7_id").collect().map(_.getString(0)).sorted
      .toSeq == Seq("1", "2"))
  }

  test("two concurrent sources append into one silver store") {
    val srcA = tmp("bronze-a-"); val srcB = tmp("bronze-b-")
    val ckptA = tmp("ckpt-a-"); val ckptB = tmp("ckpt-b-")
    val out = tmp("silver-multi-")
    writeFile(srcA, "r7.json",
      """{"id": 9, "ip": "10.9.9.9", "hostName": "r7-host"}""")
    writeFile(srcB, "fg.json",
      """{"_id": {"$oid": "aaa"}, "accessIp": "1.2.3.4", "name": "fg-host"}""")
    val store = new ParquetTableStore(out.toString)
    StreamRunner.runAvailableNow(spark, Seq(
      (SourceSpec.rapid7, srcA.toString, ckptA.toString),
      (SourceSpec.fortisiem, srcB.toString, ckptB.toString)), store)
    val silver = store.read(spark)
    assert(silver.count() == 2)
    assert(silver.select("source_system").distinct().count() == 2)
  }
}
