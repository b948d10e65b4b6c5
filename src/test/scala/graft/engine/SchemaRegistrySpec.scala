package graft.engine

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Path}
import java.time.Instant

import graft.SparkSpec
import graft.engine.SchemaRegistry._

class SchemaRegistrySpec extends SparkSpec {

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit(); p
  }

  private def writeFile(dir: Path, name: String, content: String,
      mtime: Long): Unit = {
    val f = dir.resolve(name)
    Files.writeString(f, content)
    Files.setLastModifiedTime(f, FileTime.fromMillis(mtime))
  }

  private def registry(bronze: Path, warehouse: Path) =
    new SchemaRegistry(spark, bronze.toString, warehouse.toString,
      Config(multiLine = false, samplingRatio = 1.0),
      now = () => Instant.parse("2026-01-01T00:00:00Z"))

  test("state JSON round-trips with sorted keys") {
    val s = TopicState("t1", lastProcessedMtime = 42L,
      sampleFiles = Seq("a", "b"), schemaHash = Some("h"),
      schemaChanged = Some(true), failureReason = None)
    val json = stateToJson(s)
    assert(json.indexOf("\"last_processed_mtime\"") <
      json.indexOf("\"sample_files\""), "keys must be sorted")
    assert(stateFromJson(json) == s)
  }

  test("initial run infers schema, writes schema + state, reports Updated") {
    val bronze = tmp("bronze-"); val wh = tmp("wh-")
    val topic = Files.createDirectory(bronze.resolve("events.raw"))
    writeFile(topic, "a.json", """{"x": 1, "y": "s"}""", 1000L)
    writeFile(topic, "_hidden.json", """{"z": 1}""", 2000L) // must be ignored
    val reg = registry(bronze, wh)
    val out = reg.runOnce()
    assert(out == Seq(Updated("events.raw",
      out.head.asInstanceOf[Updated].schemaHash)))
    val schema = reg.readSchema("events.raw").get
    assert(schema.fieldNames.sorted.toSeq == Seq("x", "y"),
      "hidden files must not contribute fields; corrupt col dropped")
    val st = reg.readState("events.raw")
    assert(st.lastProcessedMtime == 1000L)
    assert(st.schemaChanged.contains(true))
    assert(st.sampleFileCount.contains(1))
    assert(st.failureReason.isEmpty)
  }

  test("unchanged rerun is skipped via the mtime watermark") {
    val bronze = tmp("bronze-"); val wh = tmp("wh-")
    val topic = Files.createDirectory(bronze.resolve("t"))
    writeFile(topic, "a.json", """{"x": 1}""", 1000L)
    val reg = registry(bronze, wh)
    reg.runOnce()
    assert(reg.runOnce() == Seq(Skipped("t", "no new files since last run")))
  }

  test("drift: new field in a newer file rewrites schema and links hashes") {
    val bronze = tmp("bronze-"); val wh = tmp("wh-")
    val topic = Files.createDirectory(bronze.resolve("t"))
    writeFile(topic, "a.json", """{"x": 1}""", 1000L)
    val reg = registry(bronze, wh)
    reg.runOnce()
    val h1 = reg.readState("t").schemaHash.get
    writeFile(topic, "b.json", """{"x": 2, "extra": "new"}""", 2000L)
    val out = reg.runOnce()
    assert(out.head.isInstanceOf[Updated])
    val st = reg.readState("t")
    assert(st.schemaHash.get != h1)
    assert(st.previousSchemaHash.contains(h1))
    assert(st.schemaChanged.contains(true))
    assert(st.lastProcessedMtime == 2000L)
    assert(reg.readSchema("t").get.fieldNames.contains("extra"))
  }

  test("same-schema new file refreshes state without rewrite (Unchanged)") {
    val bronze = tmp("bronze-"); val wh = tmp("wh-")
    val topic = Files.createDirectory(bronze.resolve("t"))
    writeFile(topic, "a.json", """{"x": 1}""", 1000L)
    val reg = registry(bronze, wh)
    reg.runOnce()
    writeFile(topic, "b.json", """{"x": 5}""", 2000L)
    val out = reg.runOnce()
    assert(out.head.isInstanceOf[Unchanged])
    val st = reg.readState("t")
    assert(st.schemaChanged.contains(false))
    assert(st.lastProcessedMtime == 2000L)
  }

  test("failure path preserves prior progress and records the reason") {
    val bronze = tmp("bronze-"); val wh = tmp("wh-")
    val topic = Files.createDirectory(bronze.resolve("t"))
    writeFile(topic, "a.json", """{"x": 1}""", 1000L)
    val reg = registry(bronze, wh)
    reg.runOnce()
    val before = reg.readState("t")
    // a newer file whose records are ALL unreadable → every field null-type
    // is still a schema… force failure instead with an empty-schema batch:
    writeFile(topic, "b.json", "", 2000L)
    writeFile(topic, "c.json", "", 2001L)
    // registry with maxFiles=2 samples only the two newest (empty) files
    val reg2 = new SchemaRegistry(spark, bronze.toString, wh.toString,
      Config(multiLine = false, samplingRatio = 1.0, maxFilesForInference = 2),
      now = () => Instant.parse("2026-01-02T00:00:00Z"))
    val out = reg2.runOnce()
    assert(out.head.isInstanceOf[Failed])
    val st = reg2.readState("t")
    assert(st.lastProcessedMtime == before.lastProcessedMtime,
      "failure must not advance the watermark")
    assert(st.schemaHash == before.schemaHash)
    assert(st.failureReason.exists(_.contains("empty schema")))
    assert(st.lastAttemptTs.contains("2026-01-02T00:00:00Z"))
    assert(st.lastSuccessTs == before.lastSuccessTs)
  }

  test("top-N newest sampling bounds inference work") {
    val bronze = tmp("bronze-"); val wh = tmp("wh-")
    val topic = Files.createDirectory(bronze.resolve("t"))
    (1 to 10).foreach(i =>
      writeFile(topic, s"f$i.json", s"""{"x": $i}""", 1000L + i))
    val reg = new SchemaRegistry(spark, bronze.toString, wh.toString,
      Config(multiLine = false, samplingRatio = 1.0, maxFilesForInference = 3),
      now = () => Instant.parse("2026-01-01T00:00:00Z"))
    reg.runOnce()
    val st = reg.readState("t")
    assert(st.sampleFileCount.contains(3))
    assert(st.sampleFiles.forall(p =>
      p.endsWith("f8.json") || p.endsWith("f9.json") || p.endsWith("f10.json")),
      s"should sample the 3 newest, got ${st.sampleFiles}")
  }
}
