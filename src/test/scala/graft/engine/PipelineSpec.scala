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

  test("governed evolution as ONE composed flow (reference README.md:" +
      "27-31): drift re-emits a proposal against the WIDENED canonical, " +
      "approval round-trips it, the silver store takes the governed ADD " +
      "marker, and the stream RESUMES from its checkpoint with the " +
      "widened schema — stream == batch pinned") {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    import spark.implicits._
    val base = tmp("evolve-flow-")
    val conf = spark.sparkContext.hadoopConfiguration
    val f = new org.apache.hadoop.fs.Path(base.toString)
      .getFileSystem(conf)
    def land(name: String, body: String): Unit = {
      val out = f.create(new org.apache.hadoop.fs.Path(
        s"$base/bronze/cmdb_assets/$name"))
      out.write(body.getBytes("UTF-8")); out.close()
    }
    // ROUND 1: the third source lands without serials
    land("r1-a.json",
      """{"id":9001,"asset":{"displayName":"APP-01","primaryIp":
        |"10.9.0.4"},"osInfo":{"name":"Windows Server 2022","family":
        |"Windows"},"riskScore":321.5}""".stripMargin
        .replaceAll("\n", ""))
    land("r1-b.json", """{"id":9002,"asset":{"displayName":"APP-02"}}""")
    land("r1-corrupt.json", "not json at all")
    val canonicalV1 = CanonicalSchema.schema
    val cfgV1 = SchemaRegistry.Config(maxFilesForInference = 0,
      samplingRatio = 1.0, autoMapCanonical = Some(canonicalV1),
      autoMapSourceName = _ => "cmdb")
    val silver = new ManifestTableStore(s"$base/silver")
    // governance-only pass: infer + AUTO-EMIT the proposal
    val g1 = Pipeline.runOnce(spark, s"$base/bronze", s"$base/schemas",
      Nil, silver, cfgV1)
    assert(g1.governance.collect {
      case SchemaRegistry.Updated(t, _) => t } == Seq("cmdb_assets"))
    val reg1 = new SchemaRegistry(spark, s"$base/bronze",
      s"$base/schemas", cfgV1)
    // the human approves (uid is the gate — exactly where a human
    // belongs); the approved spec persists beside the schema artifact
    val p1 = AutoMapper.suggest("cmdb",
      reg1.readSchema("cmdb_assets").get, canonicalV1)
    val uid = UidSpec("asset_name", "primary_ip", "natural_id")
    AutoMapper.approve(spark, s"$base/schemas/cmdb_assets", p1,
      uidOverride = Some(uid))
    val specV1 = AutoMapper.loadApproved(spark,
      s"$base/schemas/cmdb_assets").get
    // full pass: governance skips (mtime watermark), streaming drains
    val r1 = Pipeline.runOnce(spark, s"$base/bronze", s"$base/schemas",
      Seq(Pipeline.Source(specV1, s"$base/bronze/cmdb_assets",
        s"$base/ckpt/cmdb")), silver, cfgV1)
    assert(r1.governance.collect {
      case SchemaRegistry.Skipped(t, _) => t } == Seq("cmdb_assets"))
    assert(r1.silver.count() == 2)
    assert(!r1.silver.columns.contains("serial_number"))
    val vBeforeEvolve = silver.currentVersion(spark)

    // ROUND 2: the org widens the canonical (serial_number rolls out)
    // and the source starts sending serials — DRIFT
    land("r2-c.json",
      """{"id":9003,"asset":{"displayName":"APP-03","primaryIp":
        |"10.9.0.7"},"osInfo":{"name":"Ubuntu 24.04","family":"Linux"},
        |"riskScore":12.0,"serialNumber":"SN-0003"}""".stripMargin
        .replaceAll("\n", ""))
    land("r2-d.json",
      """{"id":9004,"asset":{"displayName":"APP-04","primaryIp":
        |"10.9.0.8"},"serialNumber":"SN-0004"}""".stripMargin
        .replaceAll("\n", ""))
    val canonicalV2 = StructType(canonicalV1.fields :+
      StructField("serial_number", StringType))
    val cfgV2 = cfgV1.copy(autoMapCanonical = Some(canonicalV2))
    // governance pass: drift detected, proposal RE-EMITTED against the
    // widened canonical by the pass itself
    val g2 = Pipeline.runOnce(spark, s"$base/bronze", s"$base/schemas",
      Nil, silver, cfgV2)
    assert(g2.governance.collect {
      case SchemaRegistry.Updated(t, _) => t } == Seq("cmdb_assets"))
    val reg2 = new SchemaRegistry(spark, s"$base/bronze",
      s"$base/schemas", cfgV2)
    val p2 = AutoMapper.suggest("cmdb",
      reg2.readSchema("cmdb_assets").get, canonicalV2)
    assert(p2.suggestions.exists(s => s.target == "serial_number" &&
      s.best.dotted == "serialNumber"),
      p2.suggestions.map(s => s.target -> s.best.dotted).toString)
    // human approves the re-proposal; the widened canonical round-trips
    // through the sidecar
    AutoMapper.approve(spark, s"$base/schemas/cmdb_assets", p2,
      uidOverride = Some(uid))
    val specV2 = AutoMapper.loadApproved(spark,
      s"$base/schemas/cmdb_assets").get
    assert(specV2.canonical.fieldNames.contains("serial_number"))
    // the silver store evolves through the GOVERNED marker — one
    // versioned metadata commit, time-travelable
    silver.addColumns(spark, Seq("serial_number" -> StringType))
    assert(!silver.readVersion(spark, vBeforeEvolve).columns
      .contains("serial_number"))
    // the stream RESUMES from the same checkpoint with the widened
    // spec: only the round-2 files process
    val r2 = Pipeline.runOnce(spark, s"$base/bronze", s"$base/schemas",
      Seq(Pipeline.Source(specV2, s"$base/bronze/cmdb_assets",
        s"$base/ckpt/cmdb")), silver, cfgV2)
    assert(r2.governance.collect {
      case SchemaRegistry.Skipped(t, _) => t } == Seq("cmdb_assets"))
    val out = r2.silver
    assert(out.count() == 4)
    // pre-evolution rows read NULL in the new column; new rows carry it
    val serials = out.select($"asset_name", $"serial_number")
      .as[(String, Option[String])].collect().toMap
    assert(serials == Map("APP-01" -> None, "APP-02" -> None,
      "APP-03" -> Some("SN-0003"), "APP-04" -> Some("SN-0004")))
    // STREAM == BATCH: the same widened spec over ALL bronze files as
    // one batch equals the incrementally-streamed silver on every
    // deterministic column (ingest_ts is wall-clock, batch_id is
    // attribution)
    val batch = Normalize(
      Normalize.readBatch(spark, specV2,
        s"$base/bronze/cmdb_assets"), specV2)
    val det = specV2.canonical.fieldNames.toSeq
      .filterNot(_ == "ingest_ts")
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select(det.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(keyed(out) == keyed(batch))
    // and the whole flow is idempotent: a drained re-run changes nothing
    val r3 = Pipeline.runOnce(spark, s"$base/bronze", s"$base/schemas",
      Seq(Pipeline.Source(specV2, s"$base/bronze/cmdb_assets",
        s"$base/ckpt/cmdb")), silver, cfgV2)
    assert(r3.silver.count() == 4)
  }
}
