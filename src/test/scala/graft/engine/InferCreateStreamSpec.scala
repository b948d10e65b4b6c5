package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit, to_timestamp}
import org.apache.spark.sql.types.StringType

import graft.SparkSpec

/** The reference's two jobs wired to the catalog end to end with ZERO
  * hand-written schema (the q225 flagship, spec'd with the assertions
  * the oracle can't carry): bronze lands → SchemaRegistry infers each
  * topic → the silver schema derives mechanically from the normalize
  * plan over the INFERRED bronze schema → CREATE TABLE through
  * StoreCatalog → StreamRunner streams both sources into the created
  * store → a fresh catalog discovers and queries it.
  */
class InferCreateStreamSpec extends SparkSpec {

  import spark.implicits._

  test("infer → CREATE → stream → query: zero hand-written schema, " +
      "corrupt records drop, uids are deterministic, re-running the " +
      "drained stream is exactly-once, a fresh catalog discovers the " +
      "result") {
    val root = Files.createTempDirectory("onboard-")
    root.toFile.deleteOnExit()
    val conf = spark.sparkContext.hadoopConfiguration
    val f = new org.apache.hadoop.fs.Path(root.toString)
      .getFileSystem(conf)
    def land(topic: String, records: Seq[String]): Unit =
      records.zipWithIndex.foreach { case (r, i) =>
        val hp = new org.apache.hadoop.fs.Path(
          s"$root/bronze/$topic/rec-$i.json")
        val out = f.create(hp)
        out.write(r.getBytes("UTF-8")); out.close()
      }
    land("rapid7_assets", Fixtures.rapid7Records)
    land("fortisiem_assets", Fixtures.fortisiemRecords)

    // job A: inference (full sampling — tiny fixture corpus)
    val registry = new SchemaRegistry(spark, s"$root/bronze",
      s"$root/schemas",
      SchemaRegistry.Config(maxFilesForInference = 0,
        samplingRatio = 1.0))
    val outcomes = registry.runOnce()
    assert(outcomes.count(_.isInstanceOf[SchemaRegistry.Updated]) == 2,
      s"both topics must infer, got $outcomes")

    // the specs carry the INFERRED schemas, not the hand-written ones
    def specOf(topic: String, proto: SourceSpec): SourceSpec = {
      val inferred = registry.readSchema(topic).get
      proto.copy(schema =
        if (inferred.fieldNames.contains(CanonicalSchema.CorruptCol))
          inferred
        else inferred.add(CanonicalSchema.CorruptCol, StringType))
    }
    val r7 = specOf("rapid7_assets", SourceSpec.rapid7)
    val fsm = specOf("fortisiem_assets", SourceSpec.fortisiem)
    // provenance: the inferred bronze schema is NOT the hand-written
    // one (JSON inference widens ints to bigint), yet normalization
    // still lands the canonical types through the mapping casts
    assert(r7.schema != SourceSpec.rapid7.schema,
      "the flow must run on the inferred schema, not the curated one")

    // the silver schema derives from the normalize plan — no literal
    // column list anywhere in this test
    val silverSchema = Normalize(
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[org.apache.spark.sql.Row], r7.schema), r7,
      to_timestamp(lit("2026-01-01 00:00:00"))).schema
    assert(silverSchema.fields.map(x => (x.name, x.dataType)).toSeq ==
      CanonicalSchema.columns.map(x => (x.name, x.dataType)),
      "the derived silver schema must BE the canonical contract " +
        "(nullability aside — literals are non-nullable)")
    val cat = new StoreCatalog(s"$root/catalog")
    cat.exec(spark, s"CREATE TABLE silver_assets " +
      s"(${silverSchema.toDDL}) USING graft_store")

    // job B: both sources stream into the catalog table
    def drain(): Unit = StreamRunner.runAvailableNow(spark, Seq(
      (r7, s"$root/bronze/rapid7_assets", s"$root/ckpt/rapid7"),
      (fsm, s"$root/bronze/fortisiem_assets", s"$root/ckpt/forti")),
      cat.store("silver_assets"))
    drain()

    val silver = cat.store("silver_assets").read(spark)
    // 5 rapid7 records (1 corrupt) + 3 fortisiem (1 corrupt) → 6 rows
    assert(silver.count() == 6, "corrupt records must drop")
    // deterministic surrogate key: the case/whitespace variant of the
    // full record collides onto the same uid; null parts skip
    val uids = silver.filter(col("source_system") === "rapid7")
      .select("asset_uid").as[String].collect()
    assert(uids.length == 4 && uids.distinct.length == 3,
      "the canonicalized variant must share the full record's uid")
    // a FRESH catalog discovers, inspects, and queries the table
    val fresh = new StoreCatalog(s"$root/catalog")
    assert(fresh.exec(spark, "SHOW TABLES").select("tableName")
      .as[String].collect().toSeq == Seq("silver_assets"))
    val described = fresh.exec(spark, "DESCRIBE TABLE silver_assets")
      .select("col_name").as[String].collect().toSet
    assert(CanonicalSchema.columnNames.toSet.subsetOf(described))
    assert(fresh.query(spark,
      "SELECT count(*) AS n FROM silver_assets").as[Long].head() == 6L)
    // exactly-once: draining the same checkpoints again appends nothing
    drain()
    assert(cat.store("silver_assets").read(spark).count() == 6,
      "a re-run over drained checkpoints must be exactly-once")
  }
}
