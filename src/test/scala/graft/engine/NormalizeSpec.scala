package graft.engine

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {

  private def r7 =
    Normalize(
      Normalize.readRecords(spark, SourceSpec.rapid7, Fixtures.rapid7Records),
      SourceSpec.rapid7,
      to_timestamp(lit("2026-01-01 00:00:00"))).cache()

  private def forti =
    Normalize(
      Normalize.readRecords(spark, SourceSpec.fortisiem,
        Fixtures.fortisiemRecords),
      SourceSpec.fortisiem,
      to_timestamp(lit("2026-01-01 00:00:00"))).cache()

  test("output schema is exactly the canonical 33-column contract") {
    assert(r7.schema.map(f => (f.name, f.dataType)) ==
      CanonicalSchema.columns.map(f => (f.name, f.dataType)))
    assert(forti.schema.map(f => (f.name, f.dataType)) ==
      CanonicalSchema.columns.map(f => (f.name, f.dataType)))
  }

  test("corrupt records are dropped from silver") {
    // 5 rapid7 fixtures, 1 corrupt → 4 silver rows
    assert(r7.count() == 4)
    // 3 fortisiem fixtures, 1 corrupt → 2
    assert(forti.count() == 2)
  }

  test("uid is case/whitespace-insensitive on hostname (lower+trim)") {
    val uids = r7.filter(col("rapid7_id") === "101")
      .select("asset_uid").collect().map(_.getString(0))
    assert(uids.length == 2)
    assert(uids.distinct.length == 1, "variant hostnames must hash equal")
  }

  test("uid: concat_ws skips null parts rather than stringifying them") {
    // {"id":5, hostName:null, ip:null} → uid = sha2("5") (only id part)
    val got = r7.filter(col("rapid7_id") === "5")
      .select("asset_uid").head().getString(0)
    val want = spark.sql("SELECT sha2('5', 256)").head().getString(0)
    assert(got == want)
    // {"hostName":"bare-host"} → uid = sha2("bare-host") (hostname only)
    val bare = r7.filter(col("primary_hostname") === "bare-host")
      .select("asset_uid").head().getString(0)
    val wantBare = spark.sql("SELECT sha2('bare-host', 256)").head().getString(0)
    assert(bare == wantBare)
  }

  test("nested extraction: 3-deep cpe.version and $-prefixed _id.$oid") {
    val full = r7.filter(col("rapid7_id") === "101" &&
      col("os_version").isNotNull).head()
    assert(full.getAs[String]("os_version") == "22.04")
    assert(full.getAs[String]("os_architecture") == "x86_64")
    val fw = forti.filter(col("asset_name") === "core-fw-01").head()
    assert(fw.getAs[String]("fortisiem_id") == "64f1a2b3c4d5e6f7a8b9c0d1")
    assert(fw.getAs[String]("device_model") == "FortiGate-60F")
  }

  test("typed null-padding: absent canonical columns are null with right type") {
    val fw = forti.filter(col("asset_name") === "core-fw-01").head()
    assert(fw.isNullAt(fw.fieldIndex("risk_score")))
    assert(fw.isNullAt(fw.fieldIndex("vuln_total")))
    assert(fw.isNullAt(fw.fieldIndex("rapid7_id")))
    val minimal = r7.filter(col("primary_hostname") === "bare-host").head()
    assert(minimal.isNullAt(minimal.fieldIndex("approved")))
    assert(minimal.isNullAt(minimal.fieldIndex("access_ip")))
  }

  test("source-typed casts: osCertainty string → double") {
    val full = r7.filter(col("rapid7_id") === "101" &&
      col("os_certainty").isNotNull).head()
    assert(full.getAs[Double]("os_certainty") == 0.85)
  }

  test("raw_json preserves the original record (round-trips)") {
    val raw = r7.filter(col("rapid7_id") === "101" &&
      col("os_version").isNotNull).select("raw_json").head().getString(0)
    val parsed = spark.read.json(
      spark.createDataset(Seq(raw))(spark.implicits.newStringEncoder))
    val row = parsed.head()
    assert(row.getAs[Long]("id") == 101L)
    assert(row.getAs[Row]("vulnerabilities").getAs[Long]("total") == 14L)
    assert(!parsed.columns.contains(CanonicalSchema.CorruptCol),
      "corrupt column must not leak into raw_json")
  }

  test("union contract: both sources align by name into one frame") {
    val u = r7.unionByName(forti)
    assert(u.count() == 6)
    assert(u.select("source_system").distinct().collect().map(_.getString(0))
      .sorted.toSeq == Seq("fortisiem", "rapid7"))
  }
}
