package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class CsvSourceSpec extends SparkSpec {

  test("CSV bronze source normalizes under the same corrupt-capture contract") {
    val dir = Files.createTempDirectory("csv-bronze-")
    Files.writeString(dir.resolve("assets.csv"),
      """id,ip,hostName
        |1,10.0.0.1,host-a
        |2,10.0.0.2,host-b
        |not-an-int,oops
        |""".stripMargin)
    val spec = SourceSpec(
      name = "csvsource",
      schema = StructType(Seq(
        StructField(CanonicalSchema.CorruptCol, StringType),
        StructField("id", IntegerType),
        StructField("ip", StringType),
        StructField("hostName", StringType))),
      mapping = Map[String, Column](
        "rapid7_id" -> col("id").cast("string"),
        "asset_name" -> col("hostName"),
        "primary_hostname" -> col("hostName"),
        "primary_ip" -> col("ip")),
      uid = UidSpec("primary_hostname", "primary_ip", "rapid7_id"))
    val silver = Normalize(
      Normalize.readBatchCsv(spark, spec, dir.toString),
      spec, to_timestamp(lit("2026-01-01 00:00:00")))
    assert(silver.schema.map(_.name) == CanonicalSchema.columnNames)
    // NB: a bare count() right after the corrupt filter is rejected for
    // CSV (QUERY_ONLY_CORRUPT_RECORD_COLUMN — see readBatchCsv scaladoc);
    // real consumers reference data columns, as here.
    val rows = silver.select("rapid7_id", "primary_ip", "source_system",
      "asset_uid").collect().sortBy(_.getString(0))
    assert(rows.length == 2) // malformed row dropped
    assert(rows.head.getAs[String]("primary_ip") == "10.0.0.1")
    assert(rows.head.getAs[String]("source_system") == "csvsource")
    assert(rows.head.getAs[String]("asset_uid").length == 64)
  }
}
