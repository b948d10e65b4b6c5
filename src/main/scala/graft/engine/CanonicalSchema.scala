package graft.engine

import org.apache.spark.sql.types._

/** The canonical ("silver") asset model: 33 governed columns that every
  * bronze source is normalized into.
  *
  * Column list and types mirror the reference's select contract
  * (`/root/reference/scripts/bronze_assets_to_silver_assets.py:150-162`,
  * `:256-268` — identical in both pipelines; that identity IS the union
  * contract, SURVEY.md §2.7 U1).
  */
object CanonicalSchema {

  /** PERMISSIVE-mode corrupt-record capture column (must be present in
    * every bronze schema; reference `:28-31`).
    */
  val CorruptCol = "_corrupt_record"

  /** Canonical columns in contract order. */
  val columns: Seq[StructField] = Seq(
    StructField("asset_uid", StringType),
    StructField("source_system", StringType),
    StructField("ingest_ts", TimestampType),
    StructField("rapid7_id", StringType),
    StructField("fortisiem_id", StringType),
    StructField("asset_name", StringType),
    StructField("primary_hostname", StringType),
    StructField("primary_ip", StringType),
    StructField("access_ip", StringType),
    StructField("natural_id", StringType),
    StructField("approved", BooleanType),
    StructField("unmanaged", BooleanType),
    StructField("device_vendor", StringType),
    StructField("device_model", StringType),
    StructField("device_version", StringType),
    StructField("os_name", StringType),
    StructField("os_family", StringType),
    StructField("os_vendor", StringType),
    StructField("os_product", StringType),
    StructField("os_version", StringType),
    StructField("os_architecture", StringType),
    StructField("os_certainty", DoubleType),
    StructField("assessed_for_policies", BooleanType),
    StructField("assessed_for_vulnerabilities", BooleanType),
    StructField("risk_score", DoubleType),
    StructField("raw_risk_score", DoubleType),
    StructField("vuln_total", IntegerType),
    StructField("vuln_critical", IntegerType),
    StructField("vuln_severe", IntegerType),
    StructField("vuln_moderate", IntegerType),
    StructField("vuln_exploits", IntegerType),
    StructField("vuln_malware_kits", IntegerType),
    StructField("raw_json", StringType))

  val schema: StructType = StructType(columns)

  val columnNames: Seq[String] = columns.map(_.name)
}
