package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative description of one bronze source and its mapping into the
  * canonical model. The engine derives everything else (corrupt-record
  * filter, typed null-padding, uid, raw_json, final projection) from this —
  * one spec replaces a ~70-line withColumn chain per source.
  *
  * @param name        `source_system` literal for rows from this source
  * @param schema      explicit bronze schema, must include `_corrupt_record`
  * @param mapping     canonical column → expression over the RAW columns;
  *                    canonical columns not present here are null-padded
  *                    with their canonical type
  * @param uid         canonical names of the (hostname-ish, ip-ish, id-ish)
  *                    uid parts: sha2(concat_ws("|", lower(trim(host)),
  *                    lower(trim(ip)), id), 256). concat_ws skips nulls —
  *                    load-bearing for uid semantics (SURVEY §2.8 F5).
  */
final case class SourceSpec(
    name: String,
    schema: StructType,
    mapping: Map[String, Column],
    uid: UidSpec,
    jsonOptions: Map[String, String] = SourceSpec.JsonOptions,
    /** The silver model this source normalizes INTO — the fixed
      * organization-wide canonical by default. A WIDENED canonical
      * (the governed-evolution flow: a new silver column rolls out,
      * drift re-proposes, approval re-targets) projects here, and the
      * silver store's governed ADD marker admits the extra column.
      */
    canonical: StructType = CanonicalSchema.schema)

final case class UidSpec(hostnameCol: String, ipishCol: String, idCol: String)

object SourceSpec {

  /** JSON reader hardening, identical semantics to the reference
    * (`bronze_assets_to_silver_assets.py:29-32`): tolerate pretty-printed
    * documents, never abort on malformed input, capture it instead.
    */
  val JsonOptions: Map[String, String] = Map(
    "multiLine" -> "true",
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> CanonicalSchema.CorruptCol)

  /** Rapid7 vulnerability-scan assets
    * (schema: `bronze_assets_to_silver_assets.py:40-78`).
    */
  val rapid7: SourceSpec = {
    val schema = StructType(Seq(
      StructField(CanonicalSchema.CorruptCol, StringType),
      StructField("id", IntegerType),
      StructField("ip", StringType),
      StructField("hostName", StringType),
      StructField("addresses", ArrayType(StructType(Seq(
        StructField("ip", StringType))))),
      StructField("assessedForPolicies", BooleanType),
      StructField("assessedForVulnerabilities", BooleanType),
      StructField("os", StringType),
      StructField("osCertainty", StringType), // string at source, double in silver
      StructField("osFingerprint", StructType(Seq(
        StructField("architecture", StringType),
        StructField("family", StringType),
        StructField("vendor", StringType),
        StructField("product", StringType),
        StructField("cpe", StructType(Seq(
          StructField("version", StringType))))))),
      StructField("riskScore", DoubleType),
      StructField("rawRiskScore", DoubleType),
      StructField("vulnerabilities", StructType(Seq(
        StructField("total", IntegerType),
        StructField("critical", IntegerType),
        StructField("severe", IntegerType),
        StructField("moderate", IntegerType),
        StructField("exploits", IntegerType),
        StructField("malwareKits", IntegerType))))))
    SourceSpec(
      name = "rapid7",
      schema = schema,
      mapping = Map(
        "rapid7_id" -> col("id").cast("string"),
        "asset_name" -> col("hostName"),
        "primary_hostname" -> col("hostName"),
        "primary_ip" -> col("ip"),
        "os_name" -> col("os"),
        "os_family" -> col("osFingerprint.family"),
        "os_vendor" -> col("osFingerprint.vendor"),
        "os_product" -> col("osFingerprint.product"),
        "os_version" -> col("osFingerprint.cpe.version"),
        "os_architecture" -> col("osFingerprint.architecture"),
        "os_certainty" -> col("osCertainty").cast("double"),
        "assessed_for_policies" -> col("assessedForPolicies"),
        "assessed_for_vulnerabilities" -> col("assessedForVulnerabilities"),
        "risk_score" -> col("riskScore").cast("double"),
        "raw_risk_score" -> col("rawRiskScore").cast("double"),
        "vuln_total" -> col("vulnerabilities.total").cast("int"),
        "vuln_critical" -> col("vulnerabilities.critical").cast("int"),
        "vuln_severe" -> col("vulnerabilities.severe").cast("int"),
        "vuln_moderate" -> col("vulnerabilities.moderate").cast("int"),
        "vuln_exploits" -> col("vulnerabilities.exploits").cast("int"),
        "vuln_malware_kits" -> col("vulnerabilities.malwareKits").cast("int")),
      uid = UidSpec("primary_hostname", "primary_ip", "rapid7_id"))
  }

  /** FortiSIEM device inventory
    * (schema: `bronze_assets_to_silver_assets.py:169-187`). Note the
    * Mongo-style `$`-prefixed nested field, which needs backtick quoting.
    */
  val fortisiem: SourceSpec = {
    val schema = StructType(Seq(
      StructField(CanonicalSchema.CorruptCol, StringType),
      StructField("_id", StructType(Seq(
        StructField("$oid", StringType)))),
      StructField("accessIp", StringType),
      StructField("name", StringType),
      StructField("naturalId", StringType),
      StructField("approved", BooleanType),
      StructField("unmanaged", BooleanType),
      StructField("deviceType", StructType(Seq(
        StructField("vendor", StringType),
        StructField("model", StringType),
        StructField("version", StringType))))))
    SourceSpec(
      name = "fortisiem",
      schema = schema,
      mapping = Map(
        "fortisiem_id" -> col("_id.`$oid`").cast("string"),
        "asset_name" -> col("name"),
        "primary_hostname" -> col("name"),
        "access_ip" -> col("accessIp"),
        "natural_id" -> col("naturalId"),
        "approved" -> col("approved"),
        "unmanaged" -> col("unmanaged"),
        "device_vendor" -> col("deviceType.vendor"),
        "device_model" -> col("deviceType.model"),
        "device_version" -> col("deviceType.version")),
      uid = UidSpec("primary_hostname", "access_ip", "fortisiem_id"))
  }
}
