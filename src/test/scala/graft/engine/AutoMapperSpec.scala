package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions.{lit, to_timestamp}
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The auto-mapping suggestion engine (reference README.md:40): from the
  * rapid7 bronze schema alone it must recover the ENTIRE hand-written
  * mapping — and refuse to guess where a human is needed.
  */
class AutoMapperSpec extends SparkSpec {

  private val ts = to_timestamp(lit("2026-01-01 00:00:00"))

  test("rapid7: the suggested mapping recovers all 21 hand-written " +
      "entries, the uid triple, and nothing else — and the normalized " +
      "rows are IDENTICAL to the hand-written spec's") {
    val hand = SourceSpec.rapid7
    val p = AutoMapper.suggest("rapid7", hand.schema)
    // exact target set: the 21 hand-mapped canonical columns
    assert(p.suggestions.map(_.target).toSet == hand.mapping.keySet,
      s"suggested=${p.suggestions.map(_.target).sorted}")
    assert(p.ambiguousTargets.isEmpty,
      s"unexpected ambiguity: ${p.ambiguousTargets}")
    // the winners are the hand-written source paths
    val paths = p.suggestions.map(s => s.target -> s.best.dotted).toMap
    assert(paths("rapid7_id") == "id")
    assert(paths("asset_name") == "hostName")
    assert(paths("primary_hostname") == "hostName")
    assert(paths("primary_ip") == "ip")
    assert(paths("os_name") == "os")
    assert(paths("os_family") == "osFingerprint.family")
    assert(paths("os_version") == "osFingerprint.cpe.version")
    assert(paths("os_certainty") == "osCertainty")
    assert(paths("risk_score") == "riskScore")
    assert(paths("raw_risk_score") == "rawRiskScore")
    assert(paths("vuln_malware_kits") == "vulnerabilities.malwareKits")
    // uid triple matches the hand-written spec
    assert(p.uid.contains(hand.uid))
    // the honesty reports: fortisiem-namespaced and fortisiem-only
    // columns are UNFILLED (not wrongly grabbed by rapid7's bare `id`),
    // the addresses array is UNMAPPED
    assert(Set("fortisiem_id", "natural_id", "access_ip", "approved",
      "unmanaged", "device_vendor", "device_model", "device_version")
      .subsetOf(p.unfilled.toSet), s"unfilled=${p.unfilled}")
    assert(p.unmappedSource.map(_._1.mkString(".")).toSet ==
      Set("addresses"), s"unmapped=${p.unmappedSource}")
    // round-trip: the SUGGESTED spec normalizes the fixtures to the
    // same rows as the hand-written one — uid, raw_json, all 33 columns
    val auto = p.toSourceSpec()
    val handRows = Normalize(
      Normalize.readRecords(spark, hand, Fixtures.rapid7Records), hand,
      ts).collect().toSet
    val autoRows = Normalize(
      Normalize.readRecords(spark, auto, Fixtures.rapid7Records), auto,
      ts).collect().toSet
    assert(autoRows == handRows)
  }

  test("fortisiem: confident targets map, but primary_hostname (a pure " +
      "semantic judgment — `name` carries no hostname evidence) stays " +
      "UNFILLED, so uid suggestion refuses and auto-apply demands an " +
      "explicit uid — the human-in-the-loop gate") {
    val hand = SourceSpec.fortisiem
    val p = AutoMapper.suggest("fortisiem", hand.schema)
    val paths = p.suggestions.map(s => s.target -> s.best.dotted).toMap
    assert(paths("fortisiem_id") == "_id.$oid")
    assert(paths("asset_name") == "name")
    assert(paths("access_ip") == "accessIp")
    assert(paths("natural_id") == "naturalId")
    assert(paths("approved") == "approved")
    assert(paths("unmanaged") == "unmanaged")
    assert(paths("device_vendor") == "deviceType.vendor")
    assert(paths("device_model") == "deviceType.model")
    assert(paths("device_version") == "deviceType.version")
    // fortisiem_id sees two bare-id candidates (`_id.$oid`,
    // `naturalId`) with equal lexical evidence — honestly AMBIGUOUS;
    // the human accepts the winner explicitly
    assert(p.ambiguousTargets == Seq("fortisiem_id"))
    // the one the human must fill: `name` → primary_hostname is a
    // judgment call, not a lexical match
    assert(p.unfilled.contains("primary_hostname"))
    assert(p.uid.isEmpty)
    val e = intercept[IllegalArgumentException] {
      p.toSourceSpec(acceptAmbiguous = Set("fortisiem_id"))
    }
    assert(e.getMessage.contains("uid"))
    // with the human-supplied uid the spec runs — and matches the
    // hand-written rows on every AUTO-MAPPED column
    val auto = p.toSourceSpec(uidOverride = Some(
      UidSpec("asset_name", "access_ip", "fortisiem_id")),
      acceptAmbiguous = Set("fortisiem_id"))
    val rows = Normalize(
      Normalize.readRecords(spark, auto, Fixtures.fortisiemRecords),
      auto, ts)
    val handRows = Normalize(
      Normalize.readRecords(spark, hand, Fixtures.fortisiemRecords),
      hand, ts)
    val cols = Seq("fortisiem_id", "asset_name", "access_ip",
      "natural_id", "approved", "unmanaged", "device_vendor",
      "device_model", "device_version")
    assert(rows.select(cols.head, cols.tail: _*).collect().toSet ==
      handRows.select(cols.head, cols.tail: _*).collect().toSet)
  }

  test("ambiguity refuses auto-apply: two near-equal candidates for one " +
      "target flag it, toSourceSpec throws, and acceptAmbiguous is the " +
      "explicit human override") {
    val bronze = StructType(Seq(
      StructField("hostName", StringType),
      StructField("ip", StringType),
      StructField("id", IntegerType),
      StructField("osVer", StringType),
      StructField("osVersion", StringType)))
    val p = AutoMapper.suggest("rapid7", bronze)
    val sug = p.suggestions.find(_.target == "os_version").get
    assert(sug.ambiguous,
      s"expected ambiguity, got ${sug.best.dotted} at " +
        s"${sug.best.confidence} vs ${sug.runnersUp.map(_.confidence)}")
    val e = intercept[IllegalArgumentException] { p.toSourceSpec() }
    assert(e.getMessage.contains("os_version"))
    // explicit acceptance takes the winner
    val spec = p.toSourceSpec(acceptAmbiguous = Set("os_version"))
    assert(spec.mapping.contains("os_version"))
  }

  test("below-floor candidates are reported as unfilled, never applied: " +
      "device_vendor must not grab osFingerprint.vendor at 0.4") {
    val p = AutoMapper.suggest("rapid7", SourceSpec.rapid7.schema)
    assert(p.unfilled.contains("device_vendor"))
    assert(!p.suggestions.exists(_.target == "device_vendor"))
  }

  test("proposal and approved spec persist as sidecars: a FRESH session " +
      "loads the approved mapping_spec and produces the same rows; " +
      "loadApproved on an unapproved dir is None") {
    val dir = Files.createTempDirectory("automap-")
    dir.toFile.deleteOnExit()
    val p = AutoMapper.suggest("rapid7", SourceSpec.rapid7.schema)
    AutoMapper.persistProposal(spark, dir.toString, p)
    assert(AutoMapper.loadApproved(spark, dir.toString).isEmpty)
    val approved = AutoMapper.approve(spark, dir.toString, p)
    val loaded = AutoMapper.loadApproved(spark, dir.toString).get
    assert(loaded.name == "rapid7")
    assert(loaded.uid == approved.uid)
    assert(loaded.mapping.keySet == approved.mapping.keySet)
    val a = Normalize(
      Normalize.readRecords(spark, approved, Fixtures.rapid7Records),
      approved, ts).collect().toSet
    val b = Normalize(
      Normalize.readRecords(spark, loaded, Fixtures.rapid7Records),
      loaded, ts).collect().toSet
    assert(a == b && a.nonEmpty)
    // the proposal sidecar is present, JSON, and carries the review
    // surface (confidences + honesty reports)
    val hp = new org.apache.hadoop.fs.Path(s"$dir/mapping_proposal")
    val f = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.exists(hp))
    val in = f.open(hp)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(text)
    assert(root.get("suggestions").size() == 21)
    assert(root.get("unmappedSource").size() == 1)
  }
}
