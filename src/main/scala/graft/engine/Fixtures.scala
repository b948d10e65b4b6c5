package graft.engine

/** Reference-shaped JSON fixtures (FIXTURES.md §A) used by the flagship
  * entry and the specs. Shapes derive from the reference's explicit bronze
  * schemas; values are synthetic.
  */
object Fixtures {

  val rapid7Records: Seq[String] = Seq(
    // full record
    """{"id":101,"ip":"10.0.0.17","hostName":"WEB-01.example.local",
      |"addresses":[{"ip":"10.0.0.17"},{"ip":"192.168.1.17"}],
      |"assessedForPolicies":true,"assessedForVulnerabilities":true,
      |"os":"Ubuntu Linux 22.04","osCertainty":"0.85",
      |"osFingerprint":{"architecture":"x86_64","family":"Linux",
      |"vendor":"Canonical","product":"Ubuntu","cpe":{"version":"22.04"}},
      |"riskScore":742.5,"rawRiskScore":812.33,
      |"vulnerabilities":{"total":14,"critical":2,"severe":5,"moderate":7,
      |"exploits":1,"malwareKits":0}}""".stripMargin.replaceAll("\n", ""),
    // case/whitespace variant of the same asset — must yield the SAME uid
    """{"id":101,"ip":"10.0.0.17","hostName":"  web-01.Example.LOCAL ","os":"Ubuntu Linux 22.04"}""",
    // minimal record: absent columns null-padded, uid still deterministic
    """{"hostName":"bare-host"}""",
    // null key parts: concat_ws skips nulls
    """{"id":5,"hostName":null,"ip":null}""",
    // malformed JSON → _corrupt_record → dropped from silver
    """{"id": 7, "ip": "10.0.0.9",""")

  val fortisiemRecords: Seq[String] = Seq(
    """{"_id":{"$oid":"64f1a2b3c4d5e6f7a8b9c0d1"},"accessIp":"172.16.5.20",
      |"name":"core-fw-01","naturalId":"FGT60F0000000001","approved":true,
      |"unmanaged":false,"deviceType":{"vendor":"Fortinet",
      |"model":"FortiGate-60F","version":"7.2.5"}}""".stripMargin
      .replaceAll("\n", ""),
    """{"_id":{"$oid":"64f1a2b3c4d5e6f7a8b9c0d2"},"name":"edge-sw-02"}""",
    """not json at all""")

  /** Pretty-printed (multi-line) variants for file-based multiLine=true
    * reads — one document per file.
    */
  val rapid7Pretty: Seq[String] = Seq(
    """{
      |  "id": 201,
      |  "ip": "10.1.0.5",
      |  "hostName": "DB-01.example.local",
      |  "riskScore": 120.0,
      |  "vulnerabilities": {
      |    "total": 3,
      |    "critical": 0,
      |    "severe": 1,
      |    "moderate": 2,
      |    "exploits": 0,
      |    "malwareKits": 0
      |  }
      |}""".stripMargin,
    """{
      |  "id": 202,
      |  "ip": "10.1.0.6",
      |  "hostName": "DB-02.example.local",
      |  "osCertainty": "0.5"
      |}""".stripMargin,
    """{"id": 203, "ip": "10.1.0.7", "hostName": "DB-03""") // corrupt file
}
