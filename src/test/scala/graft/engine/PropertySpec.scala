package graft.engine

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based invariants (SURVEY §5.2): uid determinism and
  * normalization-shape stability under arbitrary record shapes.
  * Uses raw ScalaCheck generators sampled over a fixed seed sweep (the
  * scalatest-scalacheck bridge artifact is not in the offline cache).
  */
class PropertySpec extends SparkSpec {

  private def forAllSampled[A](gen: Gen[A], n: Int = 10)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(check)
    }

  private val hostGen = Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(20))
  private val ipGen = for {
    a <- Gen.choose(1, 254); b <- Gen.choose(0, 254)
  } yield s"10.$a.$b.1"

  private def normalizeOne(json: String) =
    Normalize(
      Normalize.readRecords(spark, SourceSpec.rapid7, Seq(json)),
      SourceSpec.rapid7, to_timestamp(lit("2026-01-01 00:00:00")))

  test("uid: equal inputs produce equal uids; case/space variants collide") {
    forAllSampled(for { h <- hostGen; p <- ipGen; i <- Gen.choose(1, 100000) } yield (h, p, i)) { case (host, ip, id) =>
      val a = s"""{"id": $id, "ip": "$ip", "hostName": "$host"}"""
      val b = s"""{"id": $id, "ip": "$ip", "hostName": "  ${host.toUpperCase} "}"""
      val uids = normalizeOne(a).unionByName(normalizeOne(b))
        .select("asset_uid").collect().map(_.getString(0))
      assert(uids.length == 2 && uids.distinct.length == 1)
    }
  }

  test("uid differs when any key part differs") {
    forAllSampled(for { h <- hostGen; i <- Gen.choose(1, 100000) } yield (h, i)) { case (host, id) =>
      val a = s"""{"id": $id, "hostName": "$host"}"""
      val b = s"""{"id": ${id + 1}, "hostName": "$host"}"""
      val uids = normalizeOne(a).unionByName(normalizeOne(b))
        .select("asset_uid").collect().map(_.getString(0))
      assert(uids.distinct.length == 2)
    }
  }

  test("normalization output always matches the canonical schema") {
    val fieldGen = Gen.oneOf(
      """"id": 5""", """"ip": "1.2.3.4"""", """"hostName": "h"""",
      """"riskScore": 1.5""", """"os": "linux"""")
    forAllSampled(Gen.listOf(fieldGen), n = 8) { fields =>
      val json = fields.distinct.mkString("{", ", ", "}")
      val out = normalizeOne(json)
      // names + types are the contract; generated columns may tighten
      // nullability (e.g. lit() constants), which is fine
      assert(out.schema.map(f => (f.name, f.dataType)) ==
        CanonicalSchema.columns.map(f => (f.name, f.dataType)))
    }
  }

  test("schema inference is monotone under adding a field") {
    import java.nio.file.Files
    val reg = (dir: java.nio.file.Path) => new SchemaRegistry(spark,
      dir.toString, Files.createTempDirectory("wh-").toString,
      SchemaRegistry.Config(multiLine = false, samplingRatio = 1.0))
    val d1 = Files.createTempDirectory("mono-")
    Files.writeString(d1.resolve("a.json"), """{"x": 1, "y": "s"}""")
    val base = reg(d1).inferSchema(Seq(d1.resolve("a.json").toString)).get._1
    Files.writeString(d1.resolve("b.json"), """{"x": 2, "z": true}""")
    val extended = reg(d1).inferSchema(Seq(
      d1.resolve("a.json").toString, d1.resolve("b.json").toString)).get._1
    val baseFields = org.apache.spark.sql.types.DataType.fromJson(base)
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    val extFields = org.apache.spark.sql.types.DataType.fromJson(extended)
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    assert(baseFields.subsetOf(extFields) && extFields.contains("z"))
  }

  test("schema hash is stable for identical schemas, sensitive to drift") {
    val j1 = """{"type":"struct","fields":[{"name":"a","type":"long","nullable":true,"metadata":{}}]}"""
    assert(SchemaRegistry.hashSchema(j1) == SchemaRegistry.hashSchema(j1))
    assert(SchemaRegistry.hashSchema(j1) !=
      SchemaRegistry.hashSchema(j1.replace("\"a\"", "\"b\"")))
  }
}
