package graft.engine

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-style laws for the auto-mapper's scorer: the invariants a
  * reviewer relies on when reading a proposal's confidence column.
  * Raw ScalaCheck generators over a fixed seed sweep (same pattern as
  * PropertySpec — the scalatest bridge artifact is offline-absent).
  */
class AutoMapperLawsSpec extends SparkSpec {

  private def forAllSampled[A](gen: Gen[A], n: Int = 25)(
      check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private val word = Gen.oneOf("risk", "score", "asset", "vuln",
    "total", "name", "host", "ip", "os", "family", "device", "vendor",
    "severe", "id", "natural", "access", "approved", "frame", "zeta")
  private val ident = for {
    n <- Gen.choose(1, 4)
    ws <- Gen.listOfN(n, word)
  } yield ws.mkString("_")

  private def conf(t: String, s: String): Double =
    AutoMapper.confidence(AutoMapper.tokens(t), AutoMapper.tokens(s),
      StringType, StringType)

  test("confidence is bounded in [0,1] and an exact name match scores " +
      "1.0 — no candidate can beat the identical column") {
    forAllSampled(ident) { id =>
      val self = conf(id, id)
      assert(self == 1.0, s"$id self-score $self")
    }
    forAllSampled(Gen.zip(ident, ident)) { case (a, b) =>
      val c = conf(a, b)
      assert(c >= 0.0 && c <= 1.0, s"conf($a,$b)=$c out of range")
      assert(c <= conf(a, a), s"$b outs scored the identical $a")
    }
  }

  test("camelCase and snake_case spellings of the same identifier are " +
      "interchangeable on both sides") {
    forAllSampled(ident) { id =>
      val camel = {
        val parts = id.split("_")
        (parts.head +: parts.tail.map(_.capitalize)).mkString
      }
      assert(conf(id, camel) >= 0.95 * conf(id, id),
        s"snake '$id' vs camel '$camel'")
      assert(conf(camel, id) >= 0.95 * conf(id, id))
    }
  }

  test("an incompatible type zeroes any name match; a castable type " +
      "never outranks the exact type on the same name") {
    forAllSampled(ident) { id =>
      assert(AutoMapper.confidence(AutoMapper.tokens(id),
        AutoMapper.tokens(id), StringType,
        ArrayType(StringType)) == 0.0)
      val exact = AutoMapper.confidence(AutoMapper.tokens(id),
        AutoMapper.tokens(id), LongType, LongType)
      val cast = AutoMapper.confidence(AutoMapper.tokens(id),
        AutoMapper.tokens(id), LongType, IntegerType)
      assert(cast < exact && cast > 0.9)
    }
  }

  test("the distinguishing rule is stable under qualifier padding: a " +
      "target with an unmatched non-generic token scores ZERO however " +
      "strong the generic overlap") {
    forAllSampled(Gen.oneOf("id", "name", "ip")) { g =>
      assert(conf(s"zeta_$g", g) == 0.0)
      assert(conf(s"zeta_frame_$g", s"other_$g") == 0.0)
    }
  }
}
