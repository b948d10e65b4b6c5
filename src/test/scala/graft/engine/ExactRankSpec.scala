package graft.engine

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[ExactRank]] must agree with the single-partition window it
  * replaces — same (v, pos) pairs on any input, ties included — while
  * actually distributing the sort (the point of the rewrite: a global
  * `row_number().over(Window.orderBy(v))` moves the corpus into ONE
  * task).
  */
class ExactRankSpec extends SparkSpec {

  import spark.implicits._

  private def windowRank(vals: Seq[Long]): Set[(Long, Long)] =
    vals.toDF("v")
      .withColumn("pos", row_number().over(Window.orderBy("v"))
        .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def exactRank(vals: Seq[Long]): Set[(Long, Long)] =
    ExactRank.ranked(vals.toDF("x"), "x")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches the global window on random data with heavy ties") {
    val rnd = new scala.util.Random(42)
    val vals = Seq.fill(5000)(rnd.nextInt(300).toLong) // ~17x ties/value
    assert(exactRank(vals) == windowRank(vals))
  }

  test("matches on already-sorted, reverse-sorted, and constant input") {
    val asc = (1L to 1000L).toSeq
    assert(exactRank(asc) == windowRank(asc))
    val desc = asc.reverse
    assert(exactRank(desc) == windowRank(desc))
    val const = Seq.fill(500)(7L)
    assert(exactRank(const) == windowRank(const))
  }

  test("positions are a permutation of 1..N and value-monotone") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(2000)(rnd.nextLong() % 1000)
    val got = ExactRank.ranked(vals.toDF("x"), "x")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._2).sorted.toSeq == (1L to 2000L))
    // pos order implies value order (ascending)
    val byPos = got.sortBy(_._2).map(_._1)
    assert(byPos.zip(byPos.tail).forall { case (a, b) => a <= b })
  }

  test("valuesAt agrees with ranked at every requested position, " +
      "drops out-of-range ranks, and reports the exact count") {
    val rnd = new scala.util.Random(99)
    val vals = Seq.fill(3000)(rnd.nextInt(200).toLong) // heavy ties
    val byPos = ExactRank.ranked(vals.toDF("x"), "x")
      .collect().map(r => (r.getLong(1), r.getLong(0))).toMap
    val wanted = Seq(1L, 2L, 149L, 150L, 151L, 2999L, 3000L)
    val (n, got) = ExactRank.valuesAt(vals.toDF("x"), "x",
      n => wanted ++ Seq(0L, n + 1))
    assert(n == 3000L)
    assert(got.keySet == wanted.toSet) // 0 and n+1 absent
    // ties are interchangeable at a rank: compare VALUES, which both
    // forms define identically (the value at the sorted position)
    wanted.foreach(p => assert(got(p) == byPos(p),
      s"position $p: valuesAt=${got(p)} ranked=${byPos(p)}"))
  }

  test("the sort is distributed: no single-partition Exchange feeds " +
      "the rank (the plan has no Window at all)") {
    val df = ExactRank.ranked(
      spark.range(0, 100000).selectExpr("id % 997 AS x"), "x")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"expected no window operator in:\n$plan")
    assert(!plan.toLowerCase.contains("singlepartition"),
      s"expected no SinglePartition exchange in:\n$plan")
  }
}
