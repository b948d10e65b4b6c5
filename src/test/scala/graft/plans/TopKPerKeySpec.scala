package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract of the custom top-k-per-key physical operator: row-set
  * identity with the row_number window form (including k-boundary
  * ties under the supplied total order), the FINAL-over-exchange-over-
  * PARTIAL plan shape, and degenerate inputs.
  */
class TopKPerKeySpec extends SparkSpec {

  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame,
      k: Int): Set[(Long, Long, Double)] = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rn", row_number().over(Window.partitionBy("k")
        .orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= k).drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
  }

  private def opForm(df: org.apache.spark.sql.DataFrame,
      k: Int): Set[(Long, Long, Double)] =
    TopKPerKey(df, "k", Seq(("v", true), ("id", false)), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  test("row-set identity with the window form, including k-boundary " +
      "ties resolved by the total order") {
    // key 1: distinct values; key 2: ALL-TIED values (boundary entirely
    // decided by the id tie-break); key 3: fewer rows than k
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 4.0), (1L, 12L, 3.0), (1L, 13L, 2.0),
      (2L, 20L, 7.0), (2L, 21L, 7.0), (2L, 22L, 7.0), (2L, 23L, 7.0),
      (3L, 30L, 1.0)
    ).toDF("k", "id", "v")
    for (k <- Seq(1, 2, 3, 10)) {
      assert(opForm(df, k) == windowForm(df, k), s"diverged at k=$k")
    }
    // the all-tied key keeps the LOWEST ids (id ascending tie-break)
    assert(opForm(df, 2).filter(_._1 == 2L).map(_._2) == Set(20L, 21L))
  }

  test("identity on real data across a repartition (partial phase sees " +
      "keys split over many partitions)") {
    val orders = graft.engine.Tables(spark, "/root/testdata/sf0.001",
        "orders")
      .select(col("o_custkey").as("k"), col("o_orderkey").as("id"),
        col("o_totalprice").as("v"))
      .repartition(13)
    assert(opForm(orders, 3) == windowForm(orders, 3))
  }

  test("plan shape: FINAL over exchange over PARTIAL — the map-side " +
      "phase runs before the shuffle") {
    val df = spark.range(100)
      .select((col("id") % 7).as("k"), col("id").as("id"),
        (col("id") * 1.0).as("v"))
    val out = TopKPerKey(df, "k", Seq(("v", true), ("id", false)), 2)
    out.collect()
    def collectNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: collectNodes(q.plan)
      case _ => p +: p.children.flatMap(collectNodes)
    }
    val nodes = collectNodes(out.queryExecution.executedPlan)
    val topks = nodes.collect { case t: TopKPerKeyExec => t }
    assert(topks.map(_.isFinal).sorted == Seq(false, true),
      s"expected partial+final TopKPerKeyExec, got $topks")
    // an exchange sits between final and partial
    val finalIdx = nodes.indexWhere {
      case t: TopKPerKeyExec => t.isFinal; case _ => false
    }
    val exchangeBelowFinal = nodes.drop(finalIdx).exists {
      case _: ShuffleExchangeLike => true; case _ => false
    }
    assert(exchangeBelowFinal, "no exchange between final and partial")
  }

  test("spill path: keys far beyond the spill threshold stay exact " +
      "(byte-sorted runs + k-way merge) and the spill metric fires") {
    val prev = spark.conf.getOption(TopKPerKey.SpillKeysConf)
    spark.conf.set(TopKPerKey.SpillKeysConf, "16")
    try {
      // 5000 distinct keys through a 16-key map → hundreds of runs per
      // task; values permuted so later rows often beat earlier ones
      val df = spark.range(20000)
        .select((col("id") % 5000).as("k"), col("id").as("id"),
          ((col("id") * 2654435761L) % 100003).cast("double").as("v"))
      val out = TopKPerKey(df, "k", Seq(("v", true), ("id", false)), 2)
      val got = out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == windowForm(df, 2))
      def collectNodes(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: collectNodes(q.plan)
        case _ => p +: p.children.flatMap(collectNodes)
      }
      val spills = collectNodes(out.queryExecution.executedPlan)
        .collect { case t: TopKPerKeyExec => t.metrics("spills").value }
      assert(spills.sum > 0, s"expected spills, metric values: $spills")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(TopKPerKey.SpillKeysConf, v)
        case None => spark.conf.unset(TopKPerKey.SpillKeysConf)
      }
    }
  }

  test("byte-budget spill: at the SAME key count, wide rows spill and " +
      "narrow rows don't (width, not row count, drives the threshold) " +
      "and the wide result stays exact") {
    val prev = spark.conf.getOption(TopKPerKey.SpillBytesConf)
    spark.conf.set(TopKPerKey.SpillBytesConf, (256 * 1024).toString)
    try {
      // 1000 keys × top-2: narrow rows hold ~100 KB (< budget, no
      // spill); the same rows padded to ~1 KB each hold ~2 MB (> budget,
      // must spill). A key-count threshold cannot tell these apart.
      def run(pad: org.apache.spark.sql.Column): (Set[(Long, Long)], Long) = {
        val df = spark.range(4000).coalesce(1)
          .select((col("id") % 1000).as("k"), col("id").as("id"),
            (col("id") * 1.0).as("v"), pad.as("pad"))
        val out = TopKPerKey(df, "k", Seq(("v", true), ("id", false)), 2)
        val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        def collectNodes(p: SparkPlan): Seq[SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            q +: collectNodes(q.plan)
          case _ => p +: p.children.flatMap(collectNodes)
        }
        val spills = collectNodes(out.queryExecution.executedPlan)
          .collect { case t: TopKPerKeyExec => t.metrics("spills").value }
          .sum
        (got, spills)
      }
      val (narrowGot, narrowSpills) = run(lit(0L))
      val (wideGot, wideSpills) = run(repeat(lit("x"), 1024))
      // v = id, so top-2 per key are the two largest ids: 2000..3999
      val want = (2000L until 4000L).map(id => (id % 1000, id)).toSet
      assert(narrowGot == want && wideGot == want)
      assert(narrowSpills == 0,
        s"narrow rows under the byte budget spilled $narrowSpills times")
      assert(wideSpills > 0, "wide rows over the byte budget never spilled")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(TopKPerKey.SpillBytesConf, v)
        case None => spark.conf.unset(TopKPerKey.SpillBytesConf)
      }
    }
  }

  test("TopKPushdown rule: a key-only predicate sinks through the " +
      "custom node into the scan's PushedFilters; a value predicate " +
      "must not") {
    val orders = graft.engine.Tables(spark, "/root/testdata/sf0.001",
        "orders")
      .select(col("o_custkey").as("k"), col("o_orderkey").as("id"),
        col("o_totalprice").as("v"))
    def pushedFilters(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      "PushedFilters: \\[[^\\]]*\\]".r
        .findAllIn(df.queryExecution.executedPlan.toString).mkString(" ")
    }
    val keyFiltered = TopKPerKey(orders, "k",
      Seq(("v", true), ("id", false)), 3).filter(col("k") < 100)
    val pf = pushedFilters(keyFiltered)
    assert(pf.contains("LessThan(o_custkey,100)"),
      s"key predicate not pushed into the scan: $pf")
    // and the pushed plan returns exactly the window form's answer
    val expect = windowForm(orders, 3).filter(_._1 < 100)
    val got = keyFiltered.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect)
    // a VALUE predicate would change who competes for the k slots —
    // it must stay above the node (no totalprice filter in the scan)
    val valFiltered = TopKPerKey(orders, "k",
      Seq(("v", true), ("id", false)), 3).filter(col("v") > 1000.0)
    val pfv = pushedFilters(valFiltered)
    assert(!pfv.contains("o_totalprice"),
      s"value predicate unsoundly pushed below top-k: $pfv")
    val expectV = windowForm(orders, 3).filter(_._3 > 1000.0)
    val gotV = valFiltered.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gotV == expectV)
  }
}
