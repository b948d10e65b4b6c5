package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The replay-stability law, run exactly the way the round driver runs
  * queries: every store-tier QueryDef fn invoked TWICE in one JVM, in a
  * session that sets NEITHER `graft.state.fresh` NOR `graft.state.warm`,
  * over whatever keyed state the first invocation leaves behind — the
  * two results must be identical (schema + sorted rows).
  *
  * This is the law rounds 15 and 16 failed at the driver's gate while
  * every fresh-state reproduction passed: the gate replays persisted
  * keyed state, and batch-id idempotency keeps replayed CONTENT
  * convergent but cannot stabilize VERSION ARITHMETIC — non-batch-id
  * DML (DELETE/UPDATE/REFRESH) mints new versions per replay, so
  * queries pinning state-history literals (`'incremental@2..3'`,
  * commit counts, `VERSION AS OF <n>`) diverged on every second
  * invocation. `Materialize.freshKeyedPath` (per-invocation reset)
  * removes replay from those queries' universe; this suite pins that
  * for EVERY query in the store tier, so any future QueryDef that
  * accidentally pins history over replayed `keyedPath` state fails
  * here before the driver sees it.
  */
class ReplayStabilitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def snapshot(df: DataFrame): (String, Seq[String]) =
    (df.schema.treeString, df.collect().map(_.toString).sorted.toSeq)

  (graft.ops.StoreOps.defs ++ graft.ops.SqlSurface.defs).foreach { d =>
    test(s"${d.name}: two invocations in one JVM over surviving state " +
        "are identical") {
      assert(!spark.conf.getOption("graft.state.fresh").exists(_ == "1"),
        "this suite must run the driver's configuration (no fresh mode)")
      val first = snapshot(d.build(spark, dir))
      val second = snapshot(d.build(spark, dir))
      assert(second._1 == first._1, s"${d.name}: schema drifted on replay")
      assert(second._2 == first._2,
        s"${d.name}: rows drifted on second invocation — " +
          "a state-history pin is exposed to replayed keyed state; " +
          "route its store through Materialize.freshKeyedPath")
    }
  }
}
