package graft.engine

/** Schema-inference job entry (reference entry point A,
  * `scripts/schema_inferer.py:274-279` / SURVEY §3.1): loop over
  * governance passes with a sleep interval; interval <= 0 runs once.
  *
  * Usage: `runMain graft.engine.SchemaInferJob <bronzeRoot> <schemaRoot>
  * [loopIntervalSec]`
  */
object SchemaInferJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: SchemaInferJob <bronzeRoot> <schemaRoot> [loopIntervalSec]")
    val Seq(bronzeRoot, schemaRoot) = args.take(2).toSeq
    val loopSec = args.lift(2).map(_.toInt).getOrElse(0)
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "graft-schema-infer")
    val registry = new SchemaRegistry(spark, bronzeRoot, schemaRoot)
    var continue = true
    while (continue) {
      registry.runOnce().foreach {
        case SchemaRegistry.Skipped(t, r) => println(s"[SKIP] $t: $r")
        case SchemaRegistry.Updated(t, h) => println(s"[OK] $t: schema updated ($h)")
        case SchemaRegistry.Unchanged(t, h) => println(s"[OK] $t: schema unchanged ($h)")
        case SchemaRegistry.Failed(t, r) => println(s"[FAIL] $t: $r")
      }
      if (loopSec <= 0) continue = false
      else Thread.sleep(loopSec * 1000L)
    }
    spark.stop()
  }
}
