package graft.engine

/** Schema-inference job entry (reference entry point A,
  * `scripts/schema_inferer.py:274-279` / SURVEY §3.1): loop over
  * governance passes with a sleep interval; interval <= 0 runs once.
  *
  * Config parity with the reference (`schema_inferer.py:22-35`): every
  * knob is overridable via environment variables using the reference's
  * own names — `BRONZE_ROOT`, `SCHEMA_ROOT`, `MAX_FILES_FOR_INFERENCE`,
  * `SAMPLING_RATIO`, `COUNT_SAMPLE_RECORDS`, `DROP_ALL_NULL_FIELDS`,
  * `LOOP_INTERVAL_SEC`, `CORRUPT_RECORD_COL`, `JSON_MULTILINE` — with
  * CLI args taking precedence over env over defaults.
  *
  * Usage: `runMain graft.engine.SchemaInferJob [bronzeRoot] [schemaRoot]
  * [loopIntervalSec]`
  */
object SchemaInferJob {

  private def env(name: String): Option[String] =
    sys.env.get(name).map(_.trim).filter(_.nonEmpty)

  private def envBool(name: String, default: Boolean): Boolean =
    env(name).map(_.toLowerCase == "true").getOrElse(default)

  /** Resolve the job configuration: CLI > env > code defaults. */
  def resolve(args: Array[String]):
      (String, String, Int, SchemaRegistry.Config) = {
    val bronzeRoot = args.lift(0).orElse(env("BRONZE_ROOT")).getOrElse(
      sys.error("bronze root required: arg 1 or BRONZE_ROOT"))
    val schemaRoot = args.lift(1).orElse(env("SCHEMA_ROOT")).getOrElse(
      sys.error("schema root required: arg 2 or SCHEMA_ROOT"))
    val loopSec = args.lift(2).orElse(env("LOOP_INTERVAL_SEC"))
      .map(_.toInt).getOrElse(0)
    val defaults = SchemaRegistry.Config()
    val config = SchemaRegistry.Config(
      maxFilesForInference = env("MAX_FILES_FOR_INFERENCE").map(_.toInt)
        .getOrElse(defaults.maxFilesForInference),
      samplingRatio = env("SAMPLING_RATIO").map(_.toDouble)
        .getOrElse(defaults.samplingRatio),
      countSampleRecords =
        envBool("COUNT_SAMPLE_RECORDS", defaults.countSampleRecords),
      dropAllNullFields =
        envBool("DROP_ALL_NULL_FIELDS", defaults.dropAllNullFields),
      corruptCol = env("CORRUPT_RECORD_COL").getOrElse(defaults.corruptCol),
      multiLine = envBool("JSON_MULTILINE", defaults.multiLine))
    (bronzeRoot, schemaRoot, loopSec, config)
  }

  def main(args: Array[String]): Unit = {
    val (bronzeRoot, schemaRoot, loopSec, config) = resolve(args)
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "graft-schema-infer")
    val registry = new SchemaRegistry(spark, bronzeRoot, schemaRoot, config)
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
