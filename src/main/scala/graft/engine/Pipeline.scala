package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The composed platform (SURVEY §3.3, rightward of Kafka): bronze JSON
  * directories → schema governance → streaming normalization → one silver
  * store → gold queries.
  *
  * This is the API a user of the reference deploys: the reference runs
  * these as two separate spark-submit jobs; here they are one composable
  * call with the same artifacts (schema/_state folders, checkpointed
  * silver appends).
  */
object Pipeline {

  final case class Source(spec: SourceSpec, topicDir: String, checkpointDir: String)

  final case class Result(
      governance: Seq[SchemaRegistry.Outcome],
      silver: DataFrame)

  /** One full pass: infer/govern schemas for every topic under
    * `bronzeRoot`, drain all bronze sources into the silver store
    * (AvailableNow), and return the silver frame. Idempotent across runs
    * thanks to the mtime watermark (governance) and checkpoints (silver).
    */
  def runOnce(
      spark: SparkSession,
      bronzeRoot: String,
      schemaRoot: String,
      sources: Seq[Source],
      store: TableStore): Result =
    runOnce(spark, bronzeRoot, schemaRoot, sources, store,
      SchemaRegistry.Config())

  /** [[runOnce]] with an explicit governance config — the handle the
    * governed-evolution loop threads `autoMapCanonical` through: drift
    * in a topic re-emits a mapping proposal against the (possibly
    * WIDENED) canonical, a human approves, the silver store takes the
    * governed ADD marker, and the next pass streams with the widened
    * spec — same checkpoints, so the stream RESUMES rather than
    * reprocessing (PipelineSpec pins the full composition).
    */
  def runOnce(
      spark: SparkSession,
      bronzeRoot: String,
      schemaRoot: String,
      sources: Seq[Source],
      store: TableStore,
      config: SchemaRegistry.Config): Result = {
    val registry = new SchemaRegistry(spark, bronzeRoot, schemaRoot,
      config)
    val outcomes = registry.runOnce()
    StreamRunner.runAvailableNow(spark,
      sources.map(s => (s.spec, s.topicDir, s.checkpointDir)), store)
    // a governance-only pass (no sources yet — the onboarding flow's
    // first leg) or a drain that found zero files leaves the silver
    // store empty; the pass itself succeeded, so report an empty
    // frame rather than crash on the read
    val silver =
      try store.read(spark)
      catch {
        case e: IllegalArgumentException
            if e.getMessage != null &&
              e.getMessage.contains("no committed batches") =>
          spark.emptyDataFrame
      }
    Result(outcomes, silver)
  }
}
