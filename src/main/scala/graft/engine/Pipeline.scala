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
      store: TableStore): Result = {
    val registry = new SchemaRegistry(spark, bronzeRoot, schemaRoot)
    val outcomes = registry.runOnce()
    StreamRunner.runAvailableNow(spark,
      sources.map(s => (s.spec, s.topicDir, s.checkpointDir)), store)
    Result(outcomes, store.read(spark))
  }
}
