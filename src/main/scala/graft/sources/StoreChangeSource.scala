package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftshim.PlanShim
import org.apache.spark.sql.sources.{DataSourceRegister,
  StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.engine.ManifestTableStore

/** The manifest store as a STRUCTURED STREAMING SOURCE — Delta's
  * streaming-source shape (`spark.readStream.format("delta")`): follow
  * a table's commits as micro-batches, offset = manifest version, with
  * the engine's checkpoint making resumption exactly-once.
  *
  *   spark.readStream.format("graft-store")
  *     .option("path", tablePath)          // required
  *     .option("readChangeFeed", "true")   // optional: full CDF rows
  *     .load()
  *
  * Default mode streams INSERTS (batch-id attributed `readChanges` —
  * Delta's default, which also means pure maintenance rewrites emit
  * nothing and a compacted table never re-delivers old rows);
  * `readChangeFeed=true` streams the full feed with `_change_type`
  * insert/delete rows, Delta's own CDF-streaming option, so a
  * downstream sync consumes RETIREMENTS too. Each micro-batch is the
  * version-pinned window (lastCommitted, currentVersion] — replaying a
  * checkpointed window re-reads the same manifests and produces the
  * same rows, which is what makes sink-side dedup/replay-refusal
  * compose into end-to-end exactly-once.
  *
  * Scale shape: `getOffset` is one manifest-dir listing; a batch reads
  * only the dirs its window's batch ids (or changed dirs) touch —
  * exactly the incremental cost a 100 TB table demands from a tailer.
  */
final class StoreChangeSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-store"

  private def storeOf(parameters: Map[String, String]) =
    new ManifestTableStore(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-store source requires option 'path'")))

  private def cdf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val base = schema.getOrElse(
      storeOf(parameters).read(sqlContext.sparkSession).schema)
    val full =
      if (cdf(parameters) && !base.fieldNames.contains("_change_type"))
        StructType(base.fields :+
          StructField("_change_type", StringType, nullable = false))
      else base
    (shortName(), full)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new StoreChangeSource(sqlContext.sparkSession,
      storeOf(parameters),
      sourceSchema(sqlContext, schema, providerName, parameters)._2,
      cdf(parameters))
}

final class StoreChangeSource(spark: SparkSession,
    store: ManifestTableStore, override val schema: StructType,
    cdf: Boolean) extends Source {

  import org.apache.spark.sql.execution.streaming.runtime.LongOffset

  override def getOffset: Option[Offset] = {
    val v = store.currentVersion(spark)
    if (v == 0L) None else Some(LongOffset(v))
  }

  private def version(o: Offset): Long = o.json.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(version).getOrElse(0L)
    val to = version(end)
    val raw =
      if (cdf) store.readChangeFeed(spark, from, to)
      else store.readChanges(spark, from, to)
    // pin the window's rows to the DECLARED source schema (evolution
    // between versions may add columns mid-stream; missing ones pad
    // null, exactly like the store's own union-by-name read)
    val aligned = raw.select(schema.fields.map { f =>
      (if (raw.columns.contains(f.name)) col(f.name)
      else lit(null)).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    PlanShim.asStreaming(spark, aligned)
  }

  override def stop(): Unit = ()
}
