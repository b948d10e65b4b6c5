package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Silver-table sink. The reference appends micro-batches to an Iceberg
  * table (`bronze_assets_to_silver_assets.py:275-277`); Iceberg/Delta jars
  * are unavailable offline, so the stand-in is a parquet directory append —
  * same append-only medallion semantics, minus snapshot isolation.
  *
  * Exactly-once caveat (SURVEY §7.4): the streaming checkpoint prevents
  * re-reads, but a crash between the parquet write and checkpoint commit
  * can duplicate a batch. `batch_id` is stamped on every row so a later
  * dedup (max batch_id per key, or drop repeated batch ids) can restore
  * exactly-once — the same recovery contract Iceberg gives via snapshot
  * rollback.
  */
trait TableStore {
  def append(df: DataFrame, batchId: Long): Unit
  def read(spark: SparkSession): DataFrame

  /** Exactly-once read-back over a store that may contain a replayed
    * micro-batch (crash between parquet write and checkpoint commit → the
    * restarted query re-runs the same batch id with recomputed rows, e.g.
    * a fresh `ingest_ts`). One row survives per (batch_id, key): replays
    * collapse because they share the batch id, while identical content
    * legitimately arriving in different batches keeps distinct batch ids.
    * This is the recovery contract `batch_id` is stamped for — the
    * parquet-dir analogue of an Iceberg snapshot rollback.
    */
  def readExactlyOnce(spark: SparkSession,
      keys: Seq[String] = Seq("asset_uid")): DataFrame = {
    val df = read(spark)
    df.dropDuplicates("batch_id" +: keys)
  }
}

/** Manifest-committed parquet table — the closest offline analogue of an
  * Iceberg snapshot commit (reference sink
  * `bronze_assets_to_silver_assets.py:275-277`), built from nothing but
  * Hadoop FS primitives:
  *
  *   - data files land under `data/batch-<id>-<uuid>/` — INVISIBLE to
  *     readers until published (a crash mid-write leaves an orphan dir,
  *     never a partial table);
  *   - publishing is ONE atomic rename of a manifest file naming the data
  *     dir — the same commit point a table format's metadata swap gives;
  *   - a replayed micro-batch (crash between write and checkpoint commit,
  *     then restart) finds its batch id already manifested and becomes a
  *     NO-OP: exactly-once lands at WRITE time, with no read-side dedup
  *     needed;
  *   - readers see exactly the manifested dirs, read with mergeSchema for
  *     governed evolution.
  *
  * What a real Iceberg commit adds beyond this: concurrent-writer
  * conflict detection (here serialized per-JVM), file-level statistics
  * pruning, and time travel. The commit/visibility/idempotence semantics
  * — the parts the reference pipeline actually relies on — are faithful.
  */
final class ManifestTableStore(path: String) extends TableStore {
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}
  import org.apache.spark.sql.functions._

  private def fs(spark: SparkSession): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir = new HPath(s"$path/manifest")
  private def manifest(batchId: Long) =
    new HPath(manifestDir, s"batch-$batchId")

  override def append(df: DataFrame, batchId: Long): Unit = synchronized {
    val spark = df.sparkSession
    val f = fs(spark)
    if (f.exists(manifest(batchId))) return // replay → idempotent no-op
    val dataDir = s"$path/data/batch-$batchId-${java.util.UUID.randomUUID()}"
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").parquet(dataDir)
    // two-step publish: invisible tmp write, then the atomic rename that
    // IS the commit point
    val tmp = new HPath(manifestDir, s".batch-$batchId.tmp")
    f.mkdirs(manifestDir)
    val out = f.create(tmp, true)
    try out.write(dataDir.getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, manifest(batchId)))
      throw new IllegalStateException(s"commit rename failed for batch $batchId")
  }

  /** Exactly the manifested data dirs, mergeSchema for evolution. */
  override def read(spark: SparkSession): DataFrame = {
    val f = fs(spark)
    val dirs = f.listStatus(manifestDir)
      .filterNot(_.getPath.getName.startsWith("."))
      .map { st =>
        val in = f.open(st.getPath)
        try {
          val buf = new Array[Byte](st.getLen.toInt)
          in.readFully(buf); new String(buf, "UTF-8")
        } finally in.close()
      }
    require(dirs.nonEmpty, s"no committed batches under $path")
    spark.read.option("mergeSchema", "true").parquet(dirs.toIndexedSeq: _*)
  }
}

final class ParquetTableStore(path: String) extends TableStore {
  import org.apache.spark.sql.functions._

  /** Appends are serialized per store: concurrent writers into one parquet
    * directory race on the Hadoop committer's shared `_temporary/` staging
    * dir. With a real table format the snapshot commit provides this
    * coordination; the parquet stand-in must do it itself. (Lock is
    * per-JVM — matching local[] mode, where all streaming query threads
    * share this process.)
    */
  override def append(df: DataFrame, batchId: Long): Unit = synchronized {
    df.withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(path)
  }

  /** Read with schema merge across appended batches — the offline
    * stand-in for governed schema evolution (the reference delegates this
    * to Iceberg; SURVEY §2.11 M5): a batch appended with a new column is
    * visible on read-back, older rows null-padded.
    */
  override def read(spark: SparkSession): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
