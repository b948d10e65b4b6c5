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
  *   - data files land under `data/<name>-<uuid>/` — INVISIBLE to
  *     readers until published (a crash mid-write leaves an orphan dir,
  *     never a partial table);
  *   - table state is a VERSIONED manifest (`manifest/v<N>`, highest N
  *     wins — Iceberg's metadata-versioning shape): each version lists
  *     every (batchId, dataDir) pair, and EVERY state change — append or
  *     compaction — is one tmp-write + one atomic rename of the next
  *     version file. Readers always see a complete, consistent version;
  *   - a replayed micro-batch (crash between write and checkpoint
  *     commit, then restart) finds its batch id in the current version
  *     and becomes a NO-OP: exactly-once lands at WRITE time, with no
  *     read-side dedup needed — and because versions carry batch ids
  *     forward, that guarantee SURVIVES compaction;
  *   - [[compact]] rewrites all committed data as one dir (the
  *     small-files maintenance every streaming parquet table needs — a
  *     30 s trigger writes ~3k dirs/day) and commits it as the next
  *     version. Superseded dirs stay on disk for in-flight readers;
  *     vacuuming them after a grace period is a trivial dir diff;
  *   - optional `partitionBy` lays data out hive-style so reader
  *     predicates on partition columns prune directories — the same scan
  *     reduction a table format's partition spec gives (asserted against
  *     the executed plan's PartitionFilters in the spec);
  *   - readers see exactly the current version's dirs, with mergeSchema
  *     for governed evolution.
  *
  * Time travel ([[readVersion]]) and garbage collection ([[vacuum]])
  * fall out of the versioned design. What a real Iceberg commit still
  * adds: concurrent-writer conflict detection (here serialized per-JVM)
  * and file-level statistics pruning. The commit/visibility/idempotence
  * semantics — the parts the reference pipeline actually relies on —
  * are faithful.
  */
final class ManifestTableStore(path: String,
    partitionBy: Seq[String] = Nil) extends TableStore {
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}
  import org.apache.spark.sql.functions._

  private def fs(spark: SparkSession): FileSystem =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir = new HPath(s"$path/manifest")

  /** (version, lines) of the current manifest; (0, empty) for a new table. */
  private def current(f: FileSystem): (Long, Seq[(Long, String)]) = {
    if (!f.exists(manifestDir)) return (0L, Nil)
    val versions = f.listStatus(manifestDir)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") => n.drop(1).toLong }
    if (versions.isEmpty) return (0L, Nil)
    val v = versions.max
    (v, readManifest(f, v))
  }

  private def readManifest(f: FileSystem, version: Long): Seq[(Long, String)] = {
    val st = f.getFileStatus(new HPath(manifestDir, s"v$version"))
    val in = f.open(st.getPath)
    val text = try {
      val buf = new Array[Byte](st.getLen.toInt)
      in.readFully(buf); new String(buf, "UTF-8")
    } finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { l =>
      val Array(id, dir) = l.split("\t", 2)
      (id.toLong, dir)
    }.toSeq
  }

  /** Tmp-write + atomic rename of `manifest/v<next>` — THE commit point
    * for every state change.
    */
  private def commit(f: FileSystem, next: Long,
      lines: Seq[(Long, String)]): Unit = {
    val tmp = new HPath(manifestDir, s".v$next.tmp")
    f.mkdirs(manifestDir)
    val out = f.create(tmp, true)
    try out.write(lines.map { case (id, d) => s"$id\t$d" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, new HPath(manifestDir, s"v$next")))
      throw new IllegalStateException(s"commit rename failed for v$next")
  }

  private def write(df: DataFrame, dir: String): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dir)
  }

  override def append(df: DataFrame, batchId: Long): Unit = synchronized {
    val f = fs(df.sparkSession)
    val (v, lines) = current(f)
    if (lines.exists(_._1 == batchId)) return // replay → idempotent no-op
    val dataDir = s"$path/data/batch-$batchId-${java.util.UUID.randomUUID()}"
    write(df.withColumn("batch_id", lit(batchId)), dataDir)
    commit(f, v + 1, lines :+ (batchId -> dataDir))
  }

  /** Rewrite every committed row into ONE data dir and commit it as the
    * next version, carrying all batch ids forward (replay detection and
    * `readExactlyOnce` survive: batch_id is a data column). No-op on a
    * table that is already one dir.
    */
  def compact(spark: SparkSession): Unit = synchronized {
    val f = fs(spark)
    val (v, lines) = current(f)
    if (lines.map(_._2).distinct.size <= 1) return
    val dataDir = s"$path/data/compact-${java.util.UUID.randomUUID()}"
    write(read(spark), dataDir) // per-dir union: partition-layout safe
    commit(f, v + 1, lines.map { case (id, _) => (id, dataDir) })
  }

  /** Read the table AS OF a specific manifest version — time travel,
    * which the versioned manifest gives for free (version files are
    * immutable once renamed in; superseded data dirs remain until
    * [[vacuum]]).
    */
  def readVersion(spark: SparkSession, version: Long): DataFrame = {
    val dirs = readManifest(fs(spark), version).map(_._2).distinct
    require(dirs.nonEmpty, s"version $version of $path is empty")
    dirs.map(d => spark.read.option("mergeSchema", "true").parquet(d))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Current manifest version (0 = no commits yet). */
  def currentVersion(spark: SparkSession): Long = current(fs(spark))._1

  /** Delete data dirs referenced by NO manifest version up to and
    * including `retainBefore` versions back from current, plus all
    * superseded manifest versions older than that horizon. Keeping a
    * horizon > 0 protects in-flight readers of recent versions; 0
    * retains only the current version's dirs. Returns deleted paths.
    */
  def vacuum(spark: SparkSession, retainLast: Int = 1): Seq[String] =
    synchronized {
      val f = fs(spark)
      val (v, _) = current(f)
      if (v == 0) return Nil
      val keepVersions = math.max(1L, v - retainLast) to v
      // data dir NAMES are unique (uuid-suffixed), so retention compares
      // the last path segment — robust to qualified-URI vs raw-path forms
      val referenced = keepVersions.flatMap(kv =>
        readManifest(f, kv).map(_._2.split('/').last)).toSet
      val dataRoot = new HPath(s"$path/data")
      val deleted = Seq.newBuilder[String]
      if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { st =>
        if (!referenced.contains(st.getPath.getName)) {
          f.delete(st.getPath, true); deleted += st.getPath.toString
        }
      }
      f.listStatus(manifestDir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("v") && n.drop(1).toLong < keepVersions.min)
          f.delete(st.getPath, false)
      }
      deleted.result()
    }

  /** Exactly the current version's data dirs, unioned by name with
    * missing-column padding (governed evolution across batches). Each dir
    * is read separately: hive-style partition discovery only accepts
    * `k=v` segments directly under one root, so a multi-root read of
    * partitioned batch dirs is structurally "conflicting" — per-dir scans
    * sidestep that, and predicate/partition pruning pushes into every
    * scan of the union. Many tiny batch dirs widen the plan linearly;
    * that is exactly the pressure [[compact]] relieves.
    */
  override def read(spark: SparkSession): DataFrame = {
    val (_, lines) = current(fs(spark))
    require(lines.nonEmpty, s"no committed batches under $path")
    lines.map(_._2).distinct
      .map(d => spark.read.option("mergeSchema", "true").parquet(d))
      .reduce(_.unionByName(_, allowMissingColumns = true))
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
