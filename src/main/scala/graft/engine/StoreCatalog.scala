package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
import org.apache.spark.sql.catalyst.plans.logical.{ColumnDefinition,
  CreateTable, CreateTableAsSelect, LogicalPlan, UnresolvedTableSpec}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}

/** A mutable name → store registry rooted at a base path — the piece a
  * SQL-ONLY session needs on top of [[StoreSql]]: `CREATE TABLE` and
  * `CREATE TABLE ... AS SELECT` construct and register
  * [[ManifestTableStore]]s from Spark's own parsed DDL, so an operator
  * can create, load (INSERT), maintain (OPTIMIZE/VACUUM), and query a
  * store with zero API calls. Every other statement delegates to
  * [[StoreSql.exec]] / [[StoreSql.query]] against the current registry.
  *
  * Store physical options travel as TBLPROPERTIES (the Delta/Iceberg
  * convention for table-format knobs):
  *
  *   CREATE TABLE t (k STRING, n INT, CONSTRAINT pos CHECK (n > 0))
  *   USING graft_store
  *   PARTITIONED BY (k)
  *   TBLPROPERTIES ('statsColumns'='n', 'bloomColumns'='k',
  *                  'morDeleteKey'='k')
  *
  * `location` overrides the default `basePath/<name>` path. Declared
  * CHECK constraints register at create time (Spark 4 parses them
  * natively). `CREATE TABLE` commits the declared schema as a zero-row
  * version-1 marker ([[ManifestTableStore.createEmpty]]), so the empty
  * table is immediately readable and INSERT's positional mapping has a
  * target; CTAS appends the routed SELECT (which may read other
  * registered stores, time travel included) as batch `batchId` —
  * required explicitly, like every committing statement in StoreSql.
  * `IF NOT EXISTS` on an existing table is a registering no-op.
  */
final class StoreCatalog(basePath: String) {

  private val reg =
    new scala.collection.concurrent.TrieMap[String, ManifestTableStore]()

  /** Register an externally-constructed store under a name. */
  def register(name: String, store: ManifestTableStore): this.type = {
    reg.put(name, store); this
  }

  /** The current registry as the immutable map [[StoreSql]] takes. */
  def tables: Map[String, ManifestTableStore] = reg.toMap

  def store(name: String): ManifestTableStore =
    reg.getOrElse(name, throw new IllegalArgumentException(
      s"unknown table '$name' (known: ${reg.keys.mkString(", ")})"))

  /** Execute one statement: CREATE TABLE / CTAS are handled here;
    * everything else — DML, DDL, maintenance, including statements
    * Spark's parser rejects (OPTIMIZE/VACUUM) — delegates to
    * [[StoreSql.exec]] with the current registry.
    */
  def exec(spark: SparkSession, sql: String,
      batchId: Option[Long] = None): DataFrame = {
    val parsed: Option[LogicalPlan] =
      try Some(spark.sessionState.sqlParser.parsePlan(sql))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    parsed match {
      case Some(ct: CreateTable) =>
        val name = identOf(ct.name)
        existing(spark, name, ct.partitioning, ct.tableSpec,
            ct.ignoreIfExists) match {
          case Some(_) => // IF NOT EXISTS: keep the existing table
          case None =>
            val (path, pb, props) =
              physical(name, ct.partitioning, ct.tableSpec)
            validateProps(ct.columns.map(_.name), pb, props)
            val store = mk(path, pb, props)
            // spec + name pointer publish BEFORE the first commit: a
            // crash between commit and sidecar must not leave a table
            // that re-attaches spec-less (silently stripped
            // partitioning/properties). A crashed EARLIER create (spec
            // published, zero committed versions — exactly the case
            // where `existing` returned None) left a sidecar that may
            // disagree with THIS declaration; republish, don't let a
            // stale spec win the create-if-absent race.
            clearStaleSidecars(spark, name, path)
            persistSpec(spark, path, pb, props)
            persistPointer(spark, name, path)
            store.createEmpty(spark, StructType(ct.columns.map {
              c: ColumnDefinition =>
                StructField(c.name, c.dataType, c.nullable)
            }))
            checksOf(ct.tableSpec).foreach { case (n, pred) =>
              store.addCheck(spark, n, pred) }
            reg.put(name, store)
        }
        spark.emptyDataFrame
      case Some(ctas: CreateTableAsSelect) =>
        val name = identOf(ctas.name)
        existing(spark, name, ctas.partitioning, ctas.tableSpec,
            ctas.ignoreIfExists) match {
          case Some(_) =>
          case None =>
            val (path, pb, props) =
              physical(name, ctas.partitioning, ctas.tableSpec)
            val store = mk(path, pb, props)
            val bid = batchId.getOrElse(
              throw new IllegalArgumentException(
                "CTAS requires an explicit batchId: the loaded rows " +
                  "commit under it, exactly like INSERT"))
            // building the frame is cheap (lazy) and yields the CTAS
            // schema the TBLPROPERTIES must name columns of
            val df = org.apache.spark.sql.graftshim.PlanShim.ofRows(
              spark, StoreSql.route(spark, tables, ctas.query))
            validateProps(df.columns.toSeq, pb, props)
            // spec + pointer BEFORE the (long) load — see CREATE above,
            // including the stale-sidecar republish
            clearStaleSidecars(spark, name, path)
            persistSpec(spark, path, pb, props)
            persistPointer(spark, name, path)
            // checks BEFORE the load: the batch passes the same
            // write-time gate every later INSERT will
            checksOf(ctas.tableSpec).foreach { case (n, pred) =>
              store.addCheck(spark, n, pred) }
            store.append(df, bid)
            reg.put(name, store)
        }
        spark.emptyDataFrame
      case Some(dt: org.apache.spark.sql.catalyst.plans.logical
          .DropTable) =>
        // DROP TABLE [IF EXISTS] — the lifecycle's other end:
        // unregister and delete the table root (manifest chain, data,
        // tags, checks, spec sidecar). Unlike vacuum this is the
        // explicit, named destruction of the WHOLE table; the atomic
        // unit is the directory.
        val name = dt.child match {
          case u: UnresolvedIdentifier if u.nameParts.size == 1 =>
            u.nameParts.head
          case other => throw new IllegalArgumentException(
            s"unsupported DROP TABLE name: $other")
        }
        require(name != "_catalog",
          "'_catalog' is reserved: it is the catalog's own " +
            "name-pointer directory and holds every custom-LOCATION " +
            "table's pointer")
        val known = reg.get(name).map(_.tablePath)
          .orElse(readPointer(spark, name))
          .orElse {
            val p = s"$basePath/$name"
            val hp = new org.apache.hadoop.fs.Path(p)
            val f = hp.getFileSystem(
              spark.sparkContext.hadoopConfiguration)
            if (f.exists(hp)) Some(p) else None
          }
        known match {
          case Some(p) =>
            val hp = new org.apache.hadoop.fs.Path(p)
            val f = hp.getFileSystem(
              spark.sparkContext.hadoopConfiguration)
            // recursive delete ONLY with evidence the directory is a
            // graft table — a manifest chain, branches, or at least the
            // creation spec (a crashed pre-first-commit CREATE). A bare
            // name collision with an unrelated directory under basePath
            // must never wipe it.
            require(!f.exists(hp) ||
              Seq("manifest", "branches", "table_spec").exists(s =>
                f.exists(new org.apache.hadoop.fs.Path(hp, s))),
              s"refusing DROP TABLE '$name': $p exists but carries no " +
                "manifest/branches/table_spec — not a graft table " +
                "(name collision?); delete it manually if intended")
            f.delete(hp, true)
            f.delete(new org.apache.hadoop.fs.Path(
              s"$basePath/_catalog/$name"), false)
            reg.remove(name)
          case None =>
            require(dt.ifExists, s"unknown table '$name' " +
              "(use DROP TABLE IF EXISTS; note: a custom-LOCATION " +
              "table created before name pointers must be dropped " +
              "from the catalog that registered it)")
        }
        spark.emptyDataFrame
      case _ => StoreSql.exec(spark, tables, sql, batchId)
    }
  }

  /** Read-side SQL (time travel included) against the registry. */
  def query(spark: SparkSession, sql: String): DataFrame =
    StoreSql.query(spark, tables, sql)

  /** The already-present store for `name` — registered in THIS catalog
    * OR committed on disk at its path (a table survives the session
    * that created it; a fresh catalog's `IF NOT EXISTS` must see it
    * and must not clobber it) — or None when creation should proceed.
    * An on-disk table re-attaches FROM ITS PERSISTED SPEC (the
    * creation-time partitioning/properties sidecar), never from the
    * re-attaching statement's spec: a bare `CREATE TABLE IF NOT
    * EXISTS t (...)` must not silently strip the original
    * partitioning, stats columns, or merge-on-read key. Refuses
    * (Delta's TABLE_OR_VIEW_ALREADY_EXISTS shape) when the table
    * exists and IF NOT EXISTS was not given — a refused CREATE has no
    * side effects, so registration is SKIPPED on refusal; only the
    * IF-NOT-EXISTS re-attach registers.
    */
  private def existing(spark: SparkSession, name: String,
      partitioning: Seq[Transform],
      tableSpec: org.apache.spark.sql.catalyst.plans.logical
        .TableSpecBase,
      ignoreIfExists: Boolean): Option[ManifestTableStore] = {
    val present = reg.get(name).orElse {
      val (declaredPath, pb, props) =
        physical(name, partitioning, tableSpec)
      // a custom-LOCATION table re-attaches through its name pointer
      // even when the re-attaching statement omits LOCATION
      val path =
        if (declaredPath != s"$basePath/$name") declaredPath
        else readPointer(spark, name).getOrElse(declaredPath)
      val (epb, eprops) = loadSpec(spark, path).getOrElse((pb, props))
      val onDisk = mk(path, epb, eprops)
      if (onDisk.currentVersion(spark) > 0) Some(onDisk) else None
    }
    present.foreach { s =>
      require(ignoreIfExists,
        s"table '$name' already exists (use IF NOT EXISTS)")
      reg.put(name, s)
    }
    present
  }

  /** Persist the creation-time physical spec beside the table (atomic
    * create-if-absent) — what [[existing]] re-attaches from.
    */
  private def persistSpec(spark: SparkSession, path: String,
      partitionBy: Seq[String], props: Map[String, String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val pb = root.putArray("partitionBy")
    partitionBy.foreach(pb.add)
    Seq("statsColumns", "bloomColumns", "morDeleteKey")
      .foreach(k => props.get(k).foreach(v => root.put(k, v)))
    val hp = new org.apache.hadoop.fs.Path(path, "table_spec")
    AtomicCreate.publish(
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp,
      mapper.writeValueAsString(root).getBytes("UTF-8"))
  }

  /** Durable name → path pointer under `basePath/_catalog/` so a
    * custom-LOCATION table stays addressable (IF NOT EXISTS re-attach,
    * DROP TABLE) from catalogs that did not create it.
    */
  private def persistPointer(spark: SparkSession, name: String,
      path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(s"$basePath/_catalog/$name")
    AtomicCreate.publish(
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp,
      path.getBytes("UTF-8"))
  }

  private def readPointer(spark: SparkSession,
      name: String): Option[String] = {
    val hp = new org.apache.hadoop.fs.Path(s"$basePath/_catalog/$name")
    val f = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(hp)) return None
    val in = f.open(hp)
    try {
      val buf = new Array[Byte](f.getFileStatus(hp).getLen.toInt)
      in.readFully(buf); Some(new String(buf, "UTF-8").trim)
    } finally in.close()
  }

  private def loadSpec(spark: SparkSession, path: String)
      : Option[(Seq[String], Map[String, String])] = {
    val hp = new org.apache.hadoop.fs.Path(path, "table_spec")
    val f = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(hp)) return None
    val in = f.open(hp)
    val text =
      try {
        val buf = new Array[Byte](f.getFileStatus(hp).getLen.toInt)
        in.readFully(buf); new String(buf, "UTF-8")
      } finally in.close()
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(text)
    val pb = Option(root.get("partitionBy")).toSeq
      .flatMap(n => (0 until n.size()).map(n.get(_).asText()))
    val props = Seq("statsColumns", "bloomColumns", "morDeleteKey")
      .flatMap(k => Option(root.get(k)).map(k -> _.asText())).toMap
    Some((pb, props))
  }

  private def identOf(name: LogicalPlan): String = name match {
    case u: UnresolvedIdentifier =>
      require(u.nameParts.size == 1,
        s"store tables are single-part names, got " +
          u.nameParts.mkString("."))
      require(u.nameParts.head != "_catalog",
        "'_catalog' is reserved: it is the catalog's own name-pointer " +
          "directory")
      u.nameParts.head
    case other => throw new IllegalArgumentException(
      s"unsupported CREATE TABLE name: $other")
  }

  /** Refuse TBLPROPERTIES whose store knobs name columns the table does
    * not declare — a typo'd `statsColumns` would otherwise silently
    * collect no stats and the table would never prune.
    */
  private def validateProps(declared: Seq[String],
      partitionBy: Seq[String], props: Map[String, String]): Unit = {
    def known(c: String) =
      declared.exists(_.equalsIgnoreCase(c))
    partitionBy.foreach(c => require(known(c),
      s"PARTITIONED BY column '$c' is not among the declared columns " +
        s"(${declared.mkString(", ")})"))
    Seq("statsColumns", "bloomColumns").foreach { k =>
      props.get(k).toSeq.flatMap(_.split(",")).map(_.trim)
        .filter(_.nonEmpty).foreach(c => require(known(c),
          s"TBLPROPERTIES $k names column '$c' which the table does " +
            s"not declare (${declared.mkString(", ")}); stats/bloom on " +
            "a missing column would silently never prune"))
    }
    props.get("morDeleteKey").map(_.trim).filter(_.nonEmpty)
      .foreach(c => require(known(c),
        s"TBLPROPERTIES morDeleteKey names column '$c' which the " +
          s"table does not declare (${declared.mkString(", ")})"))
  }

  /** Delete the spec + pointer sidecars of a table that has ZERO
    * committed versions — the crash window of an earlier CREATE/CTAS
    * (sidecars published, first commit never landed). The caller is
    * about to republish from ITS declaration; the stale sidecar must
    * not win the create-if-absent publish and silently re-attach later
    * sessions with the dead create's partitioning/properties.
    */
  private def clearStaleSidecars(spark: SparkSession, name: String,
      path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val spec = new org.apache.hadoop.fs.Path(path, "table_spec")
    val sf = spec.getFileSystem(conf)
    if (sf.exists(spec)) sf.delete(spec, false)
    val ptr = new org.apache.hadoop.fs.Path(s"$basePath/_catalog/$name")
    val pf = ptr.getFileSystem(conf)
    if (pf.exists(ptr)) pf.delete(ptr, false)
  }

  /** (path, partitionBy, store props) as a CREATE statement declares
    * them — the spec [[persistSpec]] records and [[mk]] instantiates.
    */
  private def physical(name: String, partitioning: Seq[Transform],
      tableSpec: org.apache.spark.sql.catalyst.plans.logical
        .TableSpecBase): (String, Seq[String], Map[String, String]) = {
    val partitionBy = partitioning.map { t =>
      // structural match on the connector Transform interface (the
      // case classes are private[sql]): identity over one column
      require(t.name == "identity" && t.references.length == 1 &&
        t.references.head.fieldNames.length == 1,
        s"only PARTITIONED BY (column) is supported, got $t")
      t.references.head.fieldNames.head
    }
    val (props, location) = tableSpec match {
      case u: UnresolvedTableSpec => (u.properties, u.location)
      case other => (Map.empty[String, String], None)
    }
    (location.getOrElse(s"$basePath/$name"), partitionBy, props)
  }

  private def mk(path: String, partitionBy: Seq[String],
      props: Map[String, String]): ManifestTableStore = {
    def csv(key: String): Seq[String] = props.get(key).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    new ManifestTableStore(path,
      partitionBy = partitionBy,
      statsColumns = csv("statsColumns"),
      bloomColumns = csv("bloomColumns"),
      morDeleteKey = props.get("morDeleteKey"))
  }

  private def checksOf(tableSpec: org.apache.spark.sql.catalyst.plans
      .logical.TableSpecBase): Seq[(String, String)] = tableSpec match {
    case u: UnresolvedTableSpec =>
      u.constraints.zipWithIndex.collect {
        case (c: org.apache.spark.sql.catalyst.expressions
            .CheckConstraint, i) =>
          (Option(c.userProvidedName).getOrElse(s"check-$i"),
            c.condition)
      }
    case _ => Nil
  }
}
