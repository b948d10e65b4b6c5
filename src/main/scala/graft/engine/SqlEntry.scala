package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's SQL front door.
  *
  * The reference promises its silver table is "immediately queryable by
  * Spark, Trino, or BI tools" (reference README.md:42) — i.e. the
  * user-facing query surface is SQL text against registered tables, not
  * a programmatic DataFrame API. This object closes that contract:
  * [[registerViews]] publishes every corpus table as a session temp view
  * (plus the engine's custom SQL functions — vec_dot, minhash_text,
  * char_ngrams, … — so SQL users get the extension surface too), and
  * [[sql]] runs arbitrary Spark SQL text over them.
  *
  * Temp views are metadata-only: each query still compiles to the same
  * Catalyst plan the DataFrame API produces (scan + pushed filters +
  * pruned columns), so the SQL surface costs nothing at any scale. On a
  * real deployment the same registration would target the session
  * catalog (`CREATE TABLE ... USING parquet LOCATION ...`) or the
  * manifest store's tables; temp views are the offline stand-in.
  */
object SqlEntry {

  /** Publish all corpus tables as temp views + register the engine's SQL
    * function extensions. Idempotent — safe to call per query — and
    * cached per (session, dir): re-registering re-reads ten parquet
    * footers for schemas, which costs more than a whole gold query when
    * done per call.
    */
  def registerViews(s: SparkSession, dir: String): Unit = {
    val key = "graft.sql.viewsRegisteredFor"
    if (!s.conf.getOption(key).contains(dir)) {
      Tables.names.foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))
      graft.functions.VectorExpressions.register(s)
      s.conf.set(key, dir)
    }
  }

  /** Run SQL text against the registered corpus views. */
  def sql(s: SparkSession, dir: String, text: String): DataFrame = {
    registerViews(s, dir)
    s.sql(text)
  }
}
