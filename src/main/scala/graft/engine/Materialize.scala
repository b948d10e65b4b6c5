package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized derived layouts (index artifacts).
  *
  * A production engine builds expensive corpus-derived artifacts — LSH
  * candidate sets, quantization code tables — ONCE at index-build time
  * and serves every downstream query from the artifact; recomputing them
  * per query re-scans the corpus each time (the round-3 bench shape for
  * q47/q74). [[table]] runs the build the first time a (name, corpus)
  * pair is requested in this JVM, persists the result as parquet under a
  * session-unique temp root, and returns a reader over it; later calls
  * reuse the files. Content is deterministic in (name, corpus dir), so
  * reuse never changes results — it only removes repeated corpus passes.
  *
  * Deliberately NOT `persist()`/`cache()`: a pinned cache holds
  * corpus-sized blocks in executor memory for the session's life,
  * per-session; a parquet artifact is columnar, compressed, predicate-
  * pushdown-able, and on a real cluster shareable across sessions via
  * its path (the same role Iceberg gives an index/MV table).
  */
object Materialize {
  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft-mat-")
  private val built = scala.collection.mutable.HashMap.empty[String, String]

  /** Read the materialized artifact `name` for `corpusDir`, building and
    * persisting it first if this JVM has not yet done so.
    */
  def table(s: SparkSession, name: String, corpusDir: String)(
      build: => DataFrame): DataFrame = {
    val path = synchronized {
      built.getOrElseUpdate(s"$name|$corpusDir", {
        val p = root.resolve(s"${built.size}-$name").toString
        build.write.mode("overwrite").parquet(p)
        p
      })
    }
    s.read.parquet(path)
  }
}
