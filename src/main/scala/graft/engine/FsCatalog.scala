package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Object-store catalog scan (SURVEY §2.1 S7): topic-directory and
  * recursive file listing over any Hadoop filesystem. The reference does
  * this via a py4j bridge (`schema_inferer.py:45-97`); in Scala these are
  * direct JVM calls.
  *
  * `listFilesRecursive` uses `fs.listFiles(path, recursive=true)` — the
  * object-store-recommended API (one LIST per page rather than a tree
  * walk), which matters when a topic has millions of files.
  */
object FsCatalog {

  final case class FileEntry(path: String, mtime: Long, size: Long)

  private def fsFor(path: String, conf: Configuration): FileSystem =
    new Path(path).getFileSystem(conf)

  def exists(path: String, conf: Configuration): Boolean =
    fsFor(path, conf).exists(new Path(path))

  /** Hidden = Spark/Hadoop convention: `_` or `.` prefix (`_SUCCESS`,
    * `_spark_metadata`, `_state`…).
    */
  def isHiddenName(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  /** Non-hidden child directories (the "topics" of a bronze root). */
  def listDirs(path: String, conf: Configuration): Seq[String] = {
    if (!exists(path, conf)) return Seq.empty
    fsFor(path, conf).listStatus(new Path(path)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.toString.stripSuffix("/"))
      .filterNot(p => isHiddenName(p.split('/').last))
      .map(_ + "/")
  }

  /** All non-hidden files under a directory, recursively, with
    * modification time (ms) and size (bytes).
    */
  def listFilesRecursive(path: String, conf: Configuration): Seq[FileEntry] = {
    if (!exists(path, conf)) return Seq.empty
    val it = fsFor(path, conf).listFiles(new Path(path), true)
    val out = Seq.newBuilder[FileEntry]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (!isHiddenName(name))
        out += FileEntry(st.getPath.toString, st.getModificationTime, st.getLen)
    }
    out.result()
  }
}
