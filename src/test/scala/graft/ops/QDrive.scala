package graft.ops

import java.nio.file.{Files, Paths}

import graft.SparkEntry
import graft.engine.Sessions

/** Scratch driver: dump a SUBSET of queries + their oracle SQL in the same
  * layout as graft.Verify, so tools/check.py can gate just the queries
  * under iteration. Usage: QDrive <sfDir> <outDir> <name> [<name>...]
  */
object QDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSeq
    val spark = Sessions.local(8, "q-drive")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"QDRIVE $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
