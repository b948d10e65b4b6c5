package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ORC round-trip through the engine: every offline-available columnar
  * format (parquet via Tables everywhere, ORC here) reads back
  * identically and pushes predicates into the scan.
  */
class OrcFormatSpec extends SparkSpec {

  test("ORC round-trips the documents table and pushes filters + " +
      "projection into the scan") {
    val dir = Files.createTempDirectory("orc-fmt-")
    dir.toFile.deleteOnExit()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").orc(dir.toString)
    val back = spark.read.orc(dir.toString)
    // content identical
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "lang").orderBy("doc_id").collect().toSeq
    val b = back.select("doc_id", "lang").orderBy("doc_id").collect().toSeq
    assert(a == b)
    // pushdown engages like parquet
    val q = back.filter(col("doc_id") < 10).select("doc_id", "n_chars")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.metadata("PushedFilters").contains("LessThan"),
      s"no pushed filter: ${scan.metadata("PushedFilters")}")
    assert(scan.schema.fieldNames.toSet.subsetOf(Set("doc_id", "n_chars")),
      s"projection not pruned: ${scan.schema.fieldNames.toSeq}")
  }
}
