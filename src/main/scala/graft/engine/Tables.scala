package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Reads the driver's parquet tables (TESTDATA.md). All reads go through
  * here so pushdown-relevant options stay in one place.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
  * natively; sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
  * (see Sessions/Verify/Bench) and this reader converts the nano count to
  * a microsecond TimestampType column.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
