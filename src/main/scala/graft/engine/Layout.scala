package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout tools for the 100 TB case: bucketing for co-located
  * (shuffle-free) joins, and key salting for skew.
  */
object Layout {

  /** Write a frame as a bucketed managed table: rows are hash-partitioned
    * into `buckets` files per partition by `key` and sorted within. Two
    * tables bucketed the same way join WITHOUT an exchange — the plan
    * audit in LayoutSpec asserts zero Exchange nodes. This is the
    * pre-partitioning strategy for repeatedly-joined 100 TB fact tables.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Salted equi-join for skewed keys: the skewed (left) side gets a
    * deterministic salt derived from a high-cardinality discriminator
    * column; the right side is exploded across all salt values. The join
    * key becomes (key, salt), splitting a hot key across `salts`
    * reducers. AQE's skew-join handles moderate skew automatically; this
    * is the explicit tool for pathological keys.
    *
    * @param discriminator a left column with per-row variation (any id)
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      discriminator: String, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(col(discriminator)), lit(salts)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}
