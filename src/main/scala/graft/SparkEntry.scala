package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{DedupOps, Relational, SimilarityOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered queries, each a Spark build + (where SQL-expressible) a
    * DuckDB oracle. Modules: SURVEY §7.1.
    */
  def all: Seq[QueryDef] =
    Relational.defs ++ TextOps.defs ++ DedupOps.defs ++ SimilarityOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_join_multi")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
