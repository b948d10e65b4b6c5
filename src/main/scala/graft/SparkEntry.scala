package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{CorpusOps, CurationOps, DedupOps, EventOps, MultimodalOps,
  ProfileOps, Relational, SimilarityOps, SqlSurface, StoreOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered queries, each a Spark build + (where SQL-expressible) a
    * DuckDB oracle. Modules: SURVEY §7.1.
    */
  def all: Seq[QueryDef] =
    Relational.defs ++ EventOps.defs ++ TextOps.defs ++ DedupOps.defs ++
      SimilarityOps.defs ++ MultimodalOps.defs ++ CorpusOps.defs ++
      StoreOps.defs ++ CurationOps.defs ++ SqlSurface.defs ++
      ProfileOps.defs

  /** Flagship: the reference's entire hot path (SURVEY §7.3) — permissive
    * JSON read with corrupt capture → declarative normalization into the
    * 33-column canonical model (uid, raw_json, typed null-padding) →
    * union-by-name of both sources. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    import graft.engine.{Fixtures, Normalize, SourceSpec}
    import org.apache.spark.sql.functions.{lit, to_timestamp}
    val ts = to_timestamp(lit("2026-01-01 00:00:00"))
    val r7 = Normalize(
      Normalize.readRecords(spark, SourceSpec.rapid7, Fixtures.rapid7Records),
      SourceSpec.rapid7, ts)
    val forti = Normalize(
      Normalize.readRecords(spark, SourceSpec.fortisiem,
        Fixtures.fortisiemRecords),
      SourceSpec.fortisiem, ts)
    r7.unionByName(forti)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
