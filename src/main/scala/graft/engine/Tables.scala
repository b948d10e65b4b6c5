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

  /** Resolved-relation cache: the driver's corpus tables are immutable
    * for the life of a run, yet every `Tables(...)` call built a fresh
    * relation — one directory listing plus one footer schema read per
    * call, times several calls per query across the whole board. Reusing
    * the resolved DataFrame (an immutable logical plan) reuses its file
    * index and schema, exactly the metadata reuse a catalog table gets
    * from Spark's own FileStatusCache — at 100 TB that is the
    * difference between one listing per table and one per operator.
    * Keyed per session (weakly) so cloned/new sessions never share
    * analysis state. The per-session map sits behind a SoftReference:
    * a cached DataFrame strongly references its session (via its query
    * execution), so holding it directly would pin the weak key forever
    * — softly-held plans are collectable under memory pressure, after
    * which a stopped session's entry is reclaimed like any weak key.
    */
  private val cache = new java.util.WeakHashMap[SparkSession,
    java.lang.ref.SoftReference[
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      val ref = cache.get(spark)
      var m = if (ref == null) null else ref.get()
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        cache.put(spark, new java.lang.ref.SoftReference(m))
      }
      m
    }
    perSession.computeIfAbsent(s"$dir/$name.parquet", path => {
      val df = spark.read.parquet(path)
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    })
  }
}
