package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Pin.Pinnable

/** Scale-safe EXACT global rank — the replacement for
  * `row_number().over(Window.orderBy(v))`, which Spark executes by
  * moving EVERY row into ONE partition ("No Partition Defined for
  * Window operation"): the single-task sort that works at sf0.1 and
  * funnels a 100 TB corpus through one core.
  *
  * Shape: one range-repartition by the value (RangePartitioner keeps
  * equal values together and samples boundaries with a deterministic
  * per-partition seed), a WITHIN-partition sort, and
  * `monotonically_increasing_id` to read off each row's partition and
  * local offset for free (pid in the high bits, record number in the
  * low 33 — no second shuffle, no per-partition window). Per-partition
  * row counts — a ≤ numShufflePartitions-row collect, bounded metadata
  * like a manifest read — cumsum on the driver into per-partition
  * offsets, and the global position is `offset(pid) + local + 1` via a
  * broadcast join. Wall-clock is a parallel sort of corpus/n rows per
  * task instead of a serial sort of the corpus.
  *
  * Exactness: positions are a permutation of 1..N ordered by `v`.
  * Ties are intra-partition by construction (equal keys never split
  * across range partitions), so the (v, pos) PAIRS are deterministic
  * even though tie order among equal values is not — every consumer
  * here reads the VALUE at a position (quantile edges), for which tied
  * values are interchangeable. The frame is materialized once
  * (localCheckpoint) so the offsets collect and the join read the same
  * partition layout.
  *
  * At 100 TB: the one global sort is what ANY exact rank costs; this
  * helper makes it a distributed sort. Heavy single-value skew lands
  * that value's run in one partition — inherent to exact rank with
  * ties; the documented approx swap (approx_percentile) remains the
  * escape hatch when exactness stops being worth a sort.
  */
object ExactRank {

  /** (v, pos): `valueCol`'s values with their exact 1-based global
    * ascending rank. Column order is fixed — callers pattern-match it
    * positionally via `toDF`.
    */
  def ranked(df: DataFrame, valueCol: String): DataFrame = {
    val s = df.sparkSession
    val (local, counts) = sortedWithOffsets(df, valueCol)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L) { case (acc, (_, c)) => acc + c })
    import s.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    local
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .join(broadcast(offDf), "__pid")
      .select(col("v"),
        (col("__off") + (col("__mid") % (1L << 33)) + 1L).as("pos"))
  }

  /** The LONG values at specific 1-based global ascending ranks — the
    * quantile-edge form of [[ranked]] for consumers that need a handful
    * of positions (percentile thresholds, histogram edges), not every
    * row's rank. [[ranked]] projects a position onto EVERY row through
    * a broadcast join and the caller then filters back down to k rows;
    * here the per-partition offsets metadata inverts the arithmetic
    * driver-side — each requested rank maps to one (partition, local
    * offset) pair, i.e. one `__mid` value — so a single pinpoint filter
    * on the materialized sort serves all edges with no join and no
    * full-frame projection. Same sort, same (v, pos) pairs, identical
    * values at every position (ties are interchangeable at a rank,
    * exactly [[ranked]]'s contract).
    *
    * `positions(n)` receives the exact row count and returns the
    * 1-based ranks wanted; out-of-range ranks are absent from the
    * result map (callers coalesce an interpolation upper edge back to
    * the lower one, as the SQL form's LEFT JOIN does). Returns
    * (n, rank -> value).
    */
  def valuesAt(df: DataFrame, valueCol: String,
      positions: Long => Seq[Long]): (Long, Map[Long, Long]) = {
    val (local, offsets) = sortedWithOffsets(df, valueCol)
    val n = offsets.map(_._2).sum
    val wanted = positions(n).distinct.filter(p => p >= 1 && p <= n)
    // rank -> __mid: walk the cumulative offsets to the owning
    // partition, local index = rank - partitions-before - 1
    val bounds = offsets.scanLeft(0L)(_ + _._2).zip(offsets.map(_._1))
    val midOf: Map[Long, Long] = wanted.map { p =>
      val (before, pid) = bounds.takeWhile(_._1 < p).last
      p -> ((pid << 33) + (p - before - 1))
    }.toMap
    val rows = local
      .filter(col("__mid").isInCollection(midOf.values.toSeq))
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    (n, midOf.map { case (p, mid) => p -> rows(mid) })
  }

  /** The shared core: the value column range-partitioned and sorted,
    * tagged with `monotonically_increasing_id` (pid in the high bits,
    * record number in the low 33) and materialized once, plus the
    * per-partition (pid, count) offsets metadata in pid order.
    */
  private def sortedWithOffsets(df: DataFrame, valueCol: String)
      : (DataFrame, Seq[(Long, Long)]) = {
    val s = df.sparkSession
    val n = s.sessionState.conf.numShufflePartitions
    val local = df.select(col(valueCol).as("v"))
      .repartitionByRange(n, col("v"))
      .sortWithinPartitions("v")
      .withColumn("__mid", monotonically_increasing_id())
      .pinned
    val counts = local
      .groupBy((shiftright(col("__mid"), 33)).as("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    (local, counts.toSeq)
  }
}
