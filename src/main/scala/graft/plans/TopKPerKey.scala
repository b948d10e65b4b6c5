package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Descending, Expression, RowOrdering, SortOrder, UnsafeProjection,
  UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy,
  UnaryExecNode}

/** TOP-K PER KEY as a first-class physical operator — the full custom-
  * operator ladder (logical node → strategy → exec). Spark 4's own
  * `InferWindowGroupLimit` already rewrites `row_number() <= k` into
  * Partial/Final `WindowGroupLimit`s around the exchange — so the
  * SHUFFLE volume is no longer the differentiator — but both of its
  * phases still run a FULL SORT of their input partition below the
  * limit (O(n log n) compares + a sort buffer over every input row,
  * verified on the executed plan). This operator is the hash-shaped
  * alternative: a bounded heap per key, never a sort —
  * O(n log k) compares, memory O(keys · k) rows — in two phases shaped
  * exactly like a hash aggregate:
  *
  *   - PARTIAL (map-side, no distribution requirement): each input
  *     partition reduces to ≤ k rows per locally-seen key WITHOUT
  *     sorting it, so the exchange moves at most `k · keys ·
  *     partitions` rows;
  *   - FINAL (requires [[ClusteredDistribution]] on the key — Catalyst
  *     inserts the exchange): the same bounded-heap pass over the
  *     partial survivors yields the exact global top-k per key, because
  *     every globally-top-k row is locally-top-k in its partition.
  *
  * Exactness at the k boundary comes from the caller supplying a
  * TOTAL order (tie-break columns), same contract as the window form.
  * Memory is bounded exactly as external hash aggregates bound theirs:
  * past a BYTE budget (a fraction of task memory by default — so wide
  * rows spill earlier than narrow ones — or the explicit
  * `spark.graft.topk.spillBytes` / `spillKeyThreshold` overrides) the
  * key map spills byte-sorted runs to Spark's configured local dirs
  * and the partition re-reduces by k-way merge.
  */
case class TopKPerKeyNode(key: Expression, ordering: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan)
      : TopKPerKeyNode = copy(child = c)
}

/** The custom node BLOCKS Catalyst's own predicate pushdown (the
  * optimizer cannot reason about plans it does not know), so without
  * help a key-filter above top-k-per-key reads the whole table. This
  * [[org.apache.spark.sql.catalyst.rules.Rule]] restores it for the one
  * case where commuting is sound: a predicate over ONLY the key column
  * selects whole groups, and per-key top-k of the selected groups
  * equals selecting groups from the per-key top-k — so the filter sinks
  * below the node and from there Catalyst pushes it all the way into
  * the scan (`PushedFilters`, asserted in TopKPerKeySpec). A predicate
  * touching any non-key column must NOT sink: it would change which
  * rows compete for the k slots.
  */
object TopKPushdown
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // The reference-set test is only sound when the key IS a bare
    // attribute: for a non-injective key expression (e.g. a % 10) a
    // predicate on the underlying column is not constant per group, so
    // sinking it would change which rows compete for the k slots.
    case f @ Filter(cond, t: TopKPerKeyNode)
        if t.key.isInstanceOf[Attribute] &&
          cond.references.nonEmpty &&
          cond.references.subsetOf(t.key.references) &&
          cond.deterministic =>
      t.copy(child = Filter(cond, t.child))
  }
}

/** Plans [[TopKPerKeyNode]] as FINAL-over-PARTIAL [[TopKPerKeyExec]]. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(key, ord, k, child) =>
      TopKPerKeyExec(key, ord, k, isFinal = true,
        TopKPerKeyExec(key, ord, k, isFinal = false,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(key: Expression, ordering: Seq[SortOrder],
    k: Int, isFinal: Boolean, child: SparkPlan) extends UnaryExecNode {
  import org.apache.spark.sql.execution.metric.SQLMetrics

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (isFinal) ClusteredDistribution(Seq(key)) :: Nil
    else UnspecifiedDistribution :: Nil

  override lazy val metrics = Map(
    "spills" -> SQLMetrics.createMetric(sparkContext, "number of spills"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyE = key
    val ords = ordering
    val kk = k
    val childOutput = child.output
    // Memory is bounded per task: past the BYTE budget (or the key-count
    // override) the key map spills to a byte-sorted run file and the
    // partition re-reduces by k-way merge — the external-hash-aggregate
    // shape, so a high-cardinality FINAL key can no longer OOM. The
    // primary threshold is bytes actually held (keys + kept rows), not a
    // row-count literal: a count ignores row width, and a 10 KB-row
    // table OOMs at the same key count a 40-byte-row table sails
    // through.
    val spillKeys = conf
      .getConfString(TopKPerKey.SpillKeysConf, "262144").toInt
    require(spillKeys > 0, s"${TopKPerKey.SpillKeysConf} must be > 0")
    val spillBytesOverride = {
      val s = conf.getConfString(TopKPerKey.SpillBytesConf, "")
      if (s.isEmpty) None else Some(s.toLong)
    }
    spillBytesOverride.foreach(b =>
      require(b > 0, s"${TopKPerKey.SpillBytesConf} must be > 0"))
    val spillMetric = longMetric("spills")
    child.execute().mapPartitions ({ iter =>
      // default byte budget, sized on the EXECUTOR's JVM (evaluated
      // in-task): a quarter of the heap divided across task slots —
      // the fraction Spark's own execution memory pool gives a task
      // before its aggregates spill
      val spillBytes: Long = spillBytesOverride.getOrElse {
        val slots = math.max(1, Runtime.getRuntime.availableProcessors())
        Runtime.getRuntime.maxMemory() / 4 / slots
      }
      val keyProj = UnsafeProjection.create(Seq(keyE), childOutput)
      // rows must be UnsafeRows so a spilled run can round-trip bytes
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // "smaller" = earlier in the requested order; top-k = first k
      // (UnsafeRow-typed so PriorityQueue's invariant Ordering lines up
      // with the spill-able row type; on-ordering it compares as rows)
      val rowOrd: Ordering[UnsafeRow] =
        Ordering.comparatorToOrdering(RowOrdering.create(ords, childOutput)
          .asInstanceOf[java.util.Comparator[UnsafeRow]])
      // per key: max-heap of the kept rows so the WORST kept row is at
      // the head — O(log k) replace when a better row arrives
      val heaps =
        mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      val spills = mutable.ArrayBuffer.empty[java.io.File]
      val readers = mutable.ArrayBuffer.empty[TopKPerKey.RunReader]
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
        // close BEFORE delete: a consumer that stopped early (LIMIT)
        // leaves readers mid-run with live handles — EOF never closed
        // them, and delete-with-open-handle fails on some filesystems
        readers.foreach(_.close())
        spills.foreach(_.delete())
      }
      var heldBytes = 0L
      // returns the byte delta of the kept-row set, so the build loop's
      // accounting tracks what the map actually holds
      def offer(heap: mutable.PriorityQueue[UnsafeRow],
          row: UnsafeRow): Long =
        if (heap.size < kk) { heap.enqueue(row.copy()); row.getSizeInBytes }
        else if (rowOrd.compare(row, heap.head) < 0) {
          val evicted = heap.dequeue(); heap.enqueue(row.copy())
          row.getSizeInBytes.toLong - evicted.getSizeInBytes
        } else 0L
      // run layout: per key (in unsigned-byte key order, so equal keys
      // align across runs): keyLen, keyBytes, nRows, (rowLen, rowBytes)*
      def spill(): Unit = {
        // spill where Spark's own operators do (spark.local.dir — the
        // container's scratch disks), never java.io.tmpdir
        val f = java.io.File.createTempFile("graft-topk-spill", ".bin",
          org.apache.spark.sql.graftshim.PlanShim.sparkLocalDir())
        spills += f
        val out = new java.io.DataOutputStream(new java.io.
          BufferedOutputStream(new java.io.FileOutputStream(f), 1 << 16))
        try {
          heaps.toSeq.sortBy(_._1.getBytes)(TopKPerKey.ByteOrd)
            .foreach { case (key, heap) =>
              val kb = key.getBytes
              out.writeInt(kb.length); out.write(kb)
              out.writeInt(heap.size)
              heap.foreach { r =>
                val rb = r.getBytes
                out.writeInt(rb.length); out.write(rb)
              }
            }
        } finally out.close()
        heaps.clear()
        heldBytes = 0L
        spillMetric += 1
      }
      while (iter.hasNext) {
        val row = toUnsafe(iter.next())
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](rowOrd)
            val kc = key.copy()
            heaps.put(kc, h)
            heldBytes += kc.getSizeInBytes
            h
        }
        heldBytes += offer(heap, row)
        if (heaps.size > spillKeys || heldBytes > spillBytes) spill()
      }
      if (spills.isEmpty) heaps.valuesIterator.flatMap(_.iterator)
      else {
        if (heaps.nonEmpty) spill()
        // k-way merge of the byte-sorted runs: pop every run sitting on
        // the minimum key, re-reduce their (≤ k each) survivors — every
        // globally-top-k row is top-k in its run, so the merge is exact
        val runs = spills.map { rf =>
          val r = new TopKPerKey.RunReader(rf, childOutput.size)
          readers += r
          r
        }.filter(_.hasNext)
        val pq = mutable.PriorityQueue.empty[TopKPerKey.RunReader](
          Ordering.by[TopKPerKey.RunReader, Array[Byte]](_.headKey)(
            TopKPerKey.ByteOrd.reverse))
        runs.foreach(pq.enqueue(_))
        new Iterator[InternalRow] {
          private var cur: Iterator[UnsafeRow] = Iterator.empty
          override def hasNext: Boolean = cur.hasNext || pq.nonEmpty
          override def next(): InternalRow = {
            while (!cur.hasNext) {
              val minKey = pq.head.headKey
              val heap = mutable.PriorityQueue.empty[UnsafeRow](rowOrd)
              while (pq.nonEmpty && java.util.Arrays.equals(
                  pq.head.headKey, minKey)) {
                val r = pq.dequeue()
                r.readGroup().foreach(offer(heap, _))
                if (r.hasNext) pq.enqueue(r)
              }
              cur = heap.iterator
            }
            cur.next()
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan)
      : TopKPerKeyExec = copy(child = c)
}

object TopKPerKey {

  /** Max keys held in a task's in-memory map before it spills a run —
    * the external-aggregation knob; bytes ≈ spillKeys · k · rowSize.
    */
  val SpillKeysConf = "spark.graft.topk.spillKeyThreshold"

  /** Byte budget for a task's in-memory map (keys + kept rows) before it
    * spills a run — the PRIMARY threshold: unlike a key count it tracks
    * row width, so wide rows spill earlier than narrow ones. Unset (the
    * default) derives maxHeap/4/taskSlots on the executor.
    */
  val SpillBytesConf = "spark.graft.topk.spillBytes"

  /** Unsigned lexicographic byte order — an arbitrary but CONSISTENT
    * total order on serialized keys, so equal keys are adjacent in
    * every run and the merge can align them (the only property the
    * merge needs; no relation to the key's value order is required).
    */
  val ByteOrd: Ordering[Array[Byte]] = new Ordering[Array[Byte]] {
    override def compare(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = (a(i) & 0xff) - (b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      a.length - b.length
    }
  }

  /** Streams one spilled run: groups of (key, rows) in [[ByteOrd]] key
    * order, each row re-materialized as an [[UnsafeRow]].
    */
  private[plans] final class RunReader(f: java.io.File, numFields: Int) {
    private val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(
        new java.io.FileInputStream(f), 1 << 16))
    private var nextKey: Array[Byte] = _
    private var closed = false
    advance()
    private def advance(): Unit = {
      val len = try in.readInt() catch {
        case _: java.io.EOFException => close(); nextKey = null; return
      }
      nextKey = new Array[Byte](len)
      in.readFully(nextKey)
    }
    /** Idempotent; also driven by the task-completion listener so an
      * early-terminated consumer (LIMIT) cannot leak the handle.
      */
    def close(): Unit = if (!closed) { closed = true; in.close() }
    def hasNext: Boolean = nextKey != null
    def headKey: Array[Byte] = nextKey
    /** Consume the current group's rows and advance to the next key. */
    def readGroup(): Seq[UnsafeRow] = {
      val n = in.readInt()
      val rows = (0 until n).map { _ =>
        val bytes = new Array[Byte](in.readInt())
        in.readFully(bytes)
        val r = new UnsafeRow(numFields)
        r.pointTo(bytes, bytes.length)
        r
      }
      advance()
      rows
    }
  }

  /** Exact top-k rows per key of `df`, ordered by `orderCols`
    * ((name, descending) — supply tie-breakers for a total order).
    * Output row set equals the `row_number() <= k` window form; the
    * plan does not.
    */
  def apply(df: DataFrame, keyCol: String,
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, s"top-k needs k > 0, got $k")
    require(orderCols.nonEmpty, "top-k needs at least one order column")
    val spark = df.sparkSession
    register(spark)
    val lp = df.queryExecution.analyzed
    def attr(n: String): Attribute = lp.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${lp.output.map(_.name)}"))
    val ords = orderCols.map { case (c, desc) =>
      SortOrder(attr(c), if (desc) Descending else Ascending)
    }
    org.apache.spark.sql.graftshim.PlanShim.ofRows(spark,
      TopKPerKeyNode(attr(keyCol), ords, k, lp))
  }

  /** Idempotently install [[TopKStrategy]] + [[TopKPushdown]] on a
    * live session.
    */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    if (!spark.experimental.extraOptimizations.contains(TopKPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKPushdown
  }
}
