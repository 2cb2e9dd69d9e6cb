package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension — tier (c) of the custom-operator ladder
  * (SURVEY §6): a logical node + planner strategy + physical operator for
  * per-key top-k, the per-key generalization of TakeOrderedAndProject.
  *
  * Why not Window + row_number + filter (the q36 formulation): the window
  * form SORTS every partition in full — O(n log n) per partition, spills
  * at scale — and only then discards everything past rank k. This operator
  * keeps a bounded k-row heap per key: O(n log k), memory bounded by
  * #keys × k rows regardless of group sizes — and when the key COUNT
  * itself exceeds the configured budget, the heap map spills key-sorted
  * runs and merges them (see doExecute), so memory is ⊥ both group sizes
  * and key cardinality. No sort of the losers ever happens. The planner
  * inserts the key-clustered exchange via requiredChildDistribution,
  * exactly like the built-in aggregates.
  */
case class TopKPerKeyNode(keys: Seq[Attribute], order: Seq[SortOrder], k: Int,
                          child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Planner strategy: one physical candidate, the heap operator. Installed
  * per-session via `spark.experimental.extraStrategies` (the public
  * runtime hook; SparkSessionExtensions.injectPlannerStrategy is the
  * build-time twin).
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Attribute], order: Seq[SortOrder], k: Int,
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  // the same observability surface the built-in aggregates expose: output
  // rows plus the number of per-key heaps (≈ distinct keys seen), the
  // operator's actual memory driver (state = numKeys × k rows), and the
  // spill count (nonzero when the key set exceeded the in-memory budget)
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numKeys" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of distinct keys"),
    "numSpills" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of heap-map spills"))

  /** All rows of a key on one partition — Catalyst plans the shuffle (or
    * elides it when the child is already clustered on the keys, e.g. a
    * bucketed scan: the same exchange-reuse economics as builtin aggs).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  /** In-memory state is numKeys × k rows — bounded per KEY, but the number
    * of keys per partition is data-dependent and unbounded. Above the
    * `spark.graft.topkPerKey.maxKeysInMemory` budget (default 2²¹ keys)
    * the heap map SPILLS, mirroring ExternalAppendOnlyMap's shape: each
    * spill writes the map's per-key top-k runs to a local file SORTED BY
    * KEY BYTES (UnsafeRow equality is byte equality under one projection,
    * so byte order is a valid grouping order), clears the map, and the
    * final pass streams a k-way merge over the runs — per key, only the
    * ≤ k·nSpills candidate rows from the run heads are ever resident, so
    * memory is ⊥ the number of distinct keys. Spilled runs hold top-k per
    * spill generation, never raw inputs, so spill volume is also bounded
    * by keys × k, not by input rows.
    */
  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keys
    val orderLocal = order
    val childOutput = child.output
    val numOutputRows = longMetric("numOutputRows")
    val numKeys = longMetric("numKeys")
    val numSpills = longMetric("numSpills")
    // clamped to >= 1: a non-positive budget would write one empty run
    // file per incoming key instead of ever holding a heap
    val maxKeysInMemory = math.max(1L, conf.getConfString(
      "spark.graft.topkPerKey.maxKeysInMemory", (1 << 21).toString).toLong)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // codegen'd comparator over the requested sort order
      val ord = GenerateOrdering.generate(orderLocal, childOutput)
      // per key: a max-heap on the REVERSED order, so peek() is the worst
      // row currently kept and a better row evicts it in O(log k)
      val worstFirst = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
      }
      val nFields = childOutput.length
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val spillFiles = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => spillFiles.foreach(_.delete())))

      def cmpBytes(a: Array[Byte], b: Array[Byte]): Int =
        java.util.Arrays.compareUnsigned(a, b)

      /** Drain the map to a key-sorted run file and clear it. */
      def spill(): Unit = {
        import scala.jdk.CollectionConverters._
        // allocated from Spark's managed executor local dirs (disk-usage
        // accounted, operator-provisioned disks, swept on JVM death) — not
        // bare java.io.tmpdir; see GraftCoreBridge
        val file = org.apache.spark.graftbridge.GraftCoreBridge
          .createLocalSpillFile("graft-topk-spill")
        spillFiles += file
        val entries = heaps.entrySet().asScala.toArray
          .map(e => (e.getKey.getBytes, e.getValue))
          .sortWith((a, b) => cmpBytes(a._1, b._1) < 0)
        val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(file), 1 << 16))
        try entries.foreach { case (keyBytes, heap) =>
          out.writeInt(keyBytes.length)
          out.write(keyBytes)
          out.writeInt(heap.size)
          heap.iterator().asScala.foreach { r =>
            val b = r.getBytes
            out.writeInt(b.length)
            out.write(b)
          }
        } finally out.close()
        heaps.clear()
        numSpills += 1
      }

      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= maxKeysInMemory) spill()
          heap = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) {
          heap.add(toUnsafe(row).copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(toUnsafe(row).copy())
        }
      }

      import scala.jdk.CollectionConverters._
      if (spillFiles.isEmpty) {
        numKeys += heaps.size()
        heaps.values().iterator().asScala.flatMap { heap =>
          val arr = heap.toArray(new Array[UnsafeRow](heap.size))
          java.util.Arrays.sort(arr, ord)
          numOutputRows += arr.length
          arr.iterator
        }
      } else {
        if (!heaps.isEmpty) spill() // the remainder becomes the last run
        // streaming k-way merge over the key-sorted runs: group run heads
        // with equal key bytes, re-bound their ≤ k·nRuns candidates to k
        class RunReader(file: java.io.File) {
          private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
            new java.io.FileInputStream(file), 1 << 16))
          var key: Array[Byte] = _
          var rows: Array[UnsafeRow] = _
          advance()
          def advance(): Unit = {
            val kl = try in.readInt() catch { case _: java.io.EOFException => -1 }
            if (kl < 0) { key = null; rows = null; in.close() }
            else {
              key = new Array[Byte](kl)
              in.readFully(key)
              rows = Array.fill(in.readInt()) {
                val b = new Array[Byte](in.readInt())
                in.readFully(b)
                val r = new UnsafeRow(nFields)
                r.pointTo(b, b.length)
                r
              }
            }
          }
        }
        val readers = spillFiles.map(new RunReader(_))
        new Iterator[InternalRow] {
          private var pending: Iterator[UnsafeRow] = Iterator.empty
          private def refill(): Unit = {
            var minKey: Array[Byte] = null
            readers.foreach { r =>
              if (r.key != null && (minKey == null || cmpBytes(r.key, minKey) < 0))
                minKey = r.key
            }
            if (minKey != null) {
              val heap = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, worstFirst)
              readers.foreach { r =>
                if (r.key != null && cmpBytes(r.key, minKey) == 0) {
                  r.rows.foreach { row =>
                    if (heap.size < kLocal) heap.add(row)
                    else if (ord.compare(row, heap.peek()) < 0) { heap.poll(); heap.add(row) }
                  }
                  r.advance()
                }
              }
              val arr = heap.toArray(new Array[UnsafeRow](heap.size))
              java.util.Arrays.sort(arr, ord)
              numKeys += 1
              numOutputRows += arr.length
              pending = arr.iterator
            }
          }
          override def hasNext: Boolean = {
            if (!pending.hasNext) refill()
            pending.hasNext
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            pending.next()
          }
        }
      }
    }, preservesPartitioning = true)
  }
}

/** Library entry point: `TopKPerKey(df, keys, orders, k)` builds the
  * logical node and registers the strategy on the session.
  *
  * The sort orders are taken from the ANALYZED plan of `df.sort(orderCols)`:
  * the analyzer hands back fully-resolved catalyst `SortOrder`s bound to the
  * child's output. Unwrapping the `Column`s directly (via the sql bridge)
  * does NOT work on Spark 4 — `col.desc` produces a Column-DSL
  * `sql.internal.SortOrder` node whose converted form is a
  * `ColumnNodeExpression` wrapper, never a catalyst `SortOrder`, so the
  * direction is silently dropped and the wrapper's non-serializable
  * internals get captured by the executor closure (Task not serializable).
  */
object TopKPerKey {
  def apply(df: DataFrame, keyNames: Seq[String], orderCols: Seq[Column],
            k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.exists(_ eq TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    // Resolve through the analyzer, then strip the Sort node. If an order
    // expression is not a bare column the analyzer wraps the Sort in a
    // Project-back, so locate the Sort anywhere in the analyzed tree.
    val sortPlan = df.sort(orderCols: _*).queryExecution.analyzed
    val sortNode = sortPlan.collectFirst {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s
    }.getOrElse(throw new IllegalStateException(
      s"analyzer produced no Sort node for orders $orderCols"))
    val child = sortNode.child
    val keyAttrs = keyNames.map { n =>
      child.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"key column '$n' not in ${child.output.map(_.name)}"))
    }
    import org.apache.spark.sql.graftbridge.GraftSqlBridge
    val topk = GraftSqlBridge.ofRows(
      spark, TopKPerKeyNode(keyAttrs, sortNode.order, k, child))
    // Project away any helper columns the analyzer added for the sort.
    if (child.output.map(_.name) == df.columns.toSeq) topk
    else topk.select(df.columns.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
  }
}
