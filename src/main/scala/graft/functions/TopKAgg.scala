package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** Exact grouped top-k as a TypedImperativeAggregate: per group, the k
  * largest (key, id) pairs under the STRICT total order
  * (key DESC, id ASC) — a bounded binary heap per PARTIAL aggregate, so
  * the shuffle carries at most k pairs per group per map task instead of
  * the group's full row set.
  *
  * Why this shape at 100 TB: Spark's idiomatic grouped top-k is
  * `row_number() OVER (PARTITION BY g ORDER BY key DESC)` + `rn <= k`,
  * which shuffles EVERY row of every group and sorts each partition
  * (WindowGroupLimit prunes per-task, but the shuffle still carries up to
  * k rows per group per TASK only after the limit is pushed — and the
  * sort remains). This aggregate replaces the sort entirely: partial
  * heaps bound both the map-side state (k entries) and the shuffle width,
  * and the merge is heap-union-truncate. Because the order is strict
  * (ids are unique within a group), partial top-k merge is EXACTLY global
  * top-k regardless of partition layout or merge order — unlike the
  * sketched summaries ([[HeavyHitters]]), this is order-independent and
  * exact, so q254's gate hash-compares it against the window oracle
  * directly.
  *
  * Inputs: key BIGINT, id BIGINT (engine-neutral integer order — no float
  * comparisons); NULL in either column skips the row (SQL aggregate
  * convention). Output: array<struct<key,id>> sorted (key DESC, id ASC),
  * ready for posexplode into ranked rows.
  */
case class TopKAgg(
    key: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Buf] {

  require(k > 0, "top_k k must be positive")

  override def children: Seq[Expression] = Seq(key, id)
  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType == LongType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k requires (BIGINT, BIGINT) children, got " +
        s"(${key.dataType.catalogString}, ${id.dataType.catalogString})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("key", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null)
      buf.offer(kv.asInstanceOf[Long], iv.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKAgg.Buf, b: TopKAgg.Buf): TopKAgg.Buf = {
    b.foreach { case (kk, ii) => a.offer(kk, ii) }
    a
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val sorted = buf.sortedDesc
    val out = new Array[Any](sorted.length)
    var i = 0
    while (i < sorted.length) {
      out(i) = InternalRow(sorted(i)._1, sorted(i)._2)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val entries = buf.entries
    val bb = ByteBuffer.allocate(4 + 16 * entries.length)
    bb.putInt(entries.length)
    entries.foreach { case (kk, ii) => bb.putLong(kk); bb.putLong(ii) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.Buf(k)
    var i = 0
    while (i < n) { buf.offer(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(key = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k"
}

object TopKAgg {
  /** Bounded top-k heap over the strict order (key DESC, id ASC): the heap
    * root is the CURRENT WORST kept pair, so each offer is O(log k) and
    * at most k entries ever exist. "a beats b" ⇔ key_a > key_b, tie on
    * smaller id — the same total order the q254 window oracle states.
    */
  final class Buf(k: Int) {
    // min-heap on "worst first": heap(0) is the weakest kept pair
    private val keys = new Array[Long](k)
    private val ids = new Array[Long](k)
    private var n = 0

    private def worseThan(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
      k1 < k2 || (k1 == k2 && i1 > i2)

    private def siftUp(pos0: Int): Unit = {
      var pos = pos0
      while (pos > 0) {
        val par = (pos - 1) / 2
        if (worseThan(keys(pos), ids(pos), keys(par), ids(par))) {
          val tk = keys(pos); keys(pos) = keys(par); keys(par) = tk
          val ti = ids(pos); ids(pos) = ids(par); ids(par) = ti
          pos = par
        } else return
      }
    }

    private def siftDown(): Unit = {
      var pos = 0
      while (true) {
        val l = 2 * pos + 1
        val r = l + 1
        var w = pos
        if (l < n && worseThan(keys(l), ids(l), keys(w), ids(w))) w = l
        if (r < n && worseThan(keys(r), ids(r), keys(w), ids(w))) w = r
        if (w == pos) return
        val tk = keys(pos); keys(pos) = keys(w); keys(w) = tk
        val ti = ids(pos); ids(pos) = ids(w); ids(w) = ti
        pos = w
      }
    }

    def offer(key: Long, id: Long): Unit =
      if (n < k) {
        keys(n) = key; ids(n) = id; n += 1; siftUp(n - 1)
      } else if (worseThan(keys(0), ids(0), key, id)) {
        keys(0) = key; ids(0) = id; siftDown()
      }

    def foreach(f: ((Long, Long)) => Unit): Unit = {
      var i = 0
      while (i < n) { f((keys(i), ids(i))); i += 1 }
    }
    def entries: Array[(Long, Long)] =
      (0 until n).map(i => (keys(i), ids(i))).toArray
    def sortedDesc: Array[(Long, Long)] =
      entries.sortBy { case (kk, ii) => (-kk, ii) }
  }
}
