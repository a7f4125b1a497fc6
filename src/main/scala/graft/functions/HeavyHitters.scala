package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Misra-Gries heavy-hitters summary as a TypedImperativeAggregate: at most
  * `capacity` (item → lower-bound count) counters per group, O(1) amortized
  * per input row, merged with the Agarwal et al. mergeable-summaries rule
  * (add counts, subtract the (capacity+1)-th largest, drop non-positives).
  *
  * The guarantee — for ANY partition layout and merge order — is
  *   est(x) ≤ true(x)   and   true(x) − est(x) ≤ N / (capacity + 1)
  * with est(x) = 0 for absent items, N = total input rows. So every item
  * with true count > N/(capacity+1) is PRESENT in the summary, which is
  * what q98's gate asserts. The summary itself is order-dependent within
  * that window (like every MG sketch), so queries must expose only
  * bound-derived facts, never raw survivor sets.
  *
  * Why this shape at 100 TB: exact top-k needs a full (word → count)
  * shuffle — fine as a batch job (q48), unusable as a cheap profiling
  * side-channel. This buffer is `capacity` entries per PARTIAL aggregate,
  * so the shuffle carries one bounded summary per map task regardless of
  * corpus size — the frequent-items analog of q68's GK/HLL sketches.
  *
  * Null inputs are skipped (SQL aggregate convention). Input must be
  * STRING — enforced at analysis, like [[MinHashSig]].
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, "heavy_hitters capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters requires a STRING child, got ${child.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the (possibly buffer-backed) UTF8String before keying
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf(key) = c + 1L
        case None if buf.size < capacity => buf(key) = 1L
        case None =>
          // classic MG decrement-all: pays one unit from every counter plus
          // the arriving item; total sweep cost over a stream is O(N)
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.filterInPlace((_, c) => c > 0L)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, v) => a(k) = a.getOrElse(k, 0L) + v }
    if (a.size > capacity) {
      val vals = a.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      a.mapValuesInPlace((_, c) => c - cut)
      a.filterInPlace((_, c) => c > 0L)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val n = buf.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var i = 0
    buf.foreach { case (k, v) =>
      keys(i) = UTF8String.fromString(k); vals(i) = v; i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (k, v) =>
      (k.getBytes(StandardCharsets.UTF_8), v)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(12 + _._1.length).sum)
    bb.putInt(entries.length)
    entries.foreach { case (kb, v) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf(new String(kb, StandardCharsets.UTF_8)) = bb.getLong
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)

  override def prettyName: String = "heavy_hitters"
}
