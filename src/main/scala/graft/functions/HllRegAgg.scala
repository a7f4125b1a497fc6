package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-pass HyperLogLog register table as a TypedImperativeAggregate: the
  * native form of the relational register computation q225/q227 gate
  * (reference behavior: `graft.ext.TextAnalysis.hllRegisters` —
  * bucket = top 6 bits of the 60-bit hash, ρ = first-1-bit position of the
  * remaining 54 via integer bit length, register = MAX(ρ)).
  *
  * Why native: the relational form shuffles one (group, bucket, ρ) row per
  * DISTINCT input and re-aggregates 64 rows per group; this aggregate folds
  * every input into a 64-BYTE buffer per (partition, group) — map-side
  * combine ships 64 bytes per group per task no matter how many items were
  * seen, the exact mergeable-sketch partial a 100 TB profiling pass wants.
  * MAX-merge is commutative, associative AND idempotent, so partials
  * tolerate replay and arbitrary merge order (the property the streaming
  * maintainer `EventStream.hllMaintain` relies on).
  *
  * Input is the 60-bit [[Hash60]] value (BIGINT) so the digest pipeline is
  * shared with every other hash consumer; eval returns the 64 registers as
  * `array<int>` — estimates are derived relationally on top, which keeps
  * this aggregate output gateable bit-for-bit against the DuckDB replay
  * (q235). Null inputs are ignored; an all-null group is an all-zero
  * register table (the empty-sketch state), matching the relational form's
  * spine fill.
  */
case class HllRegAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_registers requires a BIGINT child, got ${child.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](64)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h >>> 54).toInt & 63
      val w = h & ((1L << 54) - 1)
      val rho =
        if (w == 0L) 55
        else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 64) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "hll_registers"
}
