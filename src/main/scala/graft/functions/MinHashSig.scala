package graft.functions

import graft.ext.Dedup
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** All-in-one MinHash signature as a TypedImperativeAggregate: one
  * `array<long>` buffer per group holding every permutation's running min,
  * updated with K mulmods per input row in a single JVM loop.
  *
  * The alternative (what q36 uses by default) is K separate codegen'd
  * `min((a_i*h+b_i)%p)` columns — same arithmetic, fused into whole-stage
  * codegen, but the generated update method grows with K and each aggregate
  * carries its own buffer slot. This aggregate keeps the buffer as one
  * primitive array and the update as one tight loop, the shape you want
  * when K is large (128-256 permutation MinHash) where wide codegen hits
  * JIT/method-size limits. Both paths produce IDENTICAL signatures
  * (same [[Dedup.permA]]/[[Dedup.permB]] constants, same mod-p arithmetic)
  * — see MinHashSigSpec.
  *
  * Partial aggregation works as usual: merge = elementwise min, so map-side
  * combine bounds the shuffle to one K-long array per (partition, group).
  *
  * Null semantics match the codegen'd min-column path: a group whose every
  * input is null yields a NULL signature (each `min(...)` column is null
  * there), tracked by a seen-flag slot appended to the buffer. Input must
  * be LongType — enforced in `checkInputDataTypes` so a mistyped child is
  * an analysis error, not a runtime ClassCastException.
  */
case class MinHashSig(
    child: Expression,
    numHashes: Int = Dedup.NumHashes,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val as: Array[Long] = Array.tabulate(numHashes)(Dedup.permA)
  private val bs: Array[Long] = Array.tabulate(numHashes)(Dedup.permB)
  private val p: Long = Dedup.MinhashP

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a BIGINT child, got ${child.dataType.catalogString}")
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // buffer slot numHashes is the seen flag (0 = no non-null input yet)
  override def createAggregationBuffer(): Array[Long] = {
    val buf = Array.fill(numHashes + 1)(Long.MaxValue)
    buf(numHashes) = 0L
    buf
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] % p
      var i = 0
      while (i < numHashes) {
        val m = (as(i) * h + bs(i)) % p
        if (m < buf(i)) buf(i) = m
        i += 1
      }
      buf(numHashes) = 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a(numHashes) |= b(numHashes)
    a
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(numHashes) == 0L) null
    else new GenericArrayData(buf.take(numHashes))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (numHashes + 1))
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes + 1)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSig =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_sig"
}
