package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 hash: the first 15 hex characters of md5(input) as a
  * long, computed directly from the digest bytes — no hex-string render, no
  * base-16 string parse. Bit-identical to the composed form
  * `conv(substring(md5(x), 1, 15), 16, 10)` (15 hex chars = the top 60 bits
  * = first 8 digest bytes as big-endian unsigned, shifted right 4) and to
  * the DuckDB twin `('0x' || substr(md5(x), 1, 15))::BIGINT` — see
  * Hash60Spec for the randomized equivalence proof.
  *
  * This sits under every hashed-dedup substrate (shingle hashing for
  * n-gram Jaccard and MinHash, simhash token hashing, fingerprints), where
  * the composition's two string intermediates per row are pure overhead.
  */
case class Hash60(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  // MessageDigest is stateful — one instance per expression per thread
  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Unboxed kernel shared by interpreted eval and the generated code. */
  def kernel(input: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(input.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4 // top 60 bits == first 15 hex chars
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  // real doGenCode (not CodegenFallback): children evaluate inside the
  // whole-stage span and only the leaf digest goes through one unboxed
  // call — no InternalRow materialization, no boxing, no span break
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hash60", this, classOf[Hash60].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hash60"
}
