package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared sorted-merge integer dot product over two sparse vectors given
  * as parallel arrays: term keys sorted ascending plus matching integer
  * weights. Keys are either `array<bigint>` (dictionary-encoded term ids —
  * the fast path: zero allocation, pure long compares) or `array<string>`
  * (raw terms; each compare materializes a UTF8String, which measured ~4x
  * slower per candidate at sf0.1). One O(|a| + |b|) pass per row.
  */
private[functions] object SparseMerge {
  def keyType(t: DataType): Option[DataType] = t match {
    case ArrayType(LongType, _) => Some(LongType)
    case ArrayType(StringType, _) => Some(StringType)
    case _ => None
  }

  /** Merge-join dot; `longKeys` selects the compare kernel. */
  def dot(longKeys: Boolean, at: ArrayData, aw: ArrayData,
      bt: ArrayData, bw: ArrayData): Long = {
    val na = at.numElements()
    val nb = bt.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    if (longKeys) {
      while (i < na && j < nb) {
        val x = at.getLong(i)
        val y = bt.getLong(j)
        if (x == y) {
          acc += aw.getLong(i) * bw.getLong(j)
          i += 1; j += 1
        } else if (x < y) i += 1
        else j += 1
      }
    } else {
      while (i < na && j < nb) {
        val c = at.getUTF8String(i).compareTo(bt.getUTF8String(j))
        if (c == 0) {
          acc += aw.getLong(i) * bw.getLong(j)
          i += 1; j += 1
        } else if (c < 0) i += 1
        else j += 1
      }
    }
    acc
  }
}

/** Exact integer dot product of two SPARSE vectors, each given as a pair of
  * parallel arrays: term keys sorted ascending (`array<bigint>` ids or
  * `array<string>` raw terms) and the matching integer weights
  * (`array<long>`). One sorted-merge pass per row — O(|a| + |b|) key
  * comparisons; zero allocation on the long-key path.
  *
  * This is the verification kernel of the all-pairs similarity join
  * (q211): candidate pairs join each side's pre-aggregated vector ONCE
  * (two slim joins against the n_docs-row vector table, which AQE
  * broadcasts when small), and the dot collapses in a map-stage
  * projection. The alternative — exploding pairs × terms and re-grouping
  * — shuffles |pairs| × terms-per-doc rows twice, which measured ~14x
  * slower at sf0.1 (110s vs 8s end-to-end; PLANS.md).
  *
  * Exactness: weights are longs, products accumulate in a long. The caller
  * guarantees the value domain (q211: w ≤ 1e7 per term, ≤ 1e3 terms →
  * |dot| ≤ 1e17 < 2^63); an overflowing domain must pre-scale, same
  * contract as the oracle's BIGINT arithmetic. Keys must be sorted
  * ascending and distinct within each vector — exactly what
  * `sort_array(collect_list(struct(key, w)))` over a (doc, key)-grouped
  * frame produces. Generates real code (doGenCode), same as
  * [[CosineSimExact]].
  */
case class SparseDotLong(aToks: Expression, aWs: Expression,
    bToks: Expression, bWs: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(aToks, aWs, bToks, bWs)

  override def dataType: DataType = LongType

  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ws(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val ka = SparseMerge.keyType(aToks.dataType)
    val kb = SparseMerge.keyType(bToks.dataType)
    if (ka.nonEmpty && ka == kb && ws(aWs.dataType) && ws(bWs.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "sparse_dot expects matching (array<bigint|string> keys, " +
          "array<bigint> weights) x 2, got " +
          children.map(_.dataType.catalogString).mkString(", "))
  }

  private lazy val longKeys =
    SparseMerge.keyType(aToks.dataType).contains(LongType)

  override def eval(input: InternalRow): Any = {
    val at = aToks.eval(input)
    val aw = aWs.eval(input)
    val bt = bToks.eval(input)
    val bw = bWs.eval(input)
    if (at == null || aw == null || bt == null || bw == null) return null
    kernel(at.asInstanceOf[ArrayData], aw.asInstanceOf[ArrayData],
      bt.asInstanceOf[ArrayData], bw.asInstanceOf[ArrayData])
  }

  /** Unboxed kernel shared by interpreted eval and the generated code. */
  def kernel(at: ArrayData, aw: ArrayData, bt: ArrayData,
      bw: ArrayData): Long =
    SparseMerge.dot(longKeys, at, aw, bt, bw)

  // real doGenCode (not CodegenFallback): the 4 array children evaluate
  // inside the whole-stage span; only the merge loop goes through one
  // unboxed call
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref =
      ctx.addReferenceObj("sparseDot", this, classOf[SparseDotLong].getName)
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(_.isNull.toString).mkString(" || ")
    ev.copy(code = code"""
      |${evs.map(_.code).mkString("\n")}
      |boolean ${ev.isNull} = $anyNull;
      |long ${ev.value} = -1L;
      |if (!${ev.isNull}) {
      |  ${ev.value} = $ref.kernel(${evs(0).value}, ${evs(1).value},
      |    ${evs(2).value}, ${evs(3).value});
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(aToks = newChildren(0), aWs = newChildren(1),
      bToks = newChildren(2), bWs = newChildren(3))

  override def prettyName: String = "sparse_dot"
}

object SparseDotLong {
  /** Register-and-call column entry point (see [[GraftFunctions]]). */
  def sparseDot(aToks: Column, aWs: Column, bToks: Column, bWs: Column)
      : Column =
    org.apache.spark.sql.functions.call_function(
      "sparse_dot", aToks, aWs, bToks, bWs)
}

/** Is `t` the FIRST common element of two sorted-ascending long arrays?
  * The exactly-once emission predicate of the all-pairs similarity join
  * (q211, round 15): a candidate pair surfacing on join term t is kept
  * iff t is the RAREST shared indexed term, i.e. the first match of the
  * two rarity-sorted prefix arrays. An early-exit sorted merge: the walk
  * stops at the FIRST equality (usually within a handful of steps), vs
  * `array_min(array_intersect(...))` which builds a hash set and scans
  * both arrays fully per candidate — measured ~2x end-to-end on the
  * candidate-mass-dominated gen-sf1 run (PLANS.md r15). Semantics are
  * identical when t occurs in both arrays (the join guarantees it);
  * rows where the arrays share nothing return false.
  */
case class SortedMinEq(a: Expression, b: Expression, t: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(a, b, t)

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(a, b).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }) && t.dataType == LongType
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "sorted_min_eq expects (array<bigint>, array<bigint>, bigint), " +
          s"got ${children.map(_.dataType.catalogString).mkString(", ")}")
  }

  /** Unboxed kernel shared by interpreted eval and generated code. */
  def kernel(at: ArrayData, bt: ArrayData, tv: Long): Boolean = {
    val na = at.numElements()
    val nb = bt.numElements()
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      val x = at.getLong(i)
      val y = bt.getLong(j)
      if (x == y) return x == tv
      else if (x < y) i += 1
      else j += 1
    }
    false
  }

  override def eval(input: InternalRow): Any = {
    val av = a.eval(input)
    val bv = b.eval(input)
    val tv = t.eval(input)
    if (av == null || bv == null || tv == null) return null
    kernel(av.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData],
      tv.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref =
      ctx.addReferenceObj("sortedMinEq", this, classOf[SortedMinEq].getName)
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(_.isNull.toString).mkString(" || ")
    ev.copy(code = code"""
      |${evs.map(_.code).mkString("\n")}
      |boolean ${ev.isNull} = $anyNull;
      |boolean ${ev.value} = false;
      |if (!${ev.isNull}) {
      |  ${ev.value} = $ref.kernel(${evs(0).value}, ${evs(1).value},
      |    ${evs(2).value});
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(a = newChildren(0), b = newChildren(1), t = newChildren(2))

  override def prettyName: String = "sorted_min_eq"
}

/** Fused τ=0.8 cosine acceptance for the all-pairs join: sorted-merge
  * integer dot (as [[SparseDotLong]]) + the exact integer accept test
  * 25·dot² ≥ 16·na·nb in 128-bit BigInteger arithmetic + the 4-digit cos²
  * proxy floor(d2/nanb · 1e4) for survivors; NULL for rejected pairs.
  *
  * One expression instead of a dot column + two DECIMAL(38,0) casts, a
  * decimal multiply chain, and a decimal-compare filter: the composed
  * decimal pipeline allocates several java.math.BigDecimal per candidate
  * row, and at 11M candidates (sf0.1) the fused long-key eval measured
  * ~5x faster end-to-end (PLANS.md). Value semantics are IDENTICAL to the
  * composed form and to the DuckDB oracle's HUGEINT arithmetic: products
  * of exact integers, correctly-rounded integer→double casts, one IEEE
  * division, floor. τ is this operator's contract (q211), hence the fixed
  * 25/16.
  */
case class SparseCosAccept(aToks: Expression, aWs: Expression,
    bToks: Expression, bWs: Expression, na: Expression, nb: Expression)
    extends Expression {

  override def children: Seq[Expression] =
    Seq(aToks, aWs, bToks, bWs, na, nb)

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ws(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val ka = SparseMerge.keyType(aToks.dataType)
    val kb = SparseMerge.keyType(bToks.dataType)
    if (ka.nonEmpty && ka == kb && ws(aWs.dataType) && ws(bWs.dataType) &&
        na.dataType == LongType && nb.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "sparse_cos_accept expects matching (array<bigint|string> keys, " +
          "array<bigint> weights) x 2 + 2 bigint norms, got " +
          children.map(_.dataType.catalogString).mkString(", "))
  }

  private lazy val longKeys =
    SparseMerge.keyType(aToks.dataType).contains(LongType)

  override def eval(input: InternalRow): Any = {
    val at = aToks.eval(input)
    val aw = aWs.eval(input)
    val bt = bToks.eval(input)
    val bw = bWs.eval(input)
    val n2a = na.eval(input)
    val n2b = nb.eval(input)
    if (at == null || aw == null || bt == null || bw == null ||
      n2a == null || n2b == null) return null
    kernel(at.asInstanceOf[ArrayData], aw.asInstanceOf[ArrayData],
      bt.asInstanceOf[ArrayData], bw.asInstanceOf[ArrayData],
      n2a.asInstanceOf[Long], n2b.asInstanceOf[Long])
  }

  /** Kernel shared by interpreted eval and the generated code: boxed
    * return because REJECTED pairs are NULL even on non-null inputs.
    */
  def kernel(at: ArrayData, aw: ArrayData, bt: ArrayData, bw: ArrayData,
      n2aL: Long, n2bL: Long): java.lang.Long = {
    val n2a: Any = n2aL
    val n2b: Any = n2bL
    val dot = SparseMerge.dot(longKeys, at, aw, bt, bw)
    // cheap sufficient double reject first: dot²·25 < na·nb·16 with a
    // relative-error margin far wider than the ~2^-50 the three double
    // products can accumulate — only near-threshold pairs (and accepts)
    // pay BigInteger. The margin keeps the DECISION exact: anything the
    // fast path rejects is provably below τ.
    val dd = dot.toDouble
    val fast = 25.0 * dd * dd
    val bound = 16.0 * n2a.asInstanceOf[Long].toDouble *
      n2b.asInstanceOf[Long].toDouble
    if (fast < bound * (1.0 - 1e-9)) return null
    // exact 128-bit accept: 25·dot² >= 16·na·nb (all operands are exact
    // nonneg longs; the caller's value domain keeps each product < 2^127)
    val d = java.math.BigInteger.valueOf(dot)
    val d2 = d.multiply(d)
    val nanb = java.math.BigInteger.valueOf(n2a.asInstanceOf[Long])
      .multiply(java.math.BigInteger.valueOf(n2b.asInstanceOf[Long]))
    val lhs = d2.multiply(java.math.BigInteger.valueOf(25L))
    val rhs = nanb.multiply(java.math.BigInteger.valueOf(16L))
    if (lhs.compareTo(rhs) < 0) null
    else {
      // BigInteger.doubleValue is correctly rounded — the same value as
      // the oracle's CAST(HUGEINT AS DOUBLE) and Spark's decimal→double
      java.lang.Long.valueOf(
        math.floor(d2.doubleValue() / nanb.doubleValue() * 10000.0).toLong)
    }
  }

  // real doGenCode: children evaluate inside the whole-stage span; the
  // boxed kernel result carries the reject-as-NULL semantics through
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sparseCos", this,
      classOf[SparseCosAccept].getName)
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(_.isNull.toString).mkString(" || ")
    val boxed = ctx.freshName("accepted")
    ev.copy(code = code"""
      |${evs.map(_.code).mkString("\n")}
      |boolean ${ev.isNull} = true;
      |long ${ev.value} = -1L;
      |if (!($anyNull)) {
      |  java.lang.Long $boxed = $ref.kernel(${evs(0).value},
      |    ${evs(1).value}, ${evs(2).value}, ${evs(3).value},
      |    ${evs(4).value}, ${evs(5).value});
      |  if ($boxed != null) {
      |    ${ev.isNull} = false;
      |    ${ev.value} = $boxed.longValue();
      |  }
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(aToks = newChildren(0), aWs = newChildren(1),
      bToks = newChildren(2), bWs = newChildren(3),
      na = newChildren(4), nb = newChildren(5))

  override def prettyName: String = "sparse_cos_accept"
}

object SparseCosAccept {
  /** Register-and-call column entry point (see [[GraftFunctions]]). */
  def sparseCosAccept(aToks: Column, aWs: Column, bToks: Column,
      bWs: Column, na: Column, nb: Column): Column =
    org.apache.spark.sql.functions.call_function(
      "sparse_cos_accept", aToks, aWs, bToks, bWs, na, nb)
}
