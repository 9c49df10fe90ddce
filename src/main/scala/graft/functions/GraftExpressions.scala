package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the engine's text-hash / vector kernels.
  *
  * Each is a thin codegen'd wrapper over the static kernels in
  * [[TextHash]]/[[VecOps]]: `doGenCode` emits a single static call, so the
  * expression participates in whole-stage codegen (one compiled call per row)
  * instead of falling back to Catalyst's interpreted higher-order functions.
  * Values are bit-identical to the SQL folds they replace (see TextHash doc),
  * which is what keeps the DuckDB oracle hash-compare valid.
  *
  * Registered per-session by [[GraftFunctions.register]]; use via
  * `expr("graft_minhash_sig(text)")` or `call_function`.
  */
case class PolyHashExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.polyHash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class TokenHashesExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.tokenHashes(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.tokenHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Null when the text has < 5 tokens (no 5-grams); see
  * [[TextHash.gram5Distinct]].
  */
case class Gram5DistinctExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram5_distinct"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.gram5Distinct(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextHash.gram5Distinct($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Positional word-n-gram chain hashes (TextHash.gramChain — array index =
  * 0-based token offset, the geometry d21's span verify consumes). `n` is a
  * plan-time constant (span threshold, not per-row data; intLit-validated
  * at registration). Null when the text has < n tokens.
  */
case class GramChainExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"graft_gram_chain n=$n out of range")
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_chain"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.gramChain(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextHash.gramChain($c, $n);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing anchor selection (TextHash.winnow): the distinct
  * window-minimum (pos, gram) pairs over the word-n-gram chain — d23's
  * w×-cheaper blocking key with the span ≥ n+w−1 completeness theorem.
  * `n`/`w` are plan-time constants (intLit-validated). Null when the text
  * has < n + w − 1 tokens.
  */
case class WinnowExpr(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  require(n >= 1 && w >= 1, s"graft_winnow n=$n w=$w out of range")
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p", IntegerType, nullable = false),
    StructField("g", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_winnow"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.winnow(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextHash.winnow($c, $n, $w);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct-hit count of a gram array against a SORTED broadcast snapshot
  * array (TextHash.sortedHits — s33's hot path; values bit-equal to
  * `size(array_intersect(gs, snap))` under the sorted-distinct snapshot
  * contract).
  */
case class SortedHitsExpr(gs: Expression, snap: Expression)
    extends BinaryExpression {
  override def left: Expression = gs
  override def right: Expression = snap
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // session-registered and reachable from ad-hoc SQL: wrong types must
    // fail analysis with a named message, not a runtime ClassCastException
    // from inside the kernel (round-14 advice — the same contract the
    // string kernels above enforce)
    def isLongArr(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (isLongArr(gs.dataType) && isLongArr(snap.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>), got " +
        s"(${gs.dataType.simpleString}, ${snap.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sorted_hits"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    TextHash.sortedHits(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHash.sortedHits($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(gs = newLeft, snap = newRight)
}

/** Distinct-hit count of a gram array against a broadcast BLOOM word array
  * (TextHash.bloomHits — d27/s35's hot path; `k` probes, plan-time
  * constant). The approximate counterpart of [[SortedHitsExpr]]: no false
  * negatives, measured false positives (d28).
  */
case class BloomHitsExpr(gs: Expression, bloom: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1 && k <= 16, s"graft_bloom_hits k=$k out of range [1, 16]")
  override def left: Expression = gs
  override def right: Expression = bloom
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isLongArr(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (isLongArr(gs.dataType) && isLongArr(bloom.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>), got " +
        s"(${gs.dataType.simpleString}, ${bloom.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_hits"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    TextHash.bloomHits(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHash.bloomHits($a, $b, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(gs = newLeft, bloom = newRight)
}

/** Null when the text has < 2 tokens (no bigram shingles). */
case class MinHashSigExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.minHashSig(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextHash.minHashSig($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Null when the text has < 4 codepoints (no full quarters). */
case class QuarterMeansExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quarter_means"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.quarterMeans(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextHash.quarterMeans($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class EdgeNgramsExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_uniq_grams", IntegerType, nullable = false),
    StructField("first5_grams", StringType, nullable = false)))
  override def prettyName: String = "graft_edge_ngrams"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.edgeNgramStats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.edgeNgramStats($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass repetition statistics (see [[TextHash.repStats]]). */
case class RepStatsExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_uniq_tokens", IntegerType, nullable = false),
    StructField("top_tok_n", IntegerType, nullable = false),
    StructField("top_bigram_n", IntegerType, nullable = false)))
  override def prettyName: String = "graft_rep_stats"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.repStats(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.repStats($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHashExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.simHash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simHash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shared input validation + float/double kernel dispatch for the vector
  * expressions. `AbstractDataType` is private to Spark, so ExpectsInputTypes
  * is unavailable — checkInputDataTypes gives the same clean analysis-time
  * error (instead of a runtime ClassCastException) for wrong inputs.
  */
trait VecExpr { self: Expression =>
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  protected def vecChildren: Seq[Expression]

  protected def elemType: DataType =
    vecChildren.head.dataType.asInstanceOf[ArrayType].elementType

  /** True for float elements; false for double. */
  protected def isFloatVec: Boolean = elemType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = vecChildren.forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }) && vecChildren.map(_.dataType.asInstanceOf[ArrayType].elementType)
      .distinct.size == 1
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or array<double> arguments of one " +
        s"element type, got ${vecChildren.map(_.dataType.simpleString).mkString(", ")}")
  }
}

case class DotFExpr(left: Expression, right: Expression)
    extends BinaryExpression with VecExpr {
  override protected def vecChildren: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch
  override def prettyName: String = "graft_dot"
  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    if (isFloatVec) VecOps.dotF(x, y) else VecOps.dotD(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloatVec) "dotF" else "dotD"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotRes")
      s"""java.lang.Double $r = graft.functions.VecOps.$fn($a, $b);
         if ($r == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $r.doubleValue(); }"""
    })
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class CosFExpr(left: Expression, right: Expression)
    extends BinaryExpression with VecExpr {
  override protected def vecChildren: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch / zero norm
  override def prettyName: String = "graft_cos"
  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    if (isFloatVec) VecOps.cosF(x, y) else VecOps.cosD(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloatVec) "cosF" else "cosD"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("cosRes")
      s"""java.lang.Double $r = graft.functions.VecOps.$fn($a, $b);
         if ($r == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $r.doubleValue(); }"""
    })
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared-L2 distance (VecOps.d2F/d2D): the x11 k-means assignment kernel —
  * one compiled call per (row, centroid) instead of two interpreted
  * `aggregate(zip_with(...))` folds. Same sequential fold as the SQL form,
  * so results stay bit-identical to the DuckDB oracle twin.
  */
case class D2Expr(left: Expression, right: Expression)
    extends BinaryExpression with VecExpr {
  override protected def vecChildren: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch
  override def prettyName: String = "graft_l2"
  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    if (isFloatVec) VecOps.d2F(x, y) else VecOps.d2D(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloatVec) "d2F" else "d2D"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("d2Res")
      s"""java.lang.Double $r = graft.functions.VecOps.$fn($a, $b);
         if ($r == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $r.doubleValue(); }"""
    })
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** One IVF-PQ asymmetric-distance term — encode `r`'s subspace window
  * against the codebook and score `rqe`'s window against the chosen
  * codeword in ONE compiled kernel (VecOps.adcTermD has the full value
  * contract and the bit-identity argument vs the slice+array_min HOF form
  * this replaces). `off`/`len` are plan-time constants like
  * [[LshBucketExpr]]'s bits: the subspace layout is index geometry, not
  * per-row data.
  */
case class AdcTermExpr(r: Expression, rqe: Expression, cents: Expression,
    off: Int, len: Int) extends TernaryExpression {
  require(off >= 0 && len >= 1,
    s"graft_adc_term off=$off len=$len out of range")
  override def first: Expression = r
  override def second: Expression = rqe
  override def third: Expression = cents
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_adc_term"
  protected override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    VecOps.adcTermD(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      c.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      off, len)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val res = ctx.freshName("adcRes")
      s"""java.lang.Double $res =
           graft.functions.VecOps.adcTermD($a, $b, $c, $off, $len);
         if ($res == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $res.doubleValue(); }"""
    })
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(r = newFirst, rqe = newSecond, cents = newThird)
}

/** The k-means assignment argmin as a compiled kernel returning
  * struct<dd double, c int> — the Lloyd hot path (VecOps.bestCellD has
  * the value contract; [[graft.ext.Similarity.bestCellExpr]] is the one
  * shared SQL spelling).
  */
case class BestCellExpr(e: Expression, cents: Expression)
    extends BinaryExpression {
  override def left: Expression = e
  override def right: Expression = cents
  override def dataType: DataType = StructType(Seq(
    StructField("dd", DoubleType, nullable = false),
    StructField("c", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_best_cell"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.bestCellD(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("bestCell")
      s"""org.apache.spark.sql.catalyst.InternalRow $res =
           graft.functions.VecOps.bestCellD($a, $b);
         if ($res == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $res; }"""
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(e = newLeft, cents = newRight)
}

/** Encode-only subspace argmin (x18's flat-PQ code_s) — cluster id of the
  * (dd, cluster)-argmin codeword for the `[off, off+len)` window.
  */
case class CodeExpr(e: Expression, cents: Expression, off: Int, len: Int)
    extends BinaryExpression {
  require(off >= 0 && len >= 1, s"graft_code off=$off len=$len out of range")
  override def left: Expression = e
  override def right: Expression = cents
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_code"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.codeD(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      off, len)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("codeRes")
      s"""java.lang.Integer $res =
           graft.functions.VecOps.codeD($a, $b, $off, $len);
         if ($res == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $res.intValue(); }"""
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(e = newLeft, cents = newRight)
}

/** `bits` is a plan-time constant (like the generator literals below), not
  * a child expression: plane count shapes the physical candidate volume,
  * and a per-row-varying width has no meaning for a blocking key. Higher
  * bits refine lower (VecOps.lshBucket doc), which is what lets callers
  * raise it with corpus size.
  */
case class LshBucketExpr(child: Expression, bits: Int = 8)
    extends UnaryExpression with VecExpr {
  // 0 planes = every vector in one cell (quadratic blocking); > 30 planes
  // overflow the Int bucket (1 << 32 wraps to bit 0 and silently breaks
  // the higher-bits-refine-lower law).
  require(bits >= 1 && bits <= 30,
    s"graft_lsh_bucket bits=$bits out of range [1, 30]")
  override protected def vecChildren: Seq[Expression] = Seq(child)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lsh_bucket"
  protected override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (isFloatVec) VecOps.lshBucket(x, bits) else VecOps.lshBucketD(x, bits)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloatVec) "lshBucket" else "lshBucketD"
    defineCodeGen(ctx, ev, c => s"graft.functions.VecOps.$fn($c, $bits)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** INT8 symmetric scalar quantization codes (VecOps.q127F/D): the x09/x10
  * quantized-retrieval hot path as ONE compiled pass per vector instead of
  * interpreted `transform`/`array_max` lambdas (measured ~6× on the sf1
  * embeddings corpus). Null for all-zero vectors.
  */
case class Q127Expr(child: Expression)
    extends UnaryExpression with VecExpr {
  override protected def vecChildren: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null on all-zero vector
  override def prettyName: String = "graft_q127"
  protected override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (isFloatVec) VecOps.q127F(x) else VecOps.q127D(x)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloatVec) "q127F" else "q127D"
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("qRes")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
           graft.functions.VecOps.$fn($c);
         if ($r == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $r; }"""
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact int64 dot product of two BIGINT code arrays (VecOps.dotI); null on
  * length mismatch — the x09/x10 integer scoring kernel.
  */
case class DotIExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<bigint> arguments, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null on length mismatch
  override def prettyName: String = "graft_doti"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotI(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotIRes")
      s"""java.lang.Long $r = graft.functions.VecOps.dotI($a, $b);
         if ($r == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $r.longValue(); }"""
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** KMV set-union estimate over two serialized sketch columns (see
  * [[KmvBuffer.unionEstimate]]) — sketch algebra without the raw data.
  */
case class KmvUnionEstExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two binary sketch arguments, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kmv_union_est"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    KmvBuffer.unionEstimate(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.KmvBuffer.unionEstimate($a, $b, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Custom Catalyst GENERATOR (the table-function rung next to the scalar
  * expressions above and the aggregates in [[KmvSketch]]): sliding
  * token windows of `n` tokens every `stride`, one output row per window.
  *
  * Why a Generator and not `explode(transform(sequence(...), ...))`: the
  * built-in form materializes the COMPLETE window array per input row
  * before exploding — a 1 M-token document with stride 4 builds a ~250 k
  * element array (each holding an n-token string slice) in executor
  * memory. A Generator's contract is an iterator: [[GenerateExec]] pulls
  * windows one at a time, so peak memory is one window regardless of
  * document size. That is the same stream-don't-materialize discipline as
  * m07's bounded tile explode, applied where the blow-up factor is
  * row-dependent. CodegenFallback is deliberate: GenerateExec's codegen
  * path only covers the explode family, and the per-window work (a slice
  * + join) dwarfs the virtual-call overhead.
  *
  * Token split is `split(" ", -1)` — empties kept, matching DuckDB's
  * string_split semantics (see TextHash doc for the shared contract).
  */
case class TokenWindowsExpr(child: Expression, n: Int, stride: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n > 0 && stride > 0, "window size and stride must be positive")
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def elementSchema: StructType = StructType(Seq(
    StructField("win_idx", IntegerType, nullable = false),
    StructField("win_text", StringType, nullable = false)))
  override def prettyName: String = "graft_token_windows"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val toks = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toString.split(" ", -1)
      Range(0, toks.length, stride).iterator.zipWithIndex.map {
        case (st, i) =>
          val win = toks.slice(st, math.min(st + n, toks.length))
            .mkString(" ")
          org.apache.spark.sql.catalyst.InternalRow(i,
            org.apache.spark.unsafe.types.UTF8String.fromString(win))
      }
    }
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Character n-gram GENERATOR: streams the len-n+1 sliding n-grams of a
  * string out of GenerateExec one at a time — the t18 trigram-LM feed. A
  * compiled single pass replaces the interpreted
  * `explode(transform(sequence(1, len-n+1), i -> substring(text, i, n)))`
  * HOF chain (measured 6× the oracle at sf0.1: one interpreted lambda +
  * UTF8String allocation per position, plus the materialized per-doc
  * position array this never builds). Code-point addressed, so semantics
  * match `substring` on any input, not just ASCII.
  */
case class CharGramsExpr(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n > 0, "gram width must be positive")
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def elementSchema: StructType = StructType(Seq(
    StructField("g", StringType, nullable = false)))
  override def prettyName: String = "graft_char_grams"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      val len = s.numChars()
      if (len < n) Iterator.empty
      else Iterator.range(0, len - n + 1).map { i =>
        org.apache.spark.sql.catalyst.InternalRow(s.substring(i, i + n))
      }
    }
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Aligned w-token passages of a string — see [[TextHash.passages]]. */
case class PassagesExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType != StringType || right.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    // The documented transform/sequence/slice equivalence divides by w, so
    // w < 1 has no defined meaning; reject a foldable non-positive width at
    // analysis time rather than silently returning one whole-text passage.
    else if (right.foldable && {
        val v = right.eval(); v != null && v.asInstanceOf[Int] < 1 })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName passage width must be >= 1")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_passages"
  protected override def nullSafeEval(s: Any, w: Any): Any =
    TextHash.passages(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, w) => s"graft.functions.TextHash.passages($s, $w)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** t09's blocklist scrub + per-term counts in one byte scan
  * (TextHash.blockScrub): struct(n_<term>..., n_hits, scrub). Field names
  * derive from TextHash.blockTerms so the kernel and the query column list
  * can't drift.
  */
case class BlockScrubExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(
    TextHash.blockTerms.map(t => StructField(
      "n_" + t.toLowerCase.replaceAll("[^a-z0-9]+", "_"),
      IntegerType, nullable = false)) ++ Seq(
      StructField("n_hits", IntegerType, nullable = false),
      StructField("scrub", StringType, nullable = false)))
  override def prettyName: String = "graft_block_scrub"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.blockScrub(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.blockScrub($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** t02's quality counters in one byte scan (TextHash.qualityStats):
  * struct(n_space, n_punct, n_stop).
  */
case class QualityStatsExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_space", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))
  override def prettyName: String = "graft_quality_stats"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.qualityStats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.qualityStats($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** t03's token stats (TextHash.bpeishStats) — one byte scan replicating
  * regexp_extract_all('[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]') counts + the
  * whitespace-split size: struct(n_bpeish, n_uniq_bpeish, n_ws_tokens).
  */
case class BpeishStatsExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_bpeish", IntegerType, nullable = false),
    StructField("n_uniq_bpeish", IntegerType, nullable = false),
    StructField("n_ws_tokens", IntegerType, nullable = false)))
  override def prettyName: String = "graft_bpeish_stats"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.bpeishStats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.bpeishStats($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** t14's passage scrub against a broadcast SORTED lexicon
  * (TextHash.scrubPassages): struct(clean_text, n_removed). `w` is a
  * plan-time constant (intLit-validated at registration).
  */
case class ScrubPassagesExpr(text: Expression, w: Int, bp: Expression)
    extends BinaryExpression {
  require(w >= 1, s"graft_scrub_passages w=$w must be >= 1")
  override def left: Expression = text
  override def right: Expression = bp
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (text.dataType == StringType &&
        (bp.dataType match {
          case ArrayType(StringType, _) => true
          case _ => false
        }))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, array<string>), got " +
        s"(${text.dataType.simpleString}, ${bp.dataType.simpleString})")
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))
  override def prettyName: String = "graft_scrub_passages"
  protected override def nullSafeEval(s: Any, b: Any): Any =
    TextHash.scrubPassages(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w,
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, b) => s"graft.functions.TextHash.scrubPassages($s, $w, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, bp = newRight)
}

/** t15's per-doc df score against the broadcast model — parallel SORTED
  * arrays ts (tokens, UTF8_BINARY order) / ds (document frequencies)
  * (TextHash.tokDf): struct(n_toks, sum_df) over the row's DISTINCT
  * tokens; model misses contribute nothing (the inner-join contract).
  */
case class TokDfExpr(text: Expression, ts: Expression, ds: Expression)
    extends TernaryExpression {
  override def first: Expression = text
  override def second: Expression = ts
  override def third: Expression = ds
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = text.dataType == StringType &&
      (ts.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }) &&
      (ds.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, array<string>, array<bigint>), got " +
        s"(${text.dataType.simpleString}, ${ts.dataType.simpleString}, " +
        s"${ds.dataType.simpleString})")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("sum_df", LongType, nullable = false)))
  override def prettyName: String = "graft_tok_df"
  protected override def nullSafeEval(s: Any, a: Any, b: Any): Any =
    TextHash.tokDf(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, a, b) => s"graft.functions.TextHash.tokDf($s, $a, $b)")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(text = newFirst, ts = newSecond, ds = newThird)
}

/** t17's OOV counters against the broadcast SORTED top-K vocabulary
  * (TextHash.oovStats): struct(n_tokens, n_oov) over every token
  * occurrence of the row.
  */
case class OovStatsExpr(text: Expression, vocab: Expression)
    extends BinaryExpression {
  override def left: Expression = text
  override def right: Expression = vocab
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (text.dataType == StringType &&
        (vocab.dataType match {
          case ArrayType(StringType, _) => true
          case _ => false
        }))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, array<string>), got " +
        s"(${text.dataType.simpleString}, ${vocab.dataType.simpleString})")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_oov", LongType, nullable = false)))
  override def prettyName: String = "graft_oov_stats"
  protected override def nullSafeEval(s: Any, v: Any): Any =
    TextHash.oovStats(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, v) => s"graft.functions.TextHash.oovStats($s, $v)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, vocab = newRight)
}

/** t01's per-language marker scores (TextHash.langScores) — one byte scan
  * producing struct(s_en, s_de, s_fr, s_es); field names derive from
  * TextHash.langMarkers so kernel and query column list can't drift.
  */
case class LangScoresExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(
    TextHash.langMarkers.map { case (lang, _) =>
      StructField(s"s_$lang", LongType, nullable = false)
    })
  override def prettyName: String = "graft_lang_scores"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.langScores(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.langScores($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One BPE merge round over a token array (TextHash.bpeMerge) — the
  * applyMerge hot path: (array<string>, string, string) → array<string>.
  * a/b usually come from the broadcast 1-row winner, so they are columns,
  * not literals.
  */
case class BpeMergeExpr(toks: Expression, a: Expression, b: Expression)
    extends TernaryExpression {
  override def first: Expression = toks
  override def second: Expression = a
  override def third: Expression = b
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (toks.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }) && a.dataType == StringType && b.dataType == StringType
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, string, string), got " +
        s"(${toks.dataType.simpleString}, ${a.dataType.simpleString}, " +
        s"${b.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge"
  protected override def nullSafeEval(t: Any, av: Any, bv: Any): Any =
    TextHash.bpeMerge(
      t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      av.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      bv.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, av, bv) => s"graft.functions.TextHash.bpeMerge($t, $av, $bv)")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(toks = newFirst, a = newSecond, b = newThird)
}

/** Distinct single-space-split tokens, first-occurrence order
  * (TextHash.distinctTokens) — bit-identical to
  * array_distinct(split(text, ' ')) in one fused pass. string →
  * array<string>.
  */
case class DistinctTokensExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_distinct_tokens"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.distinctTokens(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.distinctTokens($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct aligned w-token passages, first-occurrence order
  * (TextHash.passagesDistinct) — bit-identical to
  * array_distinct(graft_passages(text, w)) in one fused pass. `w` is a
  * plan-time constant (intLit-validated at registration).
  */
case class PassagesDistinctExpr(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, s"graft_passages_distinct w=$w must be >= 1")
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_passages_distinct"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.passagesDistinct(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.passagesDistinct($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** t07/d12's normalization tail (TextHash.normText) over an ALREADY
  * lowercased input: delete [.,!?;:], collapse space runs, trim edges —
  * one byte pass replacing two regexp_replace passes. string → string.
  */
case class NormTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_norm_text"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.normText(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.normText($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Perceptual media signature (TextHash.dHash) — m09's difference hash
  * over stride-sampled payload bytes; `bits` is a plan-time constant
  * (intLit-validated). Null when the payload is shorter than bits+1 bytes.
  */
case class DHashExpr(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 62, s"graft_dhash bits=$bits out of range")
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dhash"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.dHash(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long dh = graft.functions.TextHash.dHash($c, $bits);
      if (dh == null) { ${ev.isNull} = true; } else { ${ev.value} = dh.longValue(); }
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Alignment-tolerant media signature (TextHash.byteMinhash) — d29/m10's
  * 4×15-bit packed byte-k-gram min-hash; `k` is a plan-time constant
  * (intLit-validated). Null when the payload has fewer than k bytes.
  */
case class ByteMinhashExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 64, s"graft_byte_minhash k=$k out of range")
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_byte_minhash"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.byteMinhash(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long bm = graft.functions.TextHash.byteMinhash($c, $k);
      if (bm == null) { ${ev.isNull} = true; } else { ${ev.value} = bm.longValue(); }
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** d29's untruncated min-hash signature (TextHash.byteMinhashArr) —
  * `n` raw byte-k-gram min-hashes as array<bigint>: [0..3] = the m10
  * blocks BEFORE 15-bit truncation (block-key width becomes a join-time
  * knob), [4..n) = the verify-sketch mixes. `k`/`n` are plan-time
  * constants (intLit-validated). Null when the payload is shorter than k.
  */
case class ByteMinhashArrExpr(child: Expression, k: Int, n: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 64, s"graft_byte_minhash_arr k=$k out of range")
  require(n >= 1 && n <= 20, s"graft_byte_minhash_arr n=$n out of range")
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_byte_minhash_arr"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.byteMinhashArr(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ba =
        graft.functions.TextHash.byteMinhashArr($c, $k, $n);
      if (ba == null) { ${ev.isNull} = true; } else { ${ev.value} = ba; }
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** t21's n-gram profile hit counter (TextHash.gramHits): count of n-byte
  * windows of the text equal to any member of the (literal) profile
  * array. (string, array<string>) → int.
  */
case class GramHitsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType &&
        right.dataType.isInstanceOf[ArrayType] &&
        right.dataType.asInstanceOf[ArrayType].elementType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, array<string>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_gram_hits"
  protected override def nullSafeEval(s: Any, grams: Any): Any =
    TextHash.gramHits(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      grams.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, g) =>
      s"graft.functions.TextHash.gramHits($s, $g)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Gram → big-endian packed long (TextHash.packGram) — the merged
  * language-id artifact's plan-time pre-pack (round 20). string → bigint.
  */
case class PackGramExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pack_gram"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.packGram(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.packGram($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** t21's merged all-languages profile scorer (TextHash.gramHitsAll):
  * (text string, profs array<struct<w int, packed array<bigint>,
  * li array<int>>>, nlangs intlit) → array<int> of per-language hit
  * counts. One rolling byte scan per DISTINCT gram width — flat in
  * language count; see the kernel's scaladoc for the scale law.
  */
case class GramHitsAllExpr(left: Expression, right: Expression, nlangs: Int)
    extends BinaryExpression {
  require(nlangs >= 1 && nlangs <= 4096,
    s"graft_gram_hits_all nlangs=$nlangs out of range [1, 4096]")
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val profOk = right.dataType match {
      case ArrayType(st: StructType, _) => st.length == 3 &&
        st(0).dataType == IntegerType &&
        st(1).dataType.isInstanceOf[ArrayType] &&
        st(1).dataType.asInstanceOf[ArrayType].elementType == LongType &&
        st(2).dataType.isInstanceOf[ArrayType] &&
        st(2).dataType.asInstanceOf[ArrayType].elementType == IntegerType
      case _ => false
    }
    if (left.dataType == StringType && profOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, array<struct<int, array<bigint>, " +
        s"array<int>>>), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_gram_hits_all"
  protected override def nullSafeEval(s: Any, profs: Any): Any =
    TextHash.gramHitsAll(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      profs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      nlangs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, g) =>
      s"graft.functions.TextHash.gramHitsAll($s, $g, $nlangs)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Char-n-gram model buckets (TextHash.gramBuckets) — t18's model-build
  * feed: one compiled pass per row, no per-position UTF8String. Null when
  * the text has < n codepoints.
  */
case class GramBucketsExpr(child: Expression, n: Int, m: Long)
    extends UnaryExpression {
  require(n >= 1 && n <= 64, s"graft_gram_buckets n=$n out of range [1, 64]")
  require(m >= 1, s"graft_gram_buckets m=$m must be positive")
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_buckets"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.gramBuckets(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextHash.gramBuckets($c, $n, ${m}L);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whole-document trigram-LM scoring (TextHash.lmFamiliarity) — t18's
  * probe: per char-n-gram bucket, binary-search the broadcast SORTED model
  * array, accumulate (n_tris, familiarity). Null when the text has < n
  * codepoints (the exploded twin emitted no rows for such docs).
  */
case class LmFamiliarityExpr(first: Expression, second: Expression,
    third: Expression, n: Int, m: Long)
    extends TernaryExpression {
  require(n >= 1 && n <= 64, s"graft_lm_familiarity n=$n out of range [1, 64]")
  require(m >= 1, s"graft_lm_familiarity m=$m must be positive")
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def longArr(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (first.dataType == StringType && longArr(second) && longArr(third))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, array<bigint>, array<bigint>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_tris", LongType, nullable = false),
    StructField("familiarity", LongType, nullable = false)))
  override def prettyName: String = "graft_lm_familiarity"
  protected override def nullSafeEval(s: Any, bs: Any, cs: Any): Any =
    TextHash.lmFamiliarity(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, m,
      bs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      cs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, bs, cs) => s"""
      ${ev.value} = graft.functions.TextHash.lmFamiliarity($s, $n, ${m}L, $bs, $cs);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Positional byte-k-gram rolling hashes (TextHash.byteGramChain) — the
  * byte-level twin of graft_gram_chain; d29's exact Jaccard verify input.
  */
case class ByteGramChainExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 64, s"graft_byte_grams k=$k out of range")
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.simpleString}")
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_byte_grams"
  protected override def nullSafeEval(input: Any): Any =
    TextHash.byteGramChain(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TextHash.byteGramChain($c, $k);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Strided byte-sample thumbnail hex (TextHash.thumbHex) — m05's one-pass
  * resize kernel; the HOF form it replaces re-hexed the whole text per
  * sampled byte.
  */
case class ThumbHexExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType != StringType || right.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (right.foldable && {
        val v = right.eval(); v != null && v.asInstanceOf[Int] < 1 })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName byte budget must be >= 1")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_thumb"
  protected override def nullSafeEval(s: Any, k: Any): Any =
    TextHash.thumbHex(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, k) => s"graft.functions.TextHash.thumbHex($s, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fixed-width hex tile chunks (TextHash.hexTiles) — m07's explode kernel;
  * the HOF form it replaces materialized the full hex string per row and
  * sliced it with an interpreted lambda per tile.
  */
case class HexTilesExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType != StringType || right.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, int), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if (right.foldable && {
        val v = right.eval(); v != null && v.asInstanceOf[Int] < 1 })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName tile byte width must be >= 1")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_hex_tiles"
  protected override def nullSafeEval(s: Any, w: Any): Any =
    TextHash.hexTiles(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, w) => s"graft.functions.TextHash.hexTiles($s, $w)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-session registration of the engine's native functions. */
object GraftFunctions {
  /** Plan-time int-literal extraction for trailing geometry args (subspace
    * offsets/widths, band counts). These functions are registered
    * session-wide where ad-hoc SQL can reach them, and the bare
    * `eval(null).asInstanceOf[Int]` this replaces threw an opaque
    * NPE/ClassCastException from inside function resolution on a column
    * reference or a Long literal (round-13 advice) — reject non-foldable
    * or non-int args with an AnalysisException naming the function and
    * the constraint instead.
    */
  private def intLit(fn: String, arg: String, e: Expression): Int = {
    def fail(got: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_TEMP_3102", // bare `<msg>` template
        Map("msg" ->
          (s"$fn: argument <$arg> must be a foldable INT literal " +
            s"(plan-time geometry, not per-row data); got $got")))
    if (!e.foldable) fail(s"non-foldable expression ${e.sql}")
    else if (e.dataType != IntegerType) fail(s"type ${e.dataType.simpleString}")
    else e.eval(null) match {
      case i: Int => i
      case _ => fail("NULL")
    }
  }

  /** Arity gate for the registration lambdas: every builder below indexes
    * `cs(i)` positionally, so ad-hoc SQL calling with too few args hit an
    * opaque IndexOutOfBoundsException from inside function resolution
    * (round-14 advice) — reject with the same named AnalysisException
    * intLit raises. `maxN` covers the optional-trailing-arg forms
    * (graft_lsh_bucket's bits defaulting).
    */
  /** Long-geometry variant of intLit: accepts a foldable INT or BIGINT
    * literal. graft_gram_buckets / graft_lm_familiarity take a bucket
    * count that is Long-ranged in the Scala API (TextOps.trigramFamiliarity
    * signature); forcing it through intLit silently shrank the accepted
    * range to Int (round-20 advice) — restore the full Long range here.
    */
  private def longLit(fn: String, arg: String, e: Expression): Long = {
    def fail(got: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_TEMP_3102",
        Map("msg" ->
          (s"$fn: argument <$arg> must be a foldable INT or BIGINT literal " +
            s"(plan-time geometry, not per-row data); got $got")))
    if (!e.foldable) fail(s"non-foldable expression ${e.sql}")
    else if (e.dataType != IntegerType && e.dataType != LongType)
      fail(s"type ${e.dataType.simpleString}")
    else e.eval(null) match {
      case i: Int  => i.toLong
      case l: Long => l
      case _ => fail("NULL")
    }
  }

  private def arity(fn: String, n: Int, maxN: Int = -1)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression = {
    val hi = if (maxN < 0) n else maxN
    cs =>
      if (cs.length >= n && cs.length <= hi) b(cs)
      else throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_TEMP_3102",
        Map("msg" -> (s"$fn expects " +
          (if (hi == n) s"$n argument(s)" else s"$n to $hi arguments") +
          s", got ${cs.length}")))
  }

  val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_poly_hash"    -> arity("graft_poly_hash", 1)(cs => PolyHashExpr(cs.head)),
    "graft_token_hashes" -> arity("graft_token_hashes", 1)(cs => TokenHashesExpr(cs.head)),
    "graft_minhash_sig"  -> arity("graft_minhash_sig", 1)(cs => MinHashSigExpr(cs.head)),
    "graft_gram5_distinct" -> arity("graft_gram5_distinct", 1)(cs => Gram5DistinctExpr(cs.head)),
    "graft_gram_chain"   -> arity("graft_gram_chain", 2)(cs => GramChainExpr(cs(0),
      intLit("graft_gram_chain", "n", cs(1)))),
    "graft_sorted_hits"  -> arity("graft_sorted_hits", 2)(cs => SortedHitsExpr(cs(0), cs(1))),
    "graft_bloom_hits"   -> arity("graft_bloom_hits", 3)(cs => BloomHitsExpr(cs(0), cs(1),
      intLit("graft_bloom_hits", "k", cs(2)))),
    "graft_winnow"       -> arity("graft_winnow", 3)(cs => WinnowExpr(cs(0),
      intLit("graft_winnow", "n", cs(1)),
      intLit("graft_winnow", "w", cs(2)))),
    "graft_simhash"      -> arity("graft_simhash", 1)(cs => SimHashExpr(cs.head)),
    "graft_rep_stats"    -> arity("graft_rep_stats", 1)(cs => RepStatsExpr(cs.head)),
    "graft_passages"     -> arity("graft_passages", 2)(cs => PassagesExpr(cs(0), cs(1))),
    "graft_quarter_means" -> arity("graft_quarter_means", 1)(cs => QuarterMeansExpr(cs.head)),
    "graft_edge_ngrams"  -> arity("graft_edge_ngrams", 1)(cs => EdgeNgramsExpr(cs.head)),
    "graft_dot"          -> arity("graft_dot", 2)(cs => DotFExpr(cs(0), cs(1))),
    "graft_cos"          -> arity("graft_cos", 2)(cs => CosFExpr(cs(0), cs(1))),
    "graft_l2"           -> arity("graft_l2", 2)(cs => D2Expr(cs(0), cs(1))),
    // trailing off/len must be int literals (plan-time subspace layout) —
    // validated by intLit, which raises a named AnalysisException instead
    // of the opaque NPE/CCE a column reference or Long literal used to hit
    "graft_adc_term"     -> arity("graft_adc_term", 5)(cs => AdcTermExpr(cs(0), cs(1), cs(2),
      intLit("graft_adc_term", "off", cs(3)),
      intLit("graft_adc_term", "len", cs(4)))),
    "graft_best_cell"    -> arity("graft_best_cell", 2)(cs => BestCellExpr(cs(0), cs(1))),
    "graft_code"         -> arity("graft_code", 4)(cs => CodeExpr(cs(0), cs(1),
      intLit("graft_code", "off", cs(2)),
      intLit("graft_code", "len", cs(3)))),
    "graft_q127"         -> arity("graft_q127", 1)(cs => Q127Expr(cs.head)),
    "graft_doti"         -> arity("graft_doti", 2)(cs => DotIExpr(cs(0), cs(1))),
    "graft_dhash"        -> arity("graft_dhash", 2)(cs => DHashExpr(cs(0),
      intLit("graft_dhash", "bits", cs(1)))),
    "graft_byte_minhash" -> arity("graft_byte_minhash", 2)(cs => ByteMinhashExpr(cs(0),
      intLit("graft_byte_minhash", "k", cs(1)))),
    "graft_byte_minhash_arr" -> arity("graft_byte_minhash_arr", 3)(cs =>
      ByteMinhashArrExpr(cs(0),
        intLit("graft_byte_minhash_arr", "k", cs(1)),
        intLit("graft_byte_minhash_arr", "n", cs(2)))),
    "graft_byte_grams"   -> arity("graft_byte_grams", 2)(cs => ByteGramChainExpr(cs(0),
      intLit("graft_byte_grams", "k", cs(1)))),
    "graft_gram_hits"    -> arity("graft_gram_hits", 2)(cs => GramHitsExpr(cs(0), cs(1))),
    "graft_pack_gram"    -> arity("graft_pack_gram", 1)(cs => PackGramExpr(cs.head)),
    "graft_gram_hits_all" -> arity("graft_gram_hits_all", 3)(cs =>
      GramHitsAllExpr(cs(0), cs(1),
        intLit("graft_gram_hits_all", "nlangs", cs(2)))),
    "graft_gram_buckets" -> arity("graft_gram_buckets", 3)(cs =>
      GramBucketsExpr(cs(0),
        intLit("graft_gram_buckets", "n", cs(1)),
        longLit("graft_gram_buckets", "m", cs(2)))),
    "graft_lm_familiarity" -> arity("graft_lm_familiarity", 5)(cs =>
      LmFamiliarityExpr(cs(0), cs(3), cs(4),
        intLit("graft_lm_familiarity", "n", cs(1)),
        longLit("graft_lm_familiarity", "m", cs(2)))),
    "graft_thumb"        -> arity("graft_thumb", 2)(cs => ThumbHexExpr(cs(0), cs(1))),
    "graft_hex_tiles"    -> arity("graft_hex_tiles", 2)(cs => HexTilesExpr(cs(0), cs(1))),
    "graft_block_scrub"  -> arity("graft_block_scrub", 1)(cs => BlockScrubExpr(cs.head)),
    "graft_bpeish_stats" -> arity("graft_bpeish_stats", 1)(cs =>
      BpeishStatsExpr(cs.head)),
    "graft_scrub_passages" -> arity("graft_scrub_passages", 3)(cs =>
      ScrubPassagesExpr(cs(0),
        intLit("graft_scrub_passages", "w", cs(1)), cs(2))),
    "graft_tok_df"       -> arity("graft_tok_df", 3)(cs =>
      TokDfExpr(cs(0), cs(1), cs(2))),
    "graft_oov_stats"    -> arity("graft_oov_stats", 2)(cs =>
      OovStatsExpr(cs(0), cs(1))),
    "graft_norm_text"    -> arity("graft_norm_text", 1)(cs =>
      NormTextExpr(cs.head)),
    "graft_distinct_tokens" -> arity("graft_distinct_tokens", 1)(cs =>
      DistinctTokensExpr(cs.head)),
    "graft_bpe_merge"    -> arity("graft_bpe_merge", 3)(cs =>
      BpeMergeExpr(cs(0), cs(1), cs(2))),
    "graft_lang_scores"  -> arity("graft_lang_scores", 1)(cs =>
      LangScoresExpr(cs.head)),
    "graft_passages_distinct" -> arity("graft_passages_distinct", 2)(cs =>
      PassagesDistinctExpr(cs(0),
        intLit("graft_passages_distinct", "w", cs(1)))),
    "graft_quality_stats" -> arity("graft_quality_stats", 1)(cs => QualityStatsExpr(cs.head)),
    "graft_lsh_bucket"   -> arity("graft_lsh_bucket", 1, 2)(cs => LshBucketExpr(cs.head,
      if (cs.length > 1) intLit("graft_lsh_bucket", "bits", cs(1)) else 8)),
    // mergeable KMV distinct sketch (analyzer wraps the raw AggregateFunction)
    "graft_kmv"          -> arity("graft_kmv", 1)(cs => KmvSketchAgg(cs.head, 64)),
    // mergeable k-means centroid accumulator; trailing k is an int literal
    "graft_centroids"    -> arity("graft_centroids", 3)(cs => CentroidSumAgg(cs(0), cs(1),
      intLit("graft_centroids", "k", cs(2)))),
    "graft_kmv_union_est" -> arity("graft_kmv_union_est", 2)(cs => KmvUnionEstExpr(cs(0), cs(1), 64)),
    // generators (table functions): trailing args must be int literals
    "graft_token_windows" -> arity("graft_token_windows", 3)(cs => TokenWindowsExpr(cs(0),
      intLit("graft_token_windows", "width", cs(1)),
      intLit("graft_token_windows", "stride", cs(2)))),
    "graft_char_grams"   -> arity("graft_char_grams", 2)(cs => CharGramsExpr(cs(0),
      intLit("graft_char_grams", "n", cs(1))))
  )

  /** Idempotent: safe to call at the head of every query builder. */
  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.GraftExpressions", name),
      builder)
  }
}

/** Library entry point for session-builder wiring: sessions created with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) expose every graft_* function in
  * SQL without an explicit register() call.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.fns.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftExpressions", name),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKFilterPushdown)
  }
}
