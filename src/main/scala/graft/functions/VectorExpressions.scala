package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * Codegen'd double-precision dot product over two numeric array columns.
 *
 * Spark's higher-order functions (`zip_with` + `aggregate`) express the
 * same math but never enter whole-stage codegen — every element goes
 * through an interpreted lambda with boxing. For ANN / near-dup scoring
 * the dot product sits inside an O(candidate-pairs) loop, so this is THE
 * hot expression of the similarity stack; the generated code is a tight
 * primitive loop over `ArrayData` with no allocation.
 *
 * Semantics match the HOF formulation exactly: left-to-right summation in
 * double precision (bit-for-bit reproducible, DuckDB-oracle-portable).
 * Mismatched vector lengths raise (a malformed embedding must fail loudly,
 * not score as a silent prefix dot); a null ELEMENT yields a null result —
 * the same null the `zip_with`/`aggregate` form propagates. The null scan
 * is only emitted when the array type says elements can be null, so the
 * codegen'd hot loop stays branch-free for non-null vectors.
 */
case class DotProductExpr(left: Expression, right: Expression,
    lenient: Boolean = false) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = lenient ||
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"dot_product needs array<float|double>, got $t")
  }

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // strict: a malformed embedding fails loudly. lenient (the optimizer-
    // rewrite target, RewriteHofDotProduct): mismatched lengths yield
    // null — EXACTLY what aggregate(zip_with(a,b,*),0.0,+) computes,
    // because zip_with pads the shorter side with nulls.
    if (x.numElements() != y.numElements()) {
      if (lenient) return null
      throw new IllegalArgumentException(
        s"dot_product: vector length mismatch ${x.numElements()} vs ${y.numElements()}")
    }
    val n = x.numElements()
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val checkNulls = elemNullable(left) || elemNullable(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names for EVERY local including loop variables: the spliced
      // block can be nested inside generated code that already declares a
      // local of the same name, and Java forbids local shadowing — a fixed
      // `int i` kicked whole projections back to the interpreted path
      // (janino: "Redefinition of local variable i", seen round 3)
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val i = ctx.freshName("i")
      val lGet = if (elemIsFloat(left)) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val rGet = if (elemIsFloat(right)) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      val nullCheck =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val mismatch =
        if (lenient) s"${ev.isNull} = true;"
        else s"""throw new IllegalArgumentException(
           |  "dot_product: vector length mismatch " + $a.numElements() +
           |  " vs " + $b.numElements());""".stripMargin
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  $mismatch
         |} else {
         |  int $n = $a.numElements();
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $sum += ($lGet) * ($rGet);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/**
 * Codegen'd SimHash signature over a token-hash array (`array<long>`).
 *
 * The HOF formulation runs one interpreted `aggregate()` pass over the
 * array PER BIT — a 32-bit signature walks every token-hash list 32
 * times through boxed lambdas. This expression is one generated-Java
 * pass: per token, an unrolled counter update for all bits; then one
 * sign sweep packs the signature.
 *
 * Semantics are bit-identical to `Dedup.simHashFromHashes`: counter b
 * gets +1 when bit b of the hash is set else −1 (a null element counts
 * −1 on every bit, exactly like the HOF's `otherwise` branch), and bit b
 * of the signature is set when counter b ≥ 0 — so the empty array yields
 * the all-ones signature, as before.
 */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")

  override def dataType: DataType = LongType

  // constructor runs on UNRESOLVED children (no dataType yet) — validate
  // at analysis time like any Catalyst expression
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash needs array<long> token hashes, got $t")
    }

  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (elemNullable && hs.isNullAt(i)) {
        var b = 0
        while (b < bits) { counts(b) -= 1; b += 1 }
      } else {
        val h = hs.getLong(i)
        var b = 0
        while (b < bits) {
          counts(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, a => {
      // fresh names for every local incl. loop vars (no Java local
      // shadowing — see DotProductExpr.doGenCode)
      val counts = ctx.freshName("counts")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val nullBranch =
        if (elemNullable)
          s"""if ($a.isNullAt($i)) {
             |  for (int $b = 0; $b < $bits; $b++) $counts[$b]--;
             |  continue;
             |}""".stripMargin
        else ""
      s"""
         |int[] $counts = new int[$bits];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullBranch
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $counts[$b] += ((($h >> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($counts[$b] >= 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHashExpr = copy(child = newChild)
}

/**
 * Codegen'd MinHash signature over a shingle-hash array (`array<long>`):
 * `sig[j] = min over hashes h of (h * a(j) + b(j))`.
 *
 * The HOF formulation runs one interpreted `transform` + `array_min`
 * pass PER SEED (k passes, k boxed-lambda walks); this is one generated
 * pass maintaining all k minima. Inputs are 30-bit-masked and the
 * coefficients 30-bit, so `h*a+b < 2^60` — no overflow anywhere in the
 * domain (the same bound the DuckDB oracle depends on).
 *
 * Semantics match the HOF form: a null ELEMENT is skipped by every
 * seed's min (like `array_min`); an empty (or all-null) input yields a
 * signature of k nulls.
 */
case class MinHashSigExpr(child: Expression, coeffA: Seq[Long],
    coeffB: Seq[Long]) extends UnaryExpression {

  require(coeffA.nonEmpty && coeffA.size == coeffB.size,
    "coefficient arrays must be non-empty and equal length")
  private def k = coeffA.size

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash needs array<long> shingle hashes, got $t")
    }

  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!(elemNullable && hs.isNullAt(i))) {
        any = true
        val h = hs.getLong(i)
        var j = 0
        while (j < k) {
          val v = h * coeffA(j) + coeffB(j)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (any) new GenericArrayData(mins.map(Long.box))
    else new GenericArrayData(new Array[Any](k))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", coeffA.toArray, "long[]")
    val bRef = ctx.addReferenceObj("mhB", coeffB.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, in => {
      // fresh names for every local incl. loop vars (no Java local
      // shadowing — see DotProductExpr.doGenCode)
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val nullSkip =
        if (elemNullable) s"if ($in.isNullAt($i)) continue;" else ""
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |int $n = $in.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullSkip
         |  $any = true;
         |  long $h = $in.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = $h * $aRef[$j] + $bRef[$j];
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = $any
         |  ? (org.apache.spark.sql.catalyst.util.ArrayData)
         |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |        .fromPrimitiveArray($mins)
         |  : (org.apache.spark.sql.catalyst.util.ArrayData)
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |        new Object[$k]);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigExpr = copy(child = newChild)
}

/**
 * Codegen'd random-hyperplane LSH signature over a numeric array:
 * `bit b = (Σᵢ v[i] · w[b][i] ≥ 0)`, all `nBits` projections accumulated
 * in ONE pass over the vector.
 *
 * The Column formulation builds `nBits × dim` element_at terms whose
 * sharing is left to codegen subexpression elimination (and inhibited
 * inside `when` branches); this is a flat double loop with the weight
 * matrix attached as a codegen reference.
 *
 * Semantics match the Column form exactly: left-to-right accumulation
 * per bit, `proj ≥ 0` sets the bit; a vector shorter than `dim` raises
 * (as ANSI `element_at` would); a null ELEMENT nulls every projection,
 * so the signature is 0 (the `when(proj >= 0, …).otherwise(0)` path).
 */
case class HyperplaneSigExpr(child: Expression, weights: Seq[Double],
    dim: Int, nBits: Int) extends UnaryExpression {

  require(nBits >= 1 && nBits <= 63 && dim >= 1 &&
    weights.size == nBits * dim, "weights must be nBits x dim")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig needs array<float|double>, got $t")
    }

  private def elemIsFloat: Boolean =
    child.dataType match { case ArrayType(FloatType, _) => true; case _ => false }
  private def elemNullable: Boolean =
    child.dataType match { case ArrayType(_, n) => n; case _ => false }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() < dim) throw new IllegalArgumentException(
      s"hyperplane_sig: vector has ${v.numElements()} elements, needs $dim")
    val projs = new Array[Double](nBits)
    var i = 0
    while (i < dim) {
      if (elemNullable && v.isNullAt(i)) return 0L // null poisons every proj
      val x = if (elemIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
      var b = 0
      while (b < nBits) { projs(b) += x * weights(b * dim + i); b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < nBits) { if (projs(b) >= 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hpW", weights.toArray, "double[]")
    nullSafeCodeGen(ctx, ev, in => {
      // fresh names for every local incl. loop vars (no Java local
      // shadowing — see DotProductExpr.doGenCode)
      val projs = ctx.freshName("projs")
      val x = ctx.freshName("x")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val get = if (elemIsFloat) s"(double) $in.getFloat($i)"
        else s"$in.getDouble($i)"
      val nullBreak =
        if (elemNullable)
          s"if ($in.isNullAt($i)) { $projs = null; break; }"
        else ""
      s"""
         |if ($in.numElements() < $dim) {
         |  throw new IllegalArgumentException(
         |    "hyperplane_sig: vector has " + $in.numElements() +
         |    " elements, needs $dim");
         |}
         |double[] $projs = new double[$nBits];
         |for (int $i = 0; $i < $dim; $i++) {
         |  $nullBreak
         |  double $x = $get;
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    $projs[$b] += $x * $wRef[$b * $dim + $i];
         |  }
         |}
         |long $sig = 0L;
         |if ($projs != null) {
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    if ($projs[$b] >= 0) $sig |= (1L << $b);
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSigExpr = copy(child = newChild)
}

object VectorExpressions {
  /** `Column` wrapper for [[DotProductExpr]]. */
  def dotProduct(a: Column, b: Column): Column =
    GraftExpressionBridge.toColumn(DotProductExpr(
      GraftExpressionBridge.toExpression(a),
      GraftExpressionBridge.toExpression(b)))

  /** `Column` wrapper for [[SimHashExpr]]. */
  def simHash(hashes: Column, bits: Int): Column =
    GraftExpressionBridge.toColumn(SimHashExpr(
      GraftExpressionBridge.toExpression(hashes), bits))

  /** `Column` wrapper for [[MinHashSigExpr]]. */
  def minHashSig(hashes: Column, coeffA: Seq[Long],
      coeffB: Seq[Long]): Column =
    GraftExpressionBridge.toColumn(MinHashSigExpr(
      GraftExpressionBridge.toExpression(hashes), coeffA, coeffB))

  /** `Column` wrapper for [[HyperplaneSigExpr]] (weights flattened
   * bit-major: `weights(b * dim + i)`). */
  def hyperplaneSig(vec: Column, weights: Seq[Double], dim: Int,
      nBits: Int): Column =
    GraftExpressionBridge.toColumn(HyperplaneSigExpr(
      GraftExpressionBridge.toExpression(vec), weights, dim, nBits))
}
