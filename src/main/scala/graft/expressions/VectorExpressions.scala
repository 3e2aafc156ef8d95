package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot kernels (SURVEY §2.9:
  * "custom Catalyst Expression beats a Scala UDF beats anything else").
  *
  * The column-function versions of these kernels are built from
  * higher-order array functions (`transform`/`aggregate`), which Spark
  * evaluates with per-element interpreted lambdas — correct, but the
  * lambda dispatch dominates at scale. Each expression here runs the whole
  * kernel as ONE tight JVM loop and participates in whole-stage codegen
  * via a static helper call, so the surrounding operators stay fused.
  *
  * Registered under names `simhash64`, `dot_vec`, `cosine_vec` by
  * [[graft.GraftFunctions]] (imperative, works on any session) and
  * [[graft.GraftExtensions]] (config-based,
  * `spark.sql.extensions=graft.GraftExtensions`).
  */
object Kernels {
  /** xxhash64 of a token with Spark's default seed (42) — identical to the
    * builtin `xxhash64(token)`. */
  def hashToken(s: UTF8String): Long = XxHash64Function.hash(s, StringType, 42L)

  /** 64-bit SimHash over a token array: bit j of the result is set iff
    * sum over tokens of (+1 / -1 by bit j of xxhash64(token)) is > 0. */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hashToken(tokens.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Dot product in double precision; `aF`/`bF` say whether each side's
    * elements are float32 (widened per element — bit-identical to
    * `transform(v, _.cast("double"))` in the column-function version). */
  def dot(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** One-pass cosine similarity in double precision. */
  def cosine(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    dot / math.max(denom, 1e-300)
  }

  /** Floor-quantized DFT magnitude spectrum of a dense trace: for each
    * frequency f, |X_f| where X_f accumulates floor(a·twiddle·1e6 + 0.5)
    * integer terms — the O(N²)-form in ONE codegen'd JVM loop per trace,
    * the constant-factor upgrade over the join-expansion spectral queries
    * whose docstrings promise it. BIT-PARITY with the join form is by
    * construction, not luck: the quantized terms are exact integers (sum
    * order free), and the twiddle doubles come from the same JVM
    * `Math.cos/sin` at the same `2.0·π·((f·k) mod N)/N` op sequence the
    * query layer embeds as literals in both engines' plans. Null
    * elements read as 0 (a missing grid cell contributes floor(0.5)=0,
    * matching the join form where an absent cell contributes no term —
    * the +0.5 offset lands on 0 for a zero amplitude). */
  def dftMagQ(values: ArrayData): ArrayData = {
    val n = values.numElements()
    val out = new Array[AnyRef](n)
    var f = 0
    while (f < n) {
      var qre = 0L
      var qim = 0L
      var k = 0
      while (k < n) {
        val a = if (values.isNullAt(k)) 0.0 else values.getDouble(k)
        val j = (f.toLong * k) % n
        val ang = 2.0 * math.Pi * j / n
        qre += math.floor(a * Math.cos(ang) * 1e6 + 0.5).toLong
        qim += math.floor(-(a * Math.sin(ang)) * 1e6 + 0.5).toLong
        k += 1
      }
      val re = qre.toDouble / 1e6
      val im = qim.toDouble / 1e6
      out(f) = java.lang.Double.valueOf(math.sqrt(re * re + im * im))
      f += 1
    }
    new GenericArrayData(out)
  }
}

/** simhash64(array<string>) -> long */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Kernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Shared input contract: each side is array<float> or array<double>;
  * float elements widen per element, so results match the column-function
  * formulations bit for bit. */
trait VecBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> operands, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** dot_vec(array<float|double>, array<float|double>) -> double */
case class DotVec(left: Expression, right: Expression) extends VecBinary {
  override def prettyName: String = "dot_vec"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dot(a.asInstanceOf[ArrayData], isFloat(left), b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.Kernels.dot($a, ${isFloat(left)}, $b, ${isFloat(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotVec =
    copy(left = l, right = r)
}

/** cosine_vec(array<float|double>, array<float|double>) -> double */
case class CosineVec(left: Expression, right: Expression) extends VecBinary {
  override def prettyName: String = "cosine_vec"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], isFloat(left), b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.Kernels.cosine($a, ${isFloat(left)}, $b, ${isFloat(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineVec =
    copy(left = l, right = r)
}

/** dft_mag_q(array<double>) -> array<double> — floor-quantized DFT
  * magnitude spectrum of a dense trace ([[Kernels.dftMagQ]]). */
case class DftMagQ(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "dft_mag_q"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"dft_mag_q needs array<double>, got ${dt.simpleString}")
  }

  override protected def nullSafeEval(values: Any): Any =
    Kernels.dftMagQ(values.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.Kernels.dftMagQ($v)")

  override protected def withNewChildInternal(newChild: Expression): DftMagQ =
    copy(child = newChild)
}
