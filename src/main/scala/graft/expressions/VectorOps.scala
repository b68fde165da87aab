package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Shared kernels for the native vector-quantization expressions — the
  * round-6 fix for the compressed-ANN expression-tree cost (VERDICT item
  * #1): `pqCodesCol`/`nearestCells` evaluated ~80 interpreted
  * `aggregate(zip_with(...))` folds per row with the subvector slices and
  * centroid literals re-expanded per centroid. Each kernel is ONE JVM
  * loop per row with the centroid table resolved once per expression
  * instance.
  *
  * IEEE parity: every accumulator runs the exact element-order left fold
  * of the composed formulation (`acc = 0.0; acc += (x-y)*(x-y)` ascending
  * i), and argmin keeps the first strict minimum (codes ascending) —
  * byte-identical to `least(struct(d, c)...)` / `array_sort(struct(d,
  * cell))[0]`, and to the DuckDB oracles replicating those folds. */
object VectorKernel {

  /** codes[j] = argmin over c of sqdist(emb[j*sub .. j*sub+sub-1],
    * flat[((j*k)+c)*sub ..]), first-on-tie. m=1 is IVF cell routing. */
  def argminCodes(emb: ArrayData, flat: Array[Double], m: Int, k: Int): ArrayData = {
    val dim = emb.numElements()
    val sub = dim / m
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      var bestD = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < k) {
        var acc = 0.0
        var i = 0
        val embBase = j * sub
        val cbBase = (j * k + c) * sub
        while (i < sub) {
          val x = emb.getDouble(embBase + i)
          val y = flat(cbBase + i)
          val d = x - y
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; bestC = c }
        c += 1
      }
      out(j) = bestC
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Integer dot product of two int arrays as one JVM loop — the
    * replacement for the interpreted `aggregate(zip_with(a, b,
    * _.toLong * _), 0L, _ + _)` fold in the int8 kNN sweep. Exact 64-bit
    * integer arithmetic (|dot| ≤ dim·127² for int8 inputs), so the value
    * is identical to the composed fold under ANY summation order. */
  def intDot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    acc
  }

  /** Sign-LSH bucket: bit b set iff dot(emb, plane_b) > 0, plane_b =
    * flat[b*dim .. b*dim+dim-1]. Same left-fold dot as the composed
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`. */
  def lshBucket(emb: ArrayData, flat: Array[Double], bits: Int): Long = {
    val dim = emb.numElements()
    var bucket = 0L
    var b = 0
    while (b < bits) {
      var acc = 0.0
      val base = b * dim
      var i = 0
      while (i < dim) {
        acc += emb.getDouble(i) * flat(base + i)
        i += 1
      }
      if (acc > 0) bucket += (1L << b)
      b += 1
    }
    bucket
  }
}

/** `graft_argmin_codes(emb, flat_centroids, m, k)` — per-subspace nearest-
  * centroid codes over an array<double> embedding. See [[VectorKernel]]. */
case class ArgminCodes(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_argmin_codes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), IntegerType, IntegerType)
        if second.foldable && third.foldable && fourth.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs (array<double>, foldable array<double>, foldable int, foldable int)")
    }
  }

  @transient private lazy val flat: Array[Double] =
    second.eval().asInstanceOf[ArrayData].toDoubleArray()
  private lazy val mVal: Int = third.eval().asInstanceOf[Int]
  private lazy val kVal: Int = fourth.eval().asInstanceOf[Int]

  override def nullSafeEval(e: Any, f: Any, m: Any, k: Any): Any =
    VectorKernel.argminCodes(e.asInstanceOf[ArrayData], flat, mVal, kVal)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("flatCentroids", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (e, _, _, _) =>
      s"${ev.value} = graft.expressions.VectorKernel.argminCodes($e, $flatRef, $mVal, $kVal);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): ArgminCodes =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** `graft_lsh_bucket(emb, flat_planes, bits)` — sign-LSH bucket id over
  * an array<double> embedding. See [[VectorKernel]]. */
case class LshBucket(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), IntegerType)
        if second.foldable && third.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs (array<double>, foldable array<double>, foldable int)")
    }
  }

  @transient private lazy val flat: Array[Double] =
    second.eval().asInstanceOf[ArrayData].toDoubleArray()
  private lazy val bitsVal: Int = third.eval().asInstanceOf[Int]

  override def nullSafeEval(e: Any, f: Any, b: Any): Any =
    VectorKernel.lshBucket(e.asInstanceOf[ArrayData], flat, bitsVal)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("flatPlanes", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (e, _, _) =>
      s"${ev.value} = graft.expressions.VectorKernel.lshBucket($e, $flatRef, $bitsVal);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LshBucket =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_int_dot(a, b)` — exact integer dot of two array<int> columns
  * (both sides row data, unlike the literal-table kernels above). See
  * [[VectorKernel.intDot]]. */
case class IntDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_int_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs (array<int>, array<int>)")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.intDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.VectorKernel.intDot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}

object IntDot {
  val name = "graft_int_dot"
  private val info = new ExpressionInfo(classOf[IntDot].getName, name)
  private val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$name takes exactly 2 arguments")
    IntDot(exprs(0), exprs(1))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}

object ArgminCodes {
  val name = "graft_argmin_codes"
  private val info = new ExpressionInfo(classOf[ArgminCodes].getName, name)
  private val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 4, s"$name takes exactly 4 arguments")
    ArgminCodes(exprs(0), exprs(1), exprs(2), exprs(3))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}

object LshBucket {
  val name = "graft_lsh_bucket"
  private val info = new ExpressionInfo(classOf[LshBucket].getName, name)
  private val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, s"$name takes exactly 3 arguments")
    LshBucket(exprs(0), exprs(1), exprs(2))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
