package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: fused cosine similarity over two
  * array<double> columns — one codegen'd loop accumulating dot(a,b),
  * |a|² and |b|² together instead of three interpreted higher-order
  * `aggregate(zip_with(...))` lambdas (HOF lambdas never enter
  * whole-stage codegen and re-evaluate per reference).
  *
  * IEEE parity: each accumulator sees exactly the element-order sequence
  * of the equivalent left-fold, so results are bitwise identical to the
  * composed-builtin formulation (and to the DuckDB oracles that replicate
  * that fold). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs two array<double> arguments, got ${left.dataType} / ${right.dataType}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv;
         |  $na += $xv * $xv;
         |  $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  val name = "graft_cosine"

  private val info = new ExpressionInfo(classOf[CosineSim].getName, name)
  private val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$name takes exactly 2 arguments")
    CosineSim(exprs.head, exprs(1))
  }

  /** Idempotent per-session registration (for sessions built without the
    * extensions config). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}

/** SparkSessionExtensions entry point — the canonical injection route:
  *
  *   spark.sql.extensions=graft.expressions.GraftExtensions
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier(CosineSim.name),
        new ExpressionInfo(classOf[CosineSim].getName, CosineSim.name),
        { exprs: Seq[Expression] =>
          require(exprs.length == 2, s"${CosineSim.name} takes exactly 2 arguments")
          CosineSim(exprs.head, exprs(1))
        }))
    ext.injectFunction(
      (FunctionIdentifier(HammingDist.name),
        new ExpressionInfo(classOf[HammingDist].getName, HammingDist.name),
        { exprs: Seq[Expression] =>
          require(exprs.length == 2, s"${HammingDist.name} takes exactly 2 arguments")
          HammingDist(exprs.head, exprs(1))
        }))
    ext.injectFunction(
      (FunctionIdentifier(NfcNormalize.name),
        new ExpressionInfo(classOf[NfcNormalize].getName, NfcNormalize.name),
        { exprs: Seq[Expression] =>
          require(exprs.length == 1, s"${NfcNormalize.name} takes exactly 1 argument")
          NfcNormalize(exprs.head)
        }))
    ext.injectFunction(
      (FunctionIdentifier(FixMojibake.name),
        new ExpressionInfo(classOf[FixMojibake].getName, FixMojibake.name),
        { exprs: Seq[Expression] =>
          require(exprs.length == 1, s"${FixMojibake.name} takes exactly 1 argument")
          FixMojibake(exprs.head)
        }))
    ext.injectFunction(
      (FunctionIdentifier(Shingles.name),
        new ExpressionInfo(classOf[Shingles].getName, Shingles.name),
        { exprs: Seq[Expression] =>
          require(exprs.length == 2, s"${Shingles.name} takes exactly 2 arguments")
          Shingles(exprs.head, exprs(1))
        }))
  }
}
