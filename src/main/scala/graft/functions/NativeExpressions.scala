package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the deterministic scalar functions —
  * one tier above Scala UDFs (builder-prompt preference order: compose
  * built-ins > custom Expression > UDF): `doGenCode` emits a direct
  * static call inside whole-stage codegen, so no UDF closure
  * serialization, no Row boxing, and the expression participates in
  * constant folding when inputs are literals.
  */
case class Uuid5Expr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "uuid5"
  override def foldable: Boolean = children.forall(_.foldable)

  override def nullSafeEval(ns: Any, name: Any): Any =
    UTF8String.fromString(Uuids.uuid5(ns.toString, name.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (n, c) =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Uuids.uuid5($n.toString(), $c.toString()))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class TitleCaseExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "title_case"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(TitleCase.titleCase(s.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TitleCase.titleCase($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd dot product over float/double array columns in double
  * precision, summing left-to-right — bit-identical to the
  * `aggregate(zip_with(...))` HOF formulation but ~4× faster: HOF
  * lambdas are CodegenFallback (interpreted, per-element boxing), which
  * dominated the ANN pair-scoring stage at sf0.1. This is the "custom
  * Expression where built-ins genuinely fall short" tier: the semantics
  * are expressible with HOFs, the performance is not.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    val lf = isFloat(left); val rf = isFloat(right)
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lGet = if (isFloat(left)) s"(double) $a.getFloat(i)"
                 else s"$a.getDouble(i)"
      val rGet = if (isFloat(right)) s"(double) $b.getFloat(i)"
                 else s"$b.getDouble(i)"
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) { acc += ($lGet) * ($rGet); }
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NativeExpressions {
  import org.apache.spark.sql.graftshim.Shims

  def dotProduct(a: Column, b: Column): Column =
    Shims.toColumn(DotProductExpr(Shims.toExpression(a), Shims.toExpression(b)))

  def uuid5(ns: Column, name: Column): Column =
    Shims.toColumn(Uuid5Expr(Shims.toExpression(ns), Shims.toExpression(name)))

  def titleCase(c: Column): Column =
    Shims.toColumn(TitleCaseExpr(Shims.toExpression(c)))

  /** Register `uuid5` / `title_case` as SQL functions on a session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "uuid5", exprs => Uuid5Expr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "title_case", exprs => TitleCaseExpr(exprs.head), "built-in")
  }
}

/** Cluster-deployment registration:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((FunctionIdentifier("uuid5"),
      new ExpressionInfo(classOf[Uuid5Expr].getName, "uuid5"),
      (exprs: Seq[Expression]) => Uuid5Expr(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("title_case"),
      new ExpressionInfo(classOf[TitleCaseExpr].getName, "title_case"),
      (exprs: Seq[Expression]) => TitleCaseExpr(exprs.head)))
    e.injectOptimizerRule(_ => graft.plans.CollapseRedundantArrayOps)
  }
}
