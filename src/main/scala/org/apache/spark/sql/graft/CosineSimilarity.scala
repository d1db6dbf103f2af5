package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for double-precision cosine similarity of two
  * float-array columns — the codegen'd replacement for the Scala-UDF path
  * on the LSH / IVF rerank joins (SURVEY.md §7.3 extension-preference
  * order: compose > native Expression > UDF).
  *
  * Why not the UDF: a Scala UDF deserializes each ArrayData into a boxed
  * Seq[Float] per row and breaks the enclosing WholeStageCodegen span; this
  * expression reads the unsafe array buffers directly inside generated
  * code, so the rerank filter stays in one codegen stage.
  *
  * Lives in the org.apache.spark.sql namespace because the expression SPI
  * (AbstractDataType, ExpressionUtils.column) is private[sql] — the
  * standard packaging for Spark-native extension expressions. The public
  * entry point is [[graft.functions.GraftFunctions]].
  *
  * Arithmetic is bit-identical to `graft.ml.Similarity.cosine` /
  * `cosineKernel` (left-to-right double fold over min(len) elements) — the
  * oracle-parity contract. Array ELEMENTS are assumed non-null (the
  * embeddings contract; same assumption the UDF made by unboxing).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    // zero-norm side => 0, not NaN (NaN sorts above every real value in
    // Spark and would hijack rank 1 of every top-k window); mirrors
    // Similarity.cosine / cosineKernel
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv;
         |  $na += $xv * $xv;
         |  $nb += $yv * $yv;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 :
         |  $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

/** private[sql]-bridging helpers for the public facade. */
object CosineSimilarity {
  def asColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
