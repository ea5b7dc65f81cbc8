package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.quality.{FilterConfig, Heuristics, LangId, Perplexity}

/** Serializable per-JVM analysis kernel: langid + KN perplexity + heuristic
  * rules in one call, emitting the result struct as an InternalRow directly
  * (no encoder round-trip — this is why it beats an equivalent ScalaUDF).
  * Models resolve through the deterministic JVM singletons; they serialize
  * as nothing (the payload is the small FilterConfig). */
final class AnalysisKernel(cfg: FilterConfig) extends Serializable {
  @transient private lazy val lid = LangId.model
  @transient private lazy val ppl = Perplexity.model

  def apply(text: UTF8String, role: UTF8String): InternalRow = {
    if (text == null) {
      return InternalRow(UTF8String.fromString("und"), 0.0, 0.0,
        new GenericArrayData(Array[Any](UTF8String.fromString("null_text"))))
    }
    val t = text.toString
    val r = if (role == null) "" else role.toString
    val (lang, score) = lid.classify(t)
    val p = ppl.perplexity(t)
    val fails = Heuristics.ruleFailures(t, r, lang, p, cfg)
    val arr: ArrayData = new GenericArrayData(
      fails.map(f => UTF8String.fromString(f): Any).toArray)
    InternalRow(UTF8String.fromString(lang), score, p, arr)
  }
}

/** Native expression for the fused per-turn analysis (SURVEY.md §2.6:
  * "codegen-friendly UDFs" → a real Expression). Deterministic, null-safe
  * via the kernel, struct-typed output. */
case class TurnAnalysis(left: Expression, right: Expression, config: FilterConfig)
    extends BinaryExpression {

  override def dataType: DataType = TurnAnalysis.schema
  override def nullable: Boolean = false
  override def prettyName: String = "turn_analysis"

  @transient private lazy val kernel = new AnalysisKernel(config)

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input).asInstanceOf[UTF8String]
    val r = right.eval(input).asInstanceOf[UTF8String]
    kernel.apply(t, r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("analysisKernel", kernel, classOf[AnalysisKernel].getName)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = code"""
        ${l.code}
        ${r.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} = $ref.apply(
          ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
        boolean ${ev.isNull} = false;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): TurnAnalysis = copy(left = newLeft, right = newRight)
}

object TurnAnalysis {
  val schema: StructType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("lang_score", DoubleType, nullable = false),
    StructField("ppl", DoubleType, nullable = false),
    StructField("fails", ArrayType(StringType, containsNull = false), nullable = false)
  ))

  def apply(text: Column, role: Column, config: FilterConfig): Column =
    GraftBridge.column(
      TurnAnalysis(GraftBridge.expression(text), GraftBridge.expression(role), config))
}
