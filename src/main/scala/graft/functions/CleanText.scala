package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.model.CleanConfig
import graft.pipeline.CleanPipeline

/** Serializable wrapper so generated code can invoke a compiled
  * `String => String` kernel on UTF8String without boxing surprises. The
  * wrapped function is built lazily per JVM from the (small, serializable)
  * plan-time payload, so compiled `java.util.regex.Pattern`s never travel
  * over the wire. */
final class StringKernel(build: () => String => String) extends Serializable {
  @transient private lazy val f: String => String = build()
  def apply(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(f(s.toString))
}

/** Native Catalyst expression for the full fused cleaning chain
  * (SURVEY.md §2.1 T20-T22): one UTF8String→String round-trip per row no
  * matter how many stages are enabled, null-safe, deterministic (so Catalyst
  * may push/reorder it), and codegen-friendly — `doGenCode` emits a direct
  * virtual call that stays inside WholeStageCodegen.
  *
  * Carrying the [[CleanConfig]] (not the compiled closure) keeps case-class
  * equality structural: two CleanText nodes with equal configs canonicalize
  * equal, enabling subexpression elimination.
  */
case class CleanText(child: Expression, config: CleanConfig)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "clean_text"

  @transient private lazy val kernel = {
    // bind config to a local BEFORE building the closure: capturing
    // CleanText.this would drag the whole child expression subtree into
    // every serialized task binary
    val cfg = config
    new StringKernel(() => CleanPipeline.kernelChain(cfg))
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel.apply(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cleanKernel", kernel, classOf[StringKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.apply($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CleanText =
    copy(child = newChild)
}

object CleanText {

  /** Column API: `clean(col("text"), cfg)`. */
  def apply(col: Column, config: CleanConfig): Column =
    GraftBridge.column(CleanText(GraftBridge.expression(col), config.validated))
}
