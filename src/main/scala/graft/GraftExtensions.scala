package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.CleanText
import graft.model.CleanConfig
import graft.scrub.ScrubText

/** SparkSessionExtensions registration: exposes the native expressions to
  * SQL so `spark.sql("SELECT clean_text(text, 'all') …")` works.
  *
  * Wire up with either
  *   SparkSession.builder.withExtensions(new GraftExtensions),
  *   --conf spark.sql.extensions=graft.GraftExtensions, or
  *   GraftExtensions.register(spark) on an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => ElideIdentityCleanText)
  }
}

/** Custom Catalyst optimizer rule: a CleanText whose config is the
  * reference's all-params-falsy identity short-circuit
  * (src/CorpusAid.py:689-691) evaluates to its child — eliding the
  * expression at PLAN time instead of per row. */
object ElideIdentityCleanText
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  ): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case CleanText(child, cfg) if cfg.isIdentity => child
    }
}

object GraftExtensions {

  private type Definition =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private val cleanTextBuilder: Seq[Expression] => Expression = {
    case Seq(child) => CleanText(child, CleanConfig.transcriptDefault)
    case Seq(child, Literal(p: UTF8String, _)) => CleanText(child, profile(p.toString))
    case other if other.size == 2 =>
      throw new IllegalArgumentException(
        "clean_text(text, profile): profile must be a string LITERAL " +
          s"(got ${other(1).getClass.getSimpleName} — the config is " +
          "compiled into the expression at plan time)")
    case other =>
      throw new IllegalArgumentException(
        s"clean_text(text[, profile]) expects 1-2 args, got ${other.size}")
  }

  private val scrubTextBuilder: Seq[Expression] => Expression = {
    case Seq(child) => ScrubText(child)
    case other =>
      throw new IllegalArgumentException(
        s"scrub_text(text) expects 1 arg, got ${other.size}")
  }

  val definitions: Seq[Definition] = Seq(
    (new FunctionIdentifier("clean_text"),
      new ExpressionInfo(classOf[CleanText].getName, "clean_text"),
      cleanTextBuilder),
    (new FunctionIdentifier("scrub_text"),
      new ExpressionInfo(classOf[ScrubText].getName, "scrub_text"),
      scrubTextBuilder)
  )

  /** Register into an ALREADY-BUILT session (the `spark.sql.extensions`
    * conf only applies at session build time). */
  def register(spark: SparkSession): Unit = {
    definitions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(ElideIdentityCleanText))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ElideIdentityCleanText
  }

  /** Named cleaning profiles available from SQL. */
  def profile(name: String): CleanConfig = name match {
    case "default" | "transcript" => CleanConfig.transcriptDefault
    case "all" => CleanConfig.allOn
    case "pages" => CleanConfig(removePageNumbers = true,
      removeRomanPageNumbers = true, removePageIndicators = true,
      removePageDelimiters = true, removeBibliographicalReferences = true)
    case "normalize" => CleanConfig(normalizeUnicode = true,
      removeDiacritics = true, normalizeSpacing = true,
      normalizeLineBreaks = true)
    case other =>
      throw new IllegalArgumentException(s"unknown clean_text profile: $other")
  }
}
