package graft.scrub

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled-regex PII/toxicity scrubber (north_star: "compiled-regex
  * PII/toxicity scrubbing via codegen-friendly UDFs").
  *
  * Deterministic fixed-order chain — order is part of the spec (URLs before
  * e-mails so addresses inside URLs mask as [URL]; SSN before phone so the
  * 3-2-4 shape wins). All patterns are compiled once per JVM into statics;
  * scrubbed output is byte-reproducible (BASELINE.json: "byte-exact scrubbed
  * text per turn").
  */
object Scrubber {

  /** The toxicity lexicon — synthetic placeholder profanities
    * (FIXTURES.md §3); swap for a real lexicon in production. */
  val toxLexicon: Seq[String] =
    Seq("frakking", "gorram", "smegging", "feldercarb", "dren", "frell")

  final case class Rule(name: String, pattern: Pattern, replacement: String)

  val rules: Seq[Rule] = Seq(
    Rule("url", Pattern.compile("""https?://[^\s<>"']+"""), "[URL]"),
    Rule(
      "email",
      Pattern.compile("""\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"""),
      "[EMAIL]"
    ),
    Rule("ssn", Pattern.compile("""\b\d{3}-\d{2}-\d{4}\b"""), "[SSN]"),
    Rule(
      "credit_card",
      Pattern.compile("""\b(?:\d{4}[ -]){3}\d{4}\b|\b\d{15,16}\b"""),
      "[CC]"
    ),
    Rule(
      "phone",
      // no \b before "(" — word boundaries need a word char on one side
      Pattern.compile("""(?:\(\d{3}\)\s?|\b\d{3}[-.])\d{3}[-.]\d{4}\b"""),
      "[PHONE]"
    ),
    Rule(
      "ipv4",
      Pattern.compile("""\b(?:\d{1,3}\.){3}\d{1,3}\b"""),
      "[IP]"
    ),
    Rule(
      "toxicity",
      Pattern.compile(
        "(?i)\\b(?:" + toxLexicon.mkString("|") + ")\\b",
        Pattern.UNICODE_CASE
      ),
      "[REDACTED]"
    )
  )

  /** The pure kernel: apply all rules in order. */
  def scrub(text: String): String = {
    var t = text
    var i = 0
    val rs = rulesArray
    while (i < rs.length) {
      t = rs(i).pattern.matcher(t).replaceAll(rs(i).replacement)
      i += 1
    }
    t
  }

  private val rulesArray: Array[Rule] = rules.toArray

  /** Which rules fired, evaluated SEQUENTIALLY against the mutating text —
    * the same order [[scrub]] applies them — so a rule is reported only if
    * its replacement actually lands in the output (an email inside a URL
    * is consumed by the url rule and must not double-report). */
  def firedRules(text: String): Seq[String] = {
    var t = text
    val out = Seq.newBuilder[String]
    rules.foreach { r =>
      val m = r.pattern.matcher(t)
      if (m.find()) {
        out += r.name
        t = m.replaceAll(r.replacement)
      }
    }
    out.result()
  }

  /** Column API over the native expression. */
  def apply(col: Column): Column =
    GraftBridge.column(ScrubText(GraftBridge.expression(col)))
}

/** Native codegen-friendly expression for the scrub chain: stateless
  * (patterns are JVM statics in [[Scrubber]]), null-safe, deterministic. */
case class ScrubText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "scrub_text"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Scrubber.scrub(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c =>
        s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.scrub.Scrubber.scrub($c.toString()))"
    )

  override protected def withNewChildInternal(newChild: Expression): ScrubText =
    copy(child = newChild)
}
