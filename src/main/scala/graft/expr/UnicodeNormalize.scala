package graft.expr

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC / NFKC / NFD / NFKD) as a compiled
  * Catalyst expression — Spark ships no normalization function, and a
  * dedup pipeline that hashes raw codepoints treats `café` (composed)
  * and `café` (e + combining acute) as different documents. This is
  * the CCNet/C4 normalize-before-dedup step, codegen'd via the
  * reference-object pattern like the other `graft.expr` nodes, so it
  * rides inside whole-stage codegen in the hot scan projection.
  *
  * `java.text.Normalizer` implements the Unicode-standard forms, and
  * DuckDB's `nfc_normalize` implements the same published NFC
  * algorithm — which is what makes the NFC mode oracle-checkable
  * bit-for-bit (q93). NFKC additionally folds compatibility variants
  * (full-width `Ａ`→`A`, ligature `ﬁ`→`fi`, NBSP→space) and is the
  * production default for corpus hygiene; DuckDB has no NFKC mirror,
  * so that form is pinned by NormalizeSpec instead.
  *
  * The short-circuit: a string already in the target form (the
  * overwhelmingly common case — ASCII always is) is returned as the
  * ORIGINAL UTF8String, skipping the String round-trip allocation;
  * `Normalizer.isNormalized` is a cheap scan with an ASCII fast path.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Seq("NFC", "NFKC", "NFD", "NFKD").contains(form),
    s"form must be one of NFC/NFKC/NFD/NFKD, got $form")

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expects string input, got $t")
    }

  @transient private lazy val normForm = Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    if (Normalizer.isNormalized(s, normForm)) input
    else UTF8String.fromString(Normalizer.normalize(s, normForm))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("unicodeNormalize", this, classOf[UnicodeNormalize].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
