package graft.expr

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE output length of a string's UTF-8 bytes at a FIXED
  * compression setting (level 6, raw/nowrap) — the compression-ratio
  * quality signal of the public CCNet / RefinedWeb pipelines:
  * degenerate machine text (keyword stuffing, template spam, repeated
  * boilerplate) compresses far below natural prose, so
  * deflate_len / byte_len is a one-column filter for it that needs no
  * vocabulary, no language model, and no corpus statistics.
  *
  * Determinism: zlib's DEFLATE at a fixed level and strategy is a
  * pure function of the input bytes, so re-runs and repartitions
  * agree exactly. It is NOT replayable in DuckDB SQL (no compression
  * function exists there), so the signal follows the multimodal
  * discipline: pinned by fixture specs (repeated text ≪ random-ish
  * text, expression ≡ a direct driver-side Deflater call), excluded
  * from the q84 oracle column set.
  *
  * Hot-path shape: codegen'd via the reference-object pattern like
  * the other `graft.expr` nodes (rides inside whole-stage codegen);
  * the Deflater instance is THREAD-LOCAL and `reset()` between rows —
  * native zlib allocation per row would dominate the scan otherwise.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_deflate_len"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expects string input, got $t")
    }

  @transient private lazy val local: ThreadLocal[Deflater] =
    new ThreadLocal[Deflater] {
      override def initialValue(): Deflater =
        new Deflater(6, /* nowrap = */ true)
    }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): Int = {
    val d = local.get()
    d.reset()
    d.setInput(input.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("deflateLen", this, classOf[DeflateLen].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
