package graft.expr

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5 hashes of a text's DISTINCT word n-gram shingle strings
  * as one compiled loop — the [[ShingleHashes]] treatment applied to
  * the [[graft.llm.TextOps.hash60]] family: tokenize, build each
  * n-gram string (space-joined), de-duplicate ON THE STRINGS (matching
  * the oracle's `list_distinct` before hashing — hash-then-distinct
  * would diverge on the 2^-60 collision), md5 each survivor once and
  * read the first 15 hex digits as a long.
  *
  * Exists for the SimHash pipeline (q44), whose per-shingle hash cost
  * dominated when run through the interpreted
  * `conv(substring(md5(...)))` expression chain. Same semantics, one
  * MessageDigest call per distinct shingle inside whole-stage codegen
  * via the reference-object pattern.
  */
case class ShingleHash60s(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hash60s"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expects string input, got $t")
    }

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val md =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): GenericArrayData = {
    val toks = ws.split(input.toString, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    // distinct shingle STRINGS first (first-occurrence order), then hash
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var k = 1
      while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val digest = md.get()
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      digest.reset()
      val d = digest.digest(it.next().getBytes(StandardCharsets.UTF_8))
      // first 15 hex digits = bytes 0..6 plus the high nibble of byte 7
      out(j) = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
        ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
        ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
        ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >> 4)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("shingleHash60s", this, classOf[ShingleHash60s].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash60s =
    copy(child = newChild)
}
