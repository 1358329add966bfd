package graft.expr

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word-n-gram shingles of a text column as ONE compiled loop:
  * whitespace-tokenize, 28-bit md5 per token, combine each n-window as
  * (h_i·C1 + h_{i+1}·C2 + …) mod M; `distinct` (default) keeps unique
  * hashes in first-occurrence order (the set form), `distinct = false`
  * keeps one hash per window position (the segment-mining form).
  *
  * Semantically identical to the column-composition form
  * ([[graft.llm.TextOps.shingleHashesHof]], kept as the reference and
  * the shape the DuckDB oracle mirrors) but ~an order of magnitude
  * cheaper: the HOF pipeline pays an interpreted lambda dispatch per
  * token plus Expression-tree md5 (hex string → conv → cast), while
  * this runs MessageDigest directly on token bytes and reads the
  * 28-bit value straight out of the first 4 digest bytes.
  *
  * The 28-bit value equals `conv(substring(md5(t),1,7),16,10)`: the
  * first 7 hex digits are the high 28 bits of the first 4 bytes.
  */
case class ShingleHashes(
    child: Expression,
    n: Int,
    coeffs: Seq[Long],
    modulus: Long,
    distinct: Boolean = true,
) extends UnaryExpression {

  require(n >= 1 && coeffs.length >= n, "need one coefficient per shingle slot")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expects string input, got $t")
    }

  @transient private lazy val ws = Pattern.compile("\\s+")
  // ThreadLocal: a codegen reference object can be visible to several
  // tasks; MessageDigest is stateful and not thread-safe
  @transient private lazy val md =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  @transient private lazy val cArr = coeffs.toArray

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Generated code calls back into this (the expression instance is
    * shipped as a codegen reference object): the surrounding operator
    * stays inside whole-stage codegen, and the loop itself is plain
    * compiled JVM code either way — no interpreter in the path. */
  def compute(input: UTF8String): GenericArrayData = {
    // mirror of split(text, "\\s+") with limit -1 (keeps leading empty)
    val toks = ws.split(input.toString, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](toks.length)
    val digest = md.get()
    var i = 0
    while (i < toks.length) {
      digest.reset()
      val d = digest.digest(toks(i).getBytes(StandardCharsets.UTF_8))
      // first 7 hex digits = high 28 bits of bytes 0..3
      th(i) = (((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >> 4))
      i += 1
    }
    // distinct=false preserves one hash PER WINDOW POSITION (the
    // segment-mining form); distinct=true keeps first-occurrence-order
    // unique hashes (the set form minhash/jaccard need)
    val seen = new java.util.LinkedHashSet[Long]()
    val positional = if (distinct) null else new Array[Long](toks.length - n + 1)
    i = 0
    while (i <= toks.length - n) {
      var acc = 0L
      var k = 0
      while (k < n) {
        acc += th(i + k) * cArr(k)
        k += 1
      }
      val h = acc % modulus
      if (distinct) seen.add(h) else positional(i) = h
      i += 1
    }
    if (!distinct) return new GenericArrayData(positional)
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
