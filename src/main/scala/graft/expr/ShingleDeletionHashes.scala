package graft.expr

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-deletion neighborhood of a text's word-n-gram shingles, hashed
  * — the symmetric-delete trick (SymSpell lineage) lifted to n-grams:
  * for every n-token window, emit the hash of each of its n
  * (n−1)-token DELETION VARIANTS, combined with the same affine
  * coefficient family as [[ShingleHashes]] (coefficient k multiplies
  * the k-th SURVIVING token). Two texts that differ by one inserted,
  * dropped, or substituted token inside a window still share a
  * variant hash, which is what near-miss decontamination joins on —
  * an exact n-gram rule is provably blind to a document whose clean
  * runs are all shorter than n ([[graft.llm.Dedup.contaminationFuzzy]]).
  *
  * Same compiled single-loop discipline as [[ShingleHashes]]: one md5
  * per token, arithmetic per variant, distinct in first-occurrence
  * order; n·windows hash combinations per row, no shingle strings
  * materialized. The arithmetic (28-bit token hashes × ~1e6
  * coefficients, n ≤ 25 terms) stays far below 2^62, so the DuckDB
  * mirror computes identical values in BIGINT. */
case class ShingleDeletionHashes(
    child: Expression,
    n: Int,
    coeffs: Seq[Long],
    modulus: Long,
) extends UnaryExpression {

  require(n >= 2, s"deletion variants need n >= 2, got $n")
  require(coeffs.length >= n - 1, "need one coefficient per surviving slot")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_deletion_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expects string input, got $t")
    }

  @transient private lazy val ws = Pattern.compile("\\s+")
  @transient private lazy val md =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  @transient private lazy val cArr = coeffs.toArray

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): GenericArrayData = {
    val toks = ws.split(input.toString, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](toks.length)
    val digest = md.get()
    var i = 0
    while (i < toks.length) {
      digest.reset()
      val d = digest.digest(toks(i).getBytes(StandardCharsets.UTF_8))
      th(i) = (((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >> 4))
      i += 1
    }
    val seen = new java.util.LinkedHashSet[Long]()
    i = 0
    while (i <= toks.length - n) {
      var del = 0
      while (del < n) {
        var acc = 0L
        var k = 0
        while (k < n - 1) {
          // slot k's surviving token skips over the deleted position
          acc += th(i + k + (if (k >= del) 1 else 0)) * cArr(k)
          k += 1
        }
        seen.add(acc % modulus)
        del += 1
      }
      i += 1
    }
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
    val ref = ctx.addReferenceObj("shingleDeletionHashes", this,
      classOf[ShingleDeletionHashes].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleDeletionHashes =
    copy(child = newChild)
}
