package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random SIGN projection (Achlioptas 2003's database-friendly
  * Johnson–Lindenstrauss family, the ±1 variant): project a d-dim
  * embedding to k dims as `proj_j = (1/√k) · Σ_i sign(j,i) · e_i`
  * with signs drawn deterministically from md5 parity of `"j_i"` —
  * the same digest both engines expose, so the ORACLE regenerates
  * the matrix instead of trusting it. JL's promise: pairwise
  * distances/inner products are preserved within (1±ε) for
  * k = O(log n / ε²) — the cheap front-end for ANN over fat
  * embeddings (project once, bucket/search in k dims, re-rank
  * exactly in d like X191).
  *
  * Scale shape: the matrix is k·d literal doubles riding the plan as
  * a broadcast constant; the projection is ONE map-side pass —
  * k [[graft.expr.DotProduct]] evaluations per row (compiled,
  * sequential IEEE sum — bit-identical to DuckDB's
  * `list_dot_product`, the q07-proven equivalence) — no shuffle, no
  * UDF. Signs are EXACT (±e_i negation is lossless in IEEE), so the
  * only rounding is the dot-product's own left-to-right sum, shared
  * bit-for-bit by both engines.
  */
object Projection {

  /** The deterministic ±1 matrix: `signs(j)(i)` = +1 iff the first
    * 7 hex digits of md5("j_i") parse to an even long — exactly
    * `('0x'||substr(md5(j||'_'||i),1,7))::BIGINT % 2 = 0` in DuckDB. */
  def signMatrix(k: Int, d: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(k, d) { (j, i) =>
      md.reset()
      val hex = md.digest(s"${j}_$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 7)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
    }
  }

  /** `k`-dim projection column of a float/double array column. */
  def projectColumn(vec: Column, k: Int, d: Int): Column = {
    require(k >= 1 && d >= 1, s"need k, d >= 1: k=$k d=$d")
    val signs = signMatrix(k, d)
    val scale = 1.0 / math.sqrt(k.toDouble)
    val v = vec.cast("array<double>")
    array((0 until k).map { j =>
      Similarity.dot(v, typedLit(signs(j).toSeq)) * lit(scale)
    }: _*)
  }

  /** Frame form: `(idCol, proj array<double>[k])` per row. */
  def project(df: DataFrame, idCol: String, vecCol: String,
      k: Int, d: Int, outCol: String = "proj"): DataFrame =
    df.select(col(idCol), projectColumn(col(vecCol), k, d).as(outCol))
}
