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

  /** Projected-pool ANN with EXACT re-rank — the X191 recipe with the
    * JL projection as the cheap tier: score candidates by cosine in
    * `projK` dims (a projK/d-sized dot per pair — the bandwidth and
    * FLOP win), keep a `poolK`-wide pool per query
    * ([[graft.expr.TopKAgg]], map-side k-reduction), then re-rank
    * ONLY the pool by full-dimension cosine (two id-keyed hash joins
    * fetch exactly the |queries|·poolK vectors that need precision —
    * the corpus floats are never scanned wholesale a second time).
    * Candidates come from the same coarse-cell equi-join as
    * [[Similarity.topKWithinLabel]] (`labelCol`) — never all-pairs.
    * Recall honesty: the projection misorders near-ties (JL is a
    * (1±ε) guarantee, not an ordering one), so pool wider than you
    * serve: the spec pins recall@k monotone in poolK with the
    * corpus-wide pool ≡ exact search. Fully deterministic — the
    * matrix is the md5-parity constant, sims tie-break (sim DESC,
    * id ASC), and every arithmetic step is a fixed-shape IEEE
    * expression both engines share (the q175/q07-proven pair). */
  def annProjectedRerank(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      poolK: Int,
      projK: Int,
      d: Int,
      queryPred: Column,
  ): DataFrame = {
    require(poolK >= k, s"pool must be at least k: poolK=$poolK k=$k")
    val e = col(vecCol).cast("array<double>")
    val base = df.select(
      col(idCol).as("id"), col(labelCol).as("lbl"),
      e.as("e"), Similarity.l2norm(e).as("nrm"),
      projectColumn(col(vecCol), projK, d).as("p"))
      .withColumn("pnrm", Similarity.l2norm(col("p")))
    val queries = df.filter(queryPred).select(col(idCol).as("qid"))
    val qSide = base.join(queries, col("id") === col("qid"), "left_semi")
    // stage 1: projected-cosine pool, per-query TopKAgg k-reduction
    val pool = qSide.as("q")
      .join(base.as("c"),
        col("q.lbl") === col("c.lbl") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        (Similarity.dot(col("q.p"), col("c.p")) /
          (col("q.pnrm") * col("c.pnrm"))).as("psim"))
      .groupBy(col("query_id"))
      .agg(graft.expr.TopKAgg.topK(col("psim"),
        struct(col("neighbor_id"), col("psim")), poolK).as("graft_pool_"))
      .select(col("query_id"),
        explode(col("graft_pool_.neighbor_id")).as("neighbor_id"))
    // stage 2: exact full-dim re-rank of the pool only
    val vecs = base.select(col("id"), col("e"), col("nrm"))
    pool
      .join(vecs.as("qv"), col("query_id") === col("qv.id"))
      .join(vecs.as("cv"), col("neighbor_id") === col("cv.id"))
      .select(col("query_id"), col("neighbor_id"),
        (Similarity.dot(col("qv.e"), col("cv.e")) /
          (col("qv.nrm") * col("cv.nrm"))).as("sim"))
      .groupBy(col("query_id"))
      .agg(graft.expr.TopKAgg.topK(col("sim"),
        struct(col("neighbor_id"), col("sim")), k).as("graft_top_"))
      .select(col("query_id"), posexplode(col("graft_top_")).as(Seq("graft_r_", "x")))
      .select(col("query_id"), col("x.neighbor_id").as("neighbor_id"),
        col("x.sim").as("sim"), (col("graft_r_") + 1).cast("int").as("rank"))
  }
}
