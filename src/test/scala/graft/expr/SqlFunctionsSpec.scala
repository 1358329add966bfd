package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException

/** The SQL surface of the expression family (GraftExtensions): every
  * registered function runs from a SQL text and matches its
  * DataFrame-API twin; literal-argument contracts refuse loudly. */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_blocklist_hits from SQL matches the DataFrame form") {
    Seq((1L, "ushers walk"), (2L, "clean"))
      .toDF("id", "text").createOrReplaceTempView("bl_docs")
    val sql = spark.sql(
      "SELECT id, graft_blocklist_hits(text, 'he', 'she', 'hers') AS h " +
        "FROM bl_docs ORDER BY id")
      .as[(Long, Seq[String])].collect().toSeq
    assert(sql == Seq(1L -> Seq("he", "hers", "she"), 2L -> Seq()))
    // non-literal terms refuse at analysis
    intercept[Exception] {
      spark.sql("SELECT graft_blocklist_hits(text, text) FROM bl_docs").collect()
    }
    val red = spark.sql(
      "SELECT graft_blocklist_redact('ushers walk', 'she', 'hers')")
      .collect().head.getString(0)
    // 'she' covers [1,3], 'hers' covers [2,5] — the union masks 1..5
    assert(red == "u***** walk")
  }

  test("graft_unicode_normalize and graft_deflate_len run from SQL") {
    val got = spark.sql(
      "SELECT graft_unicode_normalize('é', 'NFC') AS n, " +
        "graft_deflate_len(repeat('ab', 100)) AS z, " +
        "graft_deflate_len(uuid()) IS NOT NULL AS u")
      .collect().head
    assert(got.getString(0) == "é")
    // highly repetitive text compresses far below its raw length
    assert(got.getInt(1) < 60)
    assert(got.getBoolean(2))
  }

  test("graft_kll_sketch aggregates from SQL; served rank is sane") {
    spark.range(0, 1000).selectExpr("CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("kll_in")
    val img = spark.sql("SELECT graft_kll_sketch(v) FROM kll_in")
      .collect().head.getAs[Array[Byte]](0)
    val s = KllSketchAgg.mergeImages(Seq(img)).get
    assert(s.getN == 1000L)
    val med = s.getQuantile(0.5)
    assert(med > 400.0 && med < 600.0, s"median $med")
    // explicit-k form parses too
    val img2 = spark.sql("SELECT graft_kll_sketch(v, 128) FROM kll_in")
      .collect().head.getAs[Array[Byte]](0)
    assert(KllSketchAgg.mergeImages(Seq(img2), k = 128).get.getN == 1000L)
  }

  test("graft_kll_quantile serves per-group medians in one SQL text") {
    spark.range(0, 2000)
      .selectExpr("id % 2 AS grp", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("kllq_in")
    val got = spark.sql(
      "SELECT grp, graft_kll_quantile(graft_kll_sketch(v), 0.5d) AS med " +
        "FROM kllq_in GROUP BY grp ORDER BY grp")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // evens' median ≈ 999±, odds' ≈ 1000± — band assertion (KLL)
    assert(math.abs(got(0L) - 999.0) < 120.0, got(0L).toString)
    assert(math.abs(got(1L) - 1000.0) < 120.0, got(1L).toString)
    // empty sketch serves null
    val n = spark.sql(
      "SELECT graft_kll_quantile(graft_kll_sketch(CAST(NULL AS DOUBLE)), 0.5d)")
      .collect().head
    assert(n.isNullAt(0))
    // out-of-range rank refuses
    intercept[Exception] {
      spark.sql("SELECT graft_kll_quantile(graft_kll_sketch(1.0d), 1.5d)")
        .collect()
    }
  }

  test("graft_sign_project from SQL matches the DataFrame form") {
    import org.apache.spark.sql.functions.col
    Seq((1L, Array.tabulate(8)(i => (i + 1).toFloat)))
      .toDF("id", "e").createOrReplaceTempView("proj_in")
    val sql = spark.sql("SELECT graft_sign_project(e, 4, 8) FROM proj_in")
      .head().getSeq[Double](0)
    val api = spark.table("proj_in")
      .select(graft.llm.Projection.projectColumn(col("e"), 4, 8))
      .head().getSeq[Double](0)
    assert(sql == api)
    intercept[Exception] {
      spark.sql("SELECT graft_sign_project(e, id, 8) FROM proj_in").collect()
    }
  }

  test("unknown function still errors (registry not overreaching)") {
    intercept[AnalysisException] {
      spark.sql("SELECT graft_nope(1)").collect()
    }
  }
}
