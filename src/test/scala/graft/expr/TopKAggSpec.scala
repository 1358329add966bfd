package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.CorpusStats

class TopKAggSpec extends SparkSpec {

  import spark.implicits._

  test("topK keeps the k best by (score desc, payload asc)") {
    val df = Seq(
      ("g1", 1.0, "c"), ("g1", 3.0, "a"), ("g1", 2.0, "b"), ("g1", 3.0, "d"),
      ("g2", 5.0, "z"),
    ).toDF("g", "s", "p")
    val out = df.groupBy("g")
      .agg(TopKAgg.topK(col("s"), col("p"), 2).as("top"))
      .orderBy("g")
      .select(col("g"), col("top"))
      .as[(String, Seq[String])].collect()
    // g1: score 3.0 twice → payload asc keeps "a" before "d"
    assert(out(0) == (("g1", Seq("a", "d"))))
    assert(out(1) == (("g2", Seq("z"))))
  }

  test("topK result is invariant to partitioning (exercises partial merge + serialization)") {
    val rows = (1 to 500).map(i => (i % 7, i.toDouble % 53, s"p$i"))
    val df = rows.toDF("g", "s", "p")
    val agg = (in: org.apache.spark.sql.DataFrame) => in.groupBy("g")
      .agg(TopKAgg.topK(col("s"), col("p"), 5).as("top"))
      .orderBy("g")
      .as[(Int, Seq[String])].collect().toSeq
    val one = agg(df.coalesce(1))
    val many = agg(df.repartition(13))
    assert(one == many, "bounded heap must be arrival-order independent")
  }

  test("topK skips null scores and handles k > group size") {
    val df = Seq(
      (1, Some(2.0), "a"), (1, None, "skipped"), (1, Some(1.0), "b"),
    ).toDF("g", "s", "p")
    val out = df.groupBy("g")
      .agg(TopKAgg.topK(col("s"), col("p"), 10).as("top"))
      .select("top").as[Seq[String]].head()
    assert(out == Seq("a", "b"))
  }

  test("topK skips null PAYLOADS (the documented determinism-contract edge)") {
    // a null payload cannot be heap-ordered and is skipped like a null
    // score — the scaladoc's stated divergence from the window form,
    // which would rank such rows; every in-repo caller passes struct()
    // payloads, which are non-null by construction
    val df = Seq(
      (1, 3.0, Some("a")), (1, 2.0, None), (1, 1.0, Some("b")),
    ).toDF("g", "s", "p")
    val out = df.groupBy("g")
      .agg(TopKAgg.topK(col("s"), col("p"), 10).as("top"))
      .select("top").as[Seq[String]].head()
    assert(out == Seq("a", "b"))
  }

  test("topK with struct payloads orders ties by full struct") {
    val df = Seq(
      (1, 1.0, "b", 10L), (1, 1.0, "a", 20L), (1, 1.0, "a", 5L),
    ).toDF("g", "s", "t", "n")
    val out = df.groupBy("g")
      .agg(TopKAgg.topK(col("s"), struct(col("t"), col("n")), 2).as("top"))
      .select(col("top"))
      .as[Seq[(String, Long)]].head()
    assert(out == Seq(("a", 5L), ("a", 20L)))
  }

  test("salientTerms (heap aggregate) is pointwise equal to the window formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaAgg = CorpusStats.salientTerms(docs, k = 4)
      .orderBy("doc_id", "rank")
      .as[(Long, String, Long, Long, Double, Int)].collect().toSeq
    val viaWin = CorpusStats.salientTermsViaWindow(docs, k = 4)
      .select("doc_id", "term", "tf", "df", "score", "rank")
      .orderBy("doc_id", "rank")
      .as[(Long, String, Long, Long, Double, Int)].collect().toSeq
    assert(viaAgg.size == viaWin.size)
    assert(viaAgg == viaWin)
  }

  test("graft_top_k is SQL-callable via SparkSessionExtensions") {
    Seq(("a", 1.0, "x"), ("a", 3.0, "y"), ("a", 2.0, "z"))
      .toDF("g", "s", "p").createOrReplaceTempView("graft_topk_t")
    val r = spark.sql(
      "SELECT graft_top_k(s, p, 2) AS top FROM graft_topk_t GROUP BY g")
      .as[Seq[String]].head()
    assert(r == Seq("y", "z"))
  }

  test("long scores order exactly past 2^53 where a double key would tie") {
    // two scores that collide when rounded to double but differ as longs
    val a = (1L << 53) + 1L // not representable: rounds to 2^53
    val b = 1L << 53
    val df = Seq(("g", a, "big"), ("g", b, "small"), ("g", 7L, "tiny"))
      .toDF("g", "s", "p")
    val top = df.groupBy("g")
      .agg(TopKAgg.topK(col("s"), col("p"), 2).as("top"))
      .as[(String, Seq[String])].head()._2
    // exact long order: a > b even though (double) a == (double) b;
    // a double-keyed heap would fall to the payload tie-break and
    // return "big", "small" only by luck of the alphabet
    assert(top == Seq("big", "small"), top.toString)
    // round-trip through serialize/merge keeps the long exact: force a
    // shuffle with repartitioned input
    val top2 = df.repartition(5).groupBy("g")
      .agg(TopKAgg.topK(col("s"), col("p"), 2).as("top"))
      .as[(String, Seq[String])].head()._2
    assert(top2 == Seq("big", "small"), top2.toString)
  }

  test("a non-numeric score type is refused at analysis") {
    val df = Seq(("g", "nope", "p")).toDF("g", "s", "p")
    val e = intercept[Exception] {
      df.groupBy("g").agg(TopKAgg.topK(col("s"), col("p"), 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("double or long"), e.getMessage)
  }

  test("the aggregate plans as ObjectHashAggregate with a partial stage, no Window") {
    val df = Seq((1, 1.0, "a")).toDF("g", "s", "p")
    val p = df.groupBy("g")
      .agg(TopKAgg.topK(col("s"), col("p"), 3).as("top"))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(400))
    assert(p.contains("partial_graft_top_k"),
      s"map-side partial aggregation must be planned:\n${p.take(400)}")
    assert(!p.contains("Window"))
  }
}
