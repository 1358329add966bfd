package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankSpec extends SparkSpec {

  import spark.implicits._

  test("globalRank assigns dense unique 1-based ranks under the total order") {
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b"), (1L, "z"))
      .toDF("k", "v")
    val out = Rank.globalRank(df, Seq("k", "v"))
      .orderBy("rank")
      .as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, "a", 1L), (1L, "z", 2L), (2L, "b", 3L), (3L, "c", 4L)))
  }

  test("globalRank is invariant to input partitioning") {
    val df = (1 to 997).map(i => ((i * 7919) % 1000, i)).toDF("k", "id")
    val a = Rank.globalRank(df.coalesce(1), Seq("k", "id"))
      .select("k", "id", "rank").as[(Int, Int, Long)].collect().toSet
    val b = Rank.globalRank(df.repartition(17), Seq("k", "id"))
      .select("k", "id", "rank").as[(Int, Int, Long)].collect().toSet
    assert(a == b)
    assert(a.map(_._3) == (1 to 997).map(_.toLong).toSet, "dense 1..N")
  }

  test("curriculum phases are contiguous rank ranges with floor distribution") {
    val df = (1L to 10L).map(i => (i, i)).toDF("doc_id", "len")
    val out = Rank.curriculum(df, Seq("len", "doc_id"), phases = 4)
      .orderBy("rank")
      .select("rank", "phase").as[(Long, Int)].collect()
    // (rank-1)*4 div 10: ranks 1-3 → 0, 4-5 → 1, 6-8 → 2, 9-10 → 3
    assert(out.map(_._2).toSeq == Seq(0, 0, 0, 1, 1, 2, 2, 2, 3, 3))
  }

  test("globalRank matches the window row_number on real data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "n_chars")
    val viaRank = Rank.globalRank(docs, Seq("n_chars", "doc_id"))
      .select("doc_id", "rank").as[(Long, Long)].collect().toMap
    val viaWindow = docs
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("n_chars"), col("doc_id"))))
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    assert(viaRank == viaWindow.map { case (k, v) => k -> v.toLong })
  }
}
