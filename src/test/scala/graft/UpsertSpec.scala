package graft

import org.apache.spark.sql.functions._

import graft.ops.Upsert

class UpsertSpec extends SparkSpec {

  import spark.implicits._

  test("upsert: incoming beats existing on key collision") {
    val existing = Seq((1L, "old"), (2L, "keep")).toDF("uuid", "v")
    val incoming = Seq((1L, "new"), (3L, "add")).toDF("uuid", "v")
    val out = Upsert.upsert(existing, incoming, "uuid")
      .orderBy("uuid").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "new"), (2L, "keep"), (3L, "add")))
  }

  test("upsert: within-batch ordinal decides keep-last") {
    val existing = Seq.empty[(Long, String, Long)].toDF("uuid", "v", "ord")
    val incoming = Seq((1L, "first", 10L), (1L, "second", 20L)).toDF("uuid", "v", "ord")
    val out = Upsert.upsert(existing, incoming, "uuid", Some(col("ord")))
      .select("uuid", "v").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "second")))
  }

  test("anti-join form agrees with window form when batch is key-unique") {
    val existing = (1L to 100L).map(i => (i, s"e$i")).toDF("uuid", "v")
    val incoming = (50L to 150L).map(i => (i, s"i$i")).toDF("uuid", "v")
    val a = Upsert.upsert(existing, incoming, "uuid").orderBy("uuid").collect()
    val b = Upsert.upsertAntiJoin(existing, incoming, "uuid").orderBy("uuid").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("property: upsert is idempotent (README.md:141-145 invariant)") {
    // seeded random batches stand in for scalacheck generators
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val rows = List.fill(30)((rnd.nextLong(10) + 1, rnd.nextString(4)))
      val batch = Upsert.keepLast(
        rows.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }.toDF("uuid", "v", "ord"),
        Seq("uuid"), col("ord")).drop("ord")
      val empty = Seq.empty[(Long, String)].toDF("uuid", "v")
      val once = Upsert.upsert(empty, batch, "uuid")
      val twice = Upsert.upsert(once, batch, "uuid")
      assert(once.orderBy("uuid", "v").collect().toSeq ==
        twice.orderBy("uuid", "v").collect().toSeq, s"seed=$seed")
    }
  }

  test("keepLast collapses each key to exactly one row") {
    val df = (1L to 1000L).map(i => (i % 37, i)).toDF("k", "ord")
    val out = Upsert.keepLast(df, Seq("k"), col("ord"))
    assert(out.count() == 37)
    assert(out.agg(min(col("ord"))).as[Long].head() >= 1000 - 37)
  }
}
