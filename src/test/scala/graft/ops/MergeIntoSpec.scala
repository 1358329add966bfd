package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeIntoSpec extends SparkSpec {
  import spark.implicits._
  import MergeInto.src

  private def target() =
    Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("k", "bal", "tag")

  test("all four MERGE paths: update, delete, insert, passthrough") {
    val source = Seq((1L, 5.0, false), (2L, 99.0, true), (9L, 7.0, false))
      .toDF("k", "delta", "purge")
    val out = MergeInto.merge(
      target(), source, "k",
      updateSet = Map("bal" -> ($"bal" + src("delta"))),
      deleteWhen = Some(src("purge")),
      insertSet = Map("k" -> src("k"), "bal" -> src("delta"), "tag" -> lit("new")),
    ).orderBy("k").as[(Long, Double, String)].collect().toSeq
    assert(out == Seq(
      (1L, 15.0, "a"),   // matched: updated
      // 2L deleted (purge)
      (3L, 30.0, "c"),   // no source row: passthrough
      (9L, 7.0, "new"),  // source-only: inserted
    ))
  }

  test("without insertSet, source-only rows are ignored") {
    val source = Seq((1L, 1.0), (9L, 9.0)).toDF("k", "delta")
    val out = MergeInto.merge(
      target(), source, "k",
      updateSet = Map("bal" -> ($"bal" + src("delta"))),
    ).orderBy("k").as[(Long, Double, String)].collect().toSeq
    assert(out == Seq((1L, 11.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c")))
  }

  test("null delete predicate keeps the row (no three-valued surprise)") {
    val source = Seq((1L, 5.0, Option.empty[Boolean])).toDF("k", "delta", "purge")
    val out = MergeInto.merge(
      target(), source, "k",
      updateSet = Map("bal" -> ($"bal" + src("delta"))),
      deleteWhen = Some(src("purge")),
    ).orderBy("k").as[(Long, Double, String)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L) && out.head._2 == 15.0)
  }

  test("delete wins over update for the same matched row") {
    val source = Seq((1L, 100.0, true)).toDF("k", "delta", "purge")
    val out = MergeInto.merge(
      target(), source, "k",
      updateSet = Map("bal" -> ($"bal" + src("delta"))),
      deleteWhen = Some(src("purge")),
    ).as[(Long, Double, String)].collect().map(_._1).sorted
    assert(out.toSeq == Seq(2L, 3L))
  }
}
