package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("canonical key neutralizes case, unicode form, whitespace runs, and word order") {
    val pairs = Seq(
      ("Acme  Corp", "acme corp"),
      ("Corp ACME", "Acme Corp"),                       // word order
      ("Caf\u00e9 Luna", "Cafe\u0301  Luna"),           // composed vs combining accent
      ("A\u00a0B", "a b"),                              // NBSP
    ).toDF("x", "y")
    val out = pairs.select(
      (FuzzyJoin.canonicalKey(col("x")) === FuzzyJoin.canonicalKey(col("y")))
        .as("eq")).as[Boolean].collect()
    assert(out.forall(identity), out.mkString(","))

    val diff = Seq(("Acme Corp", "Acme Inc")).toDF("x", "y").select(
      (FuzzyJoin.canonicalKey(col("x")) === FuzzyJoin.canonicalKey(col("y")))
        .as("eq")).as[Boolean].head()
    assert(!diff, "different content must not collide")
  }

  test("join recovers formatting-variant matches a raw equi-join loses entirely") {
    val left = Seq((1L, "Blue Widgets Ltd"), (2L, "Red Gadget Co"), (3L, "Lone Corp"))
      .toDF("id", "k")
    val right = Seq((10L, "blue  widgets LTD"), (20L, "Co Gadget RED"))
      .toDF("rid", "k2")
    val raw = left.join(right, col("k") === col("k2")).count()
    assert(raw == 0L, "the fixture must defeat the raw join")
    val fuzzy = FuzzyJoin.onCanonicalKey(left, right, "k", "k2")
      .select("id", "rid").as[(Long, Long)].collect().toSet
    assert(fuzzy == Set((1L, 10L), (2L, 20L)))
    // left_outer keeps the unmatched row with a null right side
    val outer = FuzzyJoin.onCanonicalKey(left, right, "k", "k2", "left_outer")
    assert(outer.count() == 3L &&
      outer.filter(col("rid").isNull).select("id").as[Long].head() == 3L)
  }
}
