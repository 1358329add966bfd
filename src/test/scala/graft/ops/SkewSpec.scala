package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 1 hot key with 5000 rows + 100 normal keys with 10 rows each
  private def skewed() = {
    val hot = (0 until 5000).map(i => ("hot", i.toLong, i * 1.5))
    val normal = for { k <- 0 until 100; i <- 0 until 10 }
      yield (s"k$k", (k * 10 + i).toLong, k + i * 0.25)
    (hot ++ normal).toDF("key", "ord", "value")
  }

  test("saltedKeepLast agrees with the unsalted window form") {
    val df = skewed()
    val plain = Upsert.keepLast(df, Seq("key"), $"ord")
      .orderBy("key").collect()
    val salted = Skew.saltedKeepLast(df, Seq("key"), $"ord", salts = 8)
      .orderBy("key").collect()
    assert(salted.toSeq == plain.toSeq)
    // the hot key kept its max ordinal
    val hotRow = salted.find(_.getString(0) == "hot").get
    assert(hotRow.getLong(1) == 4999L)
  }

  test("saltedAgg matches plain groupBy aggregation") {
    val df = skewed()
    val plain = df.groupBy("key")
      .agg(sum($"value").as("s"), count($"value").as("c"),
        min($"value").as("mn"), max($"value").as("mx"))
      .orderBy("key").collect()
    val salted = Skew.saltedAgg(
      df, Seq("key"), $"ord",
      Map("s" -> ($"value", "sum"), "c" -> ($"value", "count"),
        "mn" -> ($"value", "min"), "mx" -> ($"value", "max")),
      salts = 8)
      .select("key", "s", "c", "mn", "mx")
      .orderBy("key").collect()
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getString(0) == s.getString(0))
      assert(math.abs(p.getDouble(1) - s.getDouble(1)) < 1e-6) // float sum order differs
      assert(p.getLong(2) == s.getLong(2))
      assert(p.getDouble(3) == s.getDouble(3) && p.getDouble(4) == s.getDouble(4))
    }
  }

  test("phase-1 spread: hot key occupies multiple salt groups") {
    val df = skewed()
    val groups = df
      .withColumn("salt", Skew.salt($"ord", 8))
      .filter($"key" === "hot")
      .select("salt").distinct().count()
    assert(groups == 8L)
  }

  // The canonical skew case: one hot key whose VALUE column is constant
  // (millions of identical measurements). A value-derived salt would
  // collapse to ONE phase-1 group; the ordinal-derived salt must still
  // fan out across all `salts` buckets — and the merged result must
  // equal the plain aggregation.
  test("saltedAgg fans out a constant-valued hot key") {
    val df = ((0 until 4000).map(i => ("hot", i.toLong, 1.0)) ++
      (0 until 20).map(i => ("cold", (4000 + i).toLong, 2.0)))
      .toDF("key", "ord", "value")
    val phase1Groups = df
      .filter($"key" === "hot")
      .select(Skew.salt($"ord", 8).as("s"))
      .distinct().count()
    assert(phase1Groups == 8L, "constant-valued hot key must still spread")
    val out = Skew.saltedAgg(
      df, Seq("key"), $"ord",
      Map("s" -> ($"value", "sum"), "c" -> ($"value", "count")),
      salts = 8)
      .orderBy("key").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ==
      Seq(("cold", 40.0, 20L), ("hot", 4000.0, 4000L)))
  }
}
