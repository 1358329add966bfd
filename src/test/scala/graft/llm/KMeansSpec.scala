package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def blob(center: Seq[Double], ids: Range, off: Double) =
    ids.map(i => (i.toLong, center.map(_ + (i % 3) * off)))

  test("two separated blobs recover their exact means at k=2") {
    // offsets are exact 2-decimal values → decimal means are exact
    val pts = blob(Seq(0.0, 0.0), 0 until 9, 0.01) ++
      blob(Seq(10.0, 10.0), 100 until 109, 0.01)
    val df = pts.toDF("id", "e")
    val model = KMeans.fit(df, "id", "e", k = 2, iters = 3).collect()
      .map(r => r.getInt(0) -> (r.getSeq[Double](1), r.getLong(2))).toMap
    assert(model.size == 2)
    // each blob: mean offset = (3*0 + 3*0.01 + 3*0.02)/9 = 0.01 exactly
    val (c0, n0) = model(0)
    val (c1, n1) = model(1)
    assert(n0 == 9L && n1 == 9L)
    assert(c0 == Seq(0.01, 0.01), c0.toString)
    assert(c1 == Seq(10.01, 10.01), c1.toString)
  }

  test("fit is partitioning-invariant (decimal means, deterministic argmin)") {
    val pts = (0 until 60).map { i =>
      (i.toLong, Seq((i % 7) / 7.0, (i % 11) / 11.0, (i % 5) / 5.0))
    }
    val df = pts.toDF("id", "e")
    val a = KMeans.fitFlat(df, "id", "e", k = 4, iters = 3)
      .orderBy("cell", "dim").collect().map(_.toSeq)
    val b = KMeans.fitFlat(df.repartition(13), "id", "e", k = 4, iters = 3)
      .orderBy("cell", "dim").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("assign serves the frozen model with smallest-cell tie-break") {
    val df = Seq((1L, Seq(0.0)), (2L, Seq(4.0))).toDF("id", "e")
    val cents = Seq((0, Seq(1.0)), (1, Seq(3.0)), (2, Seq(5.0)))
      .toDF("cell", "centroid")
      .select(col("cell"), col("centroid").cast("array<double>"))
    val got = KMeans.assign(df, cents, "id", "e")
      .select("id", "cell").as[(Long, Int)].collect().toMap
    assert(got(1L) == 0)
    // 4.0 is equidistant from 3.0 and 5.0 → smallest cell wins
    assert(got(2L) == 1)
  }

  test("maximin seeds spread: farthest-point picks, deterministic ties") {
    // 1-D points: 0, 0.1, 5, 9.9, 10 — min-id picks {0, 0.1, 5} for
    // k=3; maximin picks 0, then 10 (farthest), then 5 (maximin)
    val df = Seq((1L, Seq(0.0)), (2L, Seq(0.1)), (3L, Seq(5.0)),
      (4L, Seq(9.9)), (5L, Seq(10.0))).toDF("id", "e")
    val seeds = KMeans.maximinSeeds(df, "id", "e", k = 3)
      .orderBy("cell").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).head).toMap
    assert(seeds == Map(0 -> 0.0, 1 -> 10.0, 2 -> 5.0), seeds.toString)
    // tie on distance → smallest id: two symmetric extremes
    val sym = Seq((1L, Seq(0.0)), (2L, Seq(-3.0)), (3L, Seq(3.0)))
      .toDF("id", "e")
    val s2 = KMeans.maximinSeeds(sym, "id", "e", k = 2)
      .orderBy("cell").collect().map(_.getSeq[Double](1).head)
    assert(s2.toSeq == Seq(0.0, -3.0), s2.toSeq.toString)
    // fit plumbs the init through and stays partitioning-invariant
    val a = KMeans.fitFlat(df, "id", "e", k = 3, iters = 2, init = "maximin")
      .orderBy("cell", "dim").collect().map(_.toSeq)
    val b = KMeans.fitFlat(df.repartition(7), "id", "e", k = 3, iters = 2,
      init = "maximin").orderBy("cell", "dim").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // unknown init refused
    val e = intercept[IllegalArgumentException] {
      KMeans.fit(df, "id", "e", k = 2, iters = 1, init = "random")
    }
    assert(e.getMessage.contains("unknown init"))
  }

  test("wcssByCell: hand-computed cohesion; maximin beats degenerate min-id seeds") {
    // blob at 0 (0, 0.1, 0.2) and blob at 10 (10, 10.1): k=2
    val df = Seq((1L, Seq(0.0)), (2L, Seq(0.1)), (3L, Seq(0.2)),
      (4L, Seq(10.0)), (5L, Seq(10.1))).toDF("id", "e")
    val model = KMeans.fit(df, "id", "e", k = 2, iters = 4, init = "maximin")
    val w = KMeans.wcssByCell(df, model, "id", "e")
      .orderBy("cell").collect()
    assert(w.map(_.getLong(1)).sum == 5L)
    // blob means: 0.1 and 10.05 → wcss = 0.02 and 0.005
    val total = w.map(_.getDouble(2)).sum
    assert(math.abs(total - 0.025) < 1e-6, total.toString)
    // min-id seeds (ids 1,2 — both in blob 0) converge worse or equal;
    // with enough Lloyd rounds both find the split, so compare at ONE
    // round where the seed spread is the whole story
    val bad = KMeans.fit(df, "id", "e", k = 2, iters = 1)
    val badTotal = KMeans.wcssByCell(df, bad, "id", "e")
      .collect().map(_.getDouble(2)).sum
    val good = KMeans.fit(df, "id", "e", k = 2, iters = 1, init = "maximin")
    val goodTotal = KMeans.wcssByCell(df, good, "id", "e")
      .collect().map(_.getDouble(2)).sum
    assert(goodTotal < badTotal,
      s"maximin $goodTotal should beat min-id $badTotal at one round")
  }

  test("empty cells drop from the model") {
    // k=3 seeds = ids 1,2,3, but all points cluster near two sites:
    // after one update the middle seed keeps no members
    val df = Seq(
      (1L, Seq(0.0)), (2L, Seq(0.1)), (3L, Seq(9.0)),
      (4L, Seq(0.05)), (5L, Seq(9.1)), (6L, Seq(8.9)),
    ).toDF("id", "e")
    val model = KMeans.fit(df, "id", "e", k = 3, iters = 4)
    val cells = model.select("cell").as[Int].collect().toSet
    assert(cells.size <= 3 && model.count() == cells.size)
    // every input vector still lands in a surviving cell
    val assigned = KMeans.assign(df, model.select("cell", "centroid"),
      "id", "e")
    assert(assigned.count() == 6)
  }
}
