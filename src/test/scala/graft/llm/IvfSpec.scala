package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("train produces k centroids of the right dimension, deterministically") {
    val c1 = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 3)
      .orderBy("cell").collect()
    val c2 = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 3)
      .orderBy("cell").collect()
    assert(c1.length == 8)
    assert(c1.forall(_.getSeq[Double](1).length == 64))
    // structure-seeded init + deterministic pipeline → identical replay
    c1.zip(c2).foreach { case (a, b) =>
      assert(a.getInt(0) == b.getInt(0) && a.getSeq[Double](1) == b.getSeq[Double](1))
    }
  }

  test("assignment is total and cells are non-trivial") {
    val cents = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 3)
    val v = Similarity.withNorm(emb, "vec_id", "embedding")
    val assigned = Ivf.assign(v, cents)
    assert(assigned.count() == emb.count())
    val cells = assigned.groupBy("cell").count().collect()
    assert(cells.length >= 4, s"degenerate clustering: ${cells.mkString(",")}")
  }

  test("nprobe search: more probes -> recall rises toward brute force") {
    val cents = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 3)
    val pred = col("vec_id") % 10 === 0
    val brute = Similarity.bruteForceTopK(emb, emb.filter(pred), "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(nprobe: Int): Double = {
      val got = Ivf.search(emb, "vec_id", "embedding", cents, topK = 5,
        nprobe = nprobe, queryPred = pred)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (got & brute).size.toDouble / brute.size
    }
    val r1 = recall(1)
    val r4 = recall(4)
    val r8 = recall(8) // probing every cell = exhaustive = exact
    assert(r4 >= r1, s"recall fell with more probes: $r1 -> $r4")
    assert(r8 > 0.999, s"nprobe=k must equal brute force, got $r8")
    assert(r4 > 0.3, s"nprobe=4 of 8 cells should find a solid fraction: $r4")
  }
}
