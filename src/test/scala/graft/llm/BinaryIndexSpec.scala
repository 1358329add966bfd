package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[BinaryIndex]] — the stored-codes binary tier must be
  * bit-transparent: serving from the materialized `(id, bw)` table
  * equals the inline [[Similarity.binaryTopK]] over the same corpus,
  * across writes, keyed appends/updates, and deletes. */
class BinaryIndexSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("stored search ≡ inline binaryTopK across write, keyed update, and delete generations") {
    implicit val s = spark
    val root = tmpDir("graft_bix_")
    val store = new graft.io.SnapshotBucketedStore(root, 8, "parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val pred = col("vec_id") % 10 === 0

    def stored(corpus: org.apache.spark.sql.DataFrame) =
      BinaryIndex.searchFrom(store, "bix", corpus, "vec_id", "embedding",
          dim = 64, k = 5, queryPred = pred, pool = 16)
        .select($"query_id", $"neighbor_id", $"hamming", $"sim", $"rank")
        .as[(Long, Long, Int, Double, Int)].collect()
        .sortBy(r => (r._1, r._5)).toSeq
    def inline(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.binaryTopK(corpus, "vec_id", "embedding",
          dim = 64, k = 5, queryPred = pred, pool = 16)
        .select($"query_id", $"neighbor_id", $"hamming", $"sim", $"rank")
        .as[(Long, Long, Int, Double, Int)].collect()
        .sortBy(r => (r._1, r._5)).toSeq

    // generation 1: the packed corpus
    BinaryIndex.writeIndex(store, "bix", emb, "vec_id", "embedding", 64)
    assert(stored(emb).nonEmpty && stored(emb) == inline(emb))

    // generation 2: one vector flips all its signs (keyed update), one
    // brand-new vector arrives — appendVectors needs no frozen model
    val victim = emb.orderBy($"vec_id").limit(1)
      .as[(Long, Array[Float])].head()
    val changed = Seq((victim._1, victim._2.map(x => -x - 1e-6f)),
      (900001L, victim._2)).toDF("vec_id", "embedding")
    val corpus2 = emb.filter($"vec_id" =!= victim._1).unionByName(changed)
    BinaryIndex.appendVectors(store, "bix", changed, "vec_id", "embedding", 64)
    assert(stored(corpus2) == inline(corpus2))

    // generation 3: the new vector is deleted again
    store.delete("bix", "id", Seq(900001L).toDF("id"))
    val corpus3 = corpus2.filter($"vec_id" =!= 900001L)
    assert(stored(corpus3) == inline(corpus3))
    assert(!stored(corpus3).exists(r => r._2 == 900001L))
  }
}
