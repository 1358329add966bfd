package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import Multimodal._

  test("decodeMeta recovers header fields through the distributed path") {
    val media = syntheticMedia(spark, 20, "image")
    val meta = decodeMeta(media).collect().sortBy(_.media_id)
    assert(meta.length == 20)
    assert(meta(0).width == 64 && meta(0).height == 48 && meta(0).channels == 3)
    assert(meta(1).width == 80 && meta(1).height == 64)
    assert(meta.forall(_.byte_len > 0))
  }

  test("audio kind parses sample_rate, not dims") {
    val meta = decodeMeta(syntheticMedia(spark, 4, "audio")).collect().sortBy(_.media_id)
    assert(meta(0).sample_rate == 16000 && meta(0).width == -1)
    assert(meta(1).sample_rate == 24000)
  }

  test("extractFeatures is deterministic and feeds the similarity stack") {
    val media = syntheticMedia(spark, 10)
    val f1 = extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    val f2 = extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(f1.length == 10 && f1.forall(_.feature.length == 16))
    f1.zip(f2).foreach { case (a, b) => assert(a.feature.sameElements(b.feature)) }
    // plug into the embedding near-dup miner: identical media are dups
    val spark2 = spark
    import spark2.implicits._
    val emb = extractFeatures(media.union(media), 16)
      .withColumn("rid", monotonically_increasing_id())
      .withColumn("label", lit(0))
    val pairs = Dedup.embeddingNearDupPairs(emb, "rid", "feature", "label", 0.999)
    assert(pairs.count() >= 10) // each media row pairs with its twin
  }

  test("sampleFrames fans out video rows, respecting stride") {
    val media = syntheticMedia(spark, 6, "video")
    val all = sampleFrames(media, everyNth = 1).collect()
    val strided = sampleFrames(media, everyNth = 2).collect()
    // frames per video = 4 + (i % 3): 4..6
    val byId = all.groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(byId(0L) == 4 && byId(1L) == 5 && byId(2L) == 6)
    assert(strided.length < all.length && strided.forall(_.frame_idx % 2 == 0))
    assert(all.forall(_.bytes.nonEmpty))
  }

  test("repartitionBySize derives partition count from bytes, not rows") {
    val df = syntheticMedia(spark, 50).toDF()
    val small = repartitionBySize(df, "bytes", targetPartitionBytes = 4L << 10)
    val one = repartitionBySize(df, "bytes", targetPartitionBytes = 1L << 30)
    assert(small.rdd.getNumPartitions > 1)
    assert(one.rdd.getNumPartitions == 1)
    assert(small.count() == 50)
  }
}
