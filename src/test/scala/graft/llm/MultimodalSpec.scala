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

  // The Minimal codec decodes REAL formats (bytes we author to spec
  // here, readable by any image tool): the codec seam is exercised by
  // an actual decoder, not only the deterministic stub.
  test("Minimal codec decodes real BMP and PGM bytes through the seam") {
    import spark.implicits._
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def bmp(w: Int, h: Int): Array[Byte] = {
      val rowBytes = ((w * 3 + 3) / 4) * 4
      val size = 54 + rowBytes * h
      Array[Byte]('B', 'M') ++ le32(size) ++ le32(0) ++ le32(54) ++ // file header
        le32(40) ++ le32(w) ++ le32(h) ++                            // info header + dims
        Array[Byte](1, 0, 24, 0) ++ le32(0) ++ le32(rowBytes * h) ++
        Array.fill(16 + rowBytes * h)(0x7f.toByte)
    }
    def pgm(w: Int, h: Int): Array[Byte] =
      s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++ Array.fill(w * h)(0x40.toByte)
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "image", bmp(37, 21), "mem://a.bmp"),
      MediaRecord(2L, "image", pgm(16, 9), "mem://b.pgm"),
      MediaRecord(3L, "image", Array[Byte](1, 2, 3), "mem://junk.bin"),
    ))
    val meta = decodeMeta(media, MediaDecoder.Minimal).collect().sortBy(_.media_id)
    assert(meta(0).width == 37 && meta(0).height == 21 && meta(0).channels == 3)
    assert(meta(1).width == 16 && meta(1).height == 9 && meta(1).channels == 1)
    assert(meta(2).width == -1 && meta(2).byte_len == 3L, "junk degrades, never throws")
    // feature extraction over real payloads stays deterministic + bounded
    val f = extractFeatures(media, dim = 8, MediaDecoder.Minimal).collect()
    assert(f.length == 3 && f.forall(_.feature.forall(v => v >= 0f && v <= 1f)))
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
