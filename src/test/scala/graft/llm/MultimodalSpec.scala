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

  // ImageIO codec: a genuine third-party format path — PNG/JPEG bytes
  // produced by the JDK's own encoder, decoded back through the
  // distributed seam by the JDK's decoder registry.
  test("ImageIO codec decodes genuine PNG and JPEG bytes through the seam") {
    import spark.implicits._
    def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | 0x40)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val png = encode(33, 17, "png")
    val jpg = encode(24, 24, "jpg")
    assert(png.take(4).sameElements(Array[Byte](0x89.toByte, 'P', 'N', 'G')),
      "the fixture must be a real PNG container")
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "image", png, "mem://a.png"),
      MediaRecord(2L, "image", jpg, "mem://b.jpg"),
      MediaRecord(3L, "image", s"P5\n8 4\n255\n".getBytes("US-ASCII") ++
        Array.fill(32)(0x40.toByte), "mem://c.pgm"), // ImageIO lacks PGM → Minimal fallback
      MediaRecord(4L, "image", Array[Byte](9, 9, 9), "mem://junk.bin"),
    ))
    val meta = decodeMeta(media, MediaDecoder.ImageIO).collect().sortBy(_.media_id)
    assert(meta(0).width == 33 && meta(0).height == 17 && meta(0).channels == 3)
    assert(meta(1).width == 24 && meta(1).height == 24 && meta(1).channels == 3)
    assert(meta(2).width == 8 && meta(2).height == 4, "PGM falls back to Minimal")
    assert(meta(3).width == -1, "junk degrades, never throws")
    // pixel-space features: the same image re-encoded lands on the
    // SAME vector (luminance is computed over decoded pixels, not
    // container bytes) — the property payload-byte features can't have
    val bmpTwin = encode(33, 17, "bmp")
    val pair = spark.createDataset(Seq(
      MediaRecord(10L, "image", png, "mem://a.png"),
      MediaRecord(11L, "image", bmpTwin, "mem://a.bmp"),
    ))
    val f = extractFeatures(pair, dim = 8, MediaDecoder.ImageIO).collect().sortBy(_.media_id)
    f(0).feature.zip(f(1).feature).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, "re-encoded image must map to the same pixel signature")
    }
  }

  // Audio codec: genuine WAV containers produced by the JDK's own
  // encoder, decoded back through the distributed seam.
  test("Audio codec decodes genuine WAV bytes: header, envelope features, frame windows") {
    import spark.implicits._
    import javax.sound.sampled._
    // 2 seconds at 8 kHz mono 16-bit: first second silent, second a
    // loud 440 Hz tone — a shaped envelope the features must recover
    def wav(bits: Int): Array[Byte] = {
      val rate = 8000
      val n = rate * 2
      val fmt = new AudioFormat(rate.toFloat, bits, 1, bits == 16, false)
      val frameBytes = bits / 8
      val pcm = new Array[Byte](n * frameBytes)
      // 8-bit WAV is UNSIGNED: silence is 128, not byte 0 (which is
      // full-scale negative). 16-bit signed silence is the zero fill.
      if (bits == 8) java.util.Arrays.fill(pcm, 0, rate, 128.toByte)
      for (i <- rate until n) {
        val s = math.sin(2 * math.Pi * 440 * (i - rate) / rate) * 0.8
        if (bits == 16) {
          val v = (s * 32767).toInt
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        } else pcm(i) = ((s * 127).toInt + 128).toByte // 8-bit WAV is unsigned
      }
      val in = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val w16 = wav(16)
    assert(new String(w16.take(4), "US-ASCII") == "RIFF",
      "the fixture must be a real WAV container")
    val media = spark.createDataset(Seq(
      MediaRecord(1L, "audio", w16, "mem://a.wav"),
      MediaRecord(2L, "audio", Array[Byte](9, 9, 9), "mem://junk.bin"),
    ))
    val meta = decodeMeta(media, MediaDecoder.Audio).collect().sortBy(_.media_id)
    assert(meta(0).sample_rate == 8000 && meta(0).channels == 1 && meta(0).n_frames == 16000,
      s"got ${meta(0)}")
    assert(meta(1).sample_rate == MediaDecoder.Stub.decode(
      MediaRecord(2L, "audio", Array[Byte](9, 9, 9), "")).sample_rate,
      "junk degrades to Stub semantics, never throws")
    // envelope: first half of the buckets silent, second half loud
    val feats = extractFeatures(
      spark.createDataset(Seq(MediaRecord(1L, "audio", w16, "mem://a.wav"))),
      dim = 8, MediaDecoder.Audio).collect().head.feature
    assert(feats.take(4).forall(_ < 0.01), s"silent half must be ~0: ${feats.toSeq}")
    // mean |sin| of a 0.8-amplitude tone ≈ 0.8 · 2/π ≈ 0.51
    assert(feats.drop(4).forall(v => v > 0.4 && v < 0.6), s"tone half: ${feats.toSeq}")
    // bit-depth invariance: the same signal at 8-bit lands on nearly
    // the same envelope (features are over decoded samples, not bytes)
    val feats8 = extractFeatures(
      spark.createDataset(Seq(MediaRecord(3L, "audio", wav(8), "mem://a8.wav"))),
      dim = 8, MediaDecoder.Audio).collect().head.feature
    feats.zip(feats8).foreach { case (a, b) =>
      assert(math.abs(a - b) < 0.02, s"${feats.toSeq} vs ${feats8.toSeq}")
    }
    // encoding invariance: the same signal as ULAW AU — 8-bit but
    // NON-linear — must route through the JVM's codec conversion, not
    // decode as linear PCM (which would distort the envelope)
    val ulaw = {
      val src = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(w16))
      val u = AudioSystem.getAudioInputStream(AudioFormat.Encoding.ULAW, src)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(u, AudioFileFormat.Type.AU, out)
      out.toByteArray
    }
    val featsU = extractFeatures(
      spark.createDataset(Seq(MediaRecord(4L, "audio", ulaw, "mem://a.au"))),
      dim = 8, MediaDecoder.Audio).collect().head.feature
    feats.zip(featsU).foreach { case (a, b) =>
      assert(math.abs(a - b) < 0.03, s"${feats.toSeq} vs ${featsU.toSeq}")
    }
    // frame sampling: 2 seconds → 2 one-second PCM windows, stride 1
    val frames = sampleFrames(
      spark.createDataset(Seq(MediaRecord(1L, "audio", w16, "mem://a.wav"))),
      everyNth = 1, MediaDecoder.Audio).collect().sortBy(_.frame_idx)
    assert(frames.length == 2, s"got ${frames.length}")
    assert(frames(0).bytes.length == 16000, "one second of 16-bit 8 kHz mono")
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

  test("toPcm routing: only encodings samples() decodes pass through") {
    import javax.sound.sampled._
    def stream(fmt: AudioFormat, raw: Array[Byte]) =
      new AudioInputStream(new java.io.ByteArrayInputStream(raw),
        fmt, raw.length.toLong / fmt.getFrameSize)
    def fmt(enc: AudioFormat.Encoding, bits: Int) =
      new AudioFormat(enc, 8000f, bits, 1, bits / 8, 8000f, false)
    def readAll(in: AudioInputStream): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    }
    // a short 16-bit signed ramp and its unsigned twin (sample+32768)
    val n = 64
    val signed = new Array[Byte](2 * n)
    val unsigned = new Array[Byte](2 * n)
    for (i <- 0 until n) {
      val v = (i - 32) * 1000
      signed(2 * i) = (v & 0xff).toByte
      signed(2 * i + 1) = ((v >> 8) & 0xff).toByte
      val u = v + 32768
      unsigned(2 * i) = (u & 0xff).toByte
      unsigned(2 * i + 1) = ((u >> 8) & 0xff).toByte
    }
    // pass-throughs: everything samples() decodes natively
    for ((e, b) <- Seq(
        (AudioFormat.Encoding.PCM_SIGNED, 16),
        (AudioFormat.Encoding.PCM_SIGNED, 24),
        (AudioFormat.Encoding.PCM_SIGNED, 32),
        (AudioFormat.Encoding.PCM_SIGNED, 8),
        (AudioFormat.Encoding.PCM_UNSIGNED, 8))) {
      val raw = new Array[Byte](b / 8 * n)
      val in = stream(fmt(e, b), raw)
      assert(MediaDecoder.Audio.toPcm(in).exists(_ eq in), s"$e/$b must pass through")
    }
    // 16-bit UNSIGNED converts — and the converted stream must carry
    // the TRUE sample values. (OpenJDK's PCMtoPCMCodec silently
    // no-ops a same-endianness 16-bit sign switch; the router works
    // around it with an endian-flipped target, so decode by the
    // RETURNED format, whatever it is, and compare values.)
    val conv = MediaDecoder.Audio.toPcm(
      stream(fmt(AudioFormat.Encoding.PCM_UNSIGNED, 16), unsigned))
    assert(conv.isDefined, "the JVM PCM codec converts 16-bit unsigned")
    val cf = conv.get.getFormat
    assert(cf.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      cf.getSampleSizeInBits == 16)
    val cb = readAll(conv.get)
    val decoded = (0 until n).map { i =>
      val (hi, lo) = if (cf.isBigEndian) (cb(2 * i), cb(2 * i + 1))
        else (cb(2 * i + 1), cb(2 * i))
      ((hi << 8) | (lo & 0xff)).toShort.toInt
    }
    assert(decoded == (0 until n).map(i => (i - 32) * 1000),
      "unsigned->signed conversion must recover the exact sample values")
  }

  test("24-bit studio WAV lands on the same envelope as its 16-bit twin") {
    import spark.implicits._
    import javax.sound.sampled._
    // the same shaped signal (1s silence, 1s 440 Hz tone) at 16- and
    // 24-bit depth; pre-fix the 24-bit payload fell through samples()'s
    // 8-bit branch and produced a garbage envelope
    def wav(bits: Int): Array[Byte] = {
      val rate = 8000
      val n = rate * 2
      val w = bits / 8
      val fmt = new AudioFormat(rate.toFloat, bits, 1, true, false)
      val pcm = new Array[Byte](n * w)
      for (i <- rate until n) {
        val s = math.sin(2 * math.Pi * 440 * (i - rate) / rate) * 0.8
        val v = (s * ((1L << (bits - 1)) - 1)).toLong
        for (j <- 0 until w) pcm(w * i + j) = ((v >> (8 * j)) & 0xff).toByte
      }
      val in = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    def envelope(b: Array[Byte]): Array[Float] = extractFeatures(
      spark.createDataset(Seq(MediaRecord(1L, "audio", b, "mem://x.wav"))),
      dim = 8, MediaDecoder.Audio).collect().head.feature
    val f16 = envelope(wav(16))
    val f24 = envelope(wav(24))
    assert(f24.take(4).forall(_ < 0.01), s"silent half must be ~0: ${f24.toSeq}")
    assert(f24.drop(4).forall(v => v > 0.4 && v < 0.6), s"tone half: ${f24.toSeq}")
    f16.zip(f24).foreach { case (a, b) =>
      assert(math.abs(a - b) < 0.02, s"${f16.toSeq} vs ${f24.toSeq}")
    }
  }

  test("ImageIO codec decodes animated GIF frames as standalone images") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // a real 5-frame animated GIF, each frame a distinct uniform gray
    def grayOf(i: Int) = { val g = i * 50; (0xff << 24) | (g << 16) | (g << 8) | g }
    val gif = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (i <- 0 until 5) {
        val img = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(grayOf(i)))
        g.fillRect(0, 0, 16, 12)
        g.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      ios.close()
      writer.dispose()
      out.toByteArray
    }
    assert(new String(gif.take(6), "US-ASCII").startsWith("GIF"),
      "fixture must be a real GIF container")
    val rec = MediaRecord(7L, "video", gif, "mem://anim.gif")
    // metadata reports the true frame count
    val meta = decodeMeta(spark.createDataset(Seq(rec)), MediaDecoder.ImageIO)
      .collect().head
    assert(meta.width == 16 && meta.height == 12 && meta.n_frames == 5, s"got $meta")
    // stride-2 sampling through the distributed path: frames 0, 2, 4,
    // each a self-contained decodable image with the right pixels
    val frames = sampleFrames(spark.createDataset(Seq(rec)), everyNth = 2,
      MediaDecoder.ImageIO).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.bytes))
      assert(img.getWidth == 16 && img.getHeight == 12)
      assert(img.getRGB(3, 3) == grayOf(f.frame_idx),
        s"frame ${f.frame_idx} carries the wrong raster")
    }
    // a still PNG keeps the single-frame contract
    val png = {
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val still = sampleFrames(
      spark.createDataset(Seq(MediaRecord(8L, "image", png, "mem://s.png"))),
      everyNth = 1, MediaDecoder.ImageIO).collect()
    assert(still.length == 1 && still.head.frame_idx == 0)
  }

  test("optimized GIF delta frames composite onto the full logical screen") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // frame 0: full 16x12 dark base; frame 1: a 4x4 white PATCH whose
    // ImageDescriptor places it at (6, 3) — the optimized-GIF layout
    // where frames after the first encode only the changed rect.
    // Emitting reader.read(1) raw would hand consumers a 4x4 image;
    // the composited frame must be the full screen with the patch in
    // place and the base preserved around it.
    val gif = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      def writeFrame(img: BufferedImage, x: Int, y: Int): Unit = {
        val spec = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
        val md = writer.getDefaultImageMetadata(spec, null)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = md.getAsTree(fmt)
        val kids = tree.getChildNodes
        var j = 0
        while (j < kids.getLength) {
          val n = kids.item(j)
          if (n.getNodeName == "ImageDescriptor") {
            n.getAttributes.getNamedItem("imageLeftPosition").setNodeValue(x.toString)
            n.getAttributes.getNamedItem("imageTopPosition").setNodeValue(y.toString)
          }
          j += 1
        }
        md.setFromTree(fmt, tree)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, md), null)
      }
      val base = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
      val g0 = base.createGraphics()
      g0.setColor(new java.awt.Color(40, 40, 40)); g0.fillRect(0, 0, 16, 12)
      g0.dispose()
      val patch = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
      val g1 = patch.createGraphics()
      g1.setColor(java.awt.Color.WHITE); g1.fillRect(0, 0, 4, 4)
      g1.dispose()
      writeFrame(base, 0, 0)
      writeFrame(patch, 6, 3)
      writer.endWriteSequence(); ios.close(); writer.dispose()
      out.toByteArray
    }
    val frames = sampleFrames(
      spark.createDataset(Seq(MediaRecord(9L, "video", gif, "mem://delta.gif"))),
      everyNth = 1, MediaDecoder.ImageIO).collect().sortBy(_.frame_idx)
    assert(frames.length == 2)
    val f1 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frames(1).bytes))
    assert(f1.getWidth == 16 && f1.getHeight == 12,
      s"delta frame must composite to the logical screen, got ${f1.getWidth}x${f1.getHeight}")
    def lum(rgb: Int) = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
    assert(lum(f1.getRGB(7, 4)) > 600, "patch pixels must be white")
    assert(lum(f1.getRGB(1, 1)) < 200, "base pixels outside the patch must survive")
  }
  test("perceptual hash: re-encode-invariant, perturbation-tolerant, block-LSH paired") {
    import java.awt.image.BufferedImage
    val spark2 = spark
    import spark2.implicits._
    def gradient(seed: Int): BufferedImage = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = (x * 8 + y * (seed % 5 + 1) * 13) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def enc(img: BufferedImage, fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val a = gradient(1)
    // a near-copy: flip a handful of pixels
    val b = gradient(1)
    for (i <- 0 until 4) b.setRGB(i, 0, 0xffffff)
    val c = gradient(3) // genuinely different structure

    // identical pixels through different containers hash identically
    val hPng = Multimodal.averageHash(enc(a, "png")).get
    val hBmp = Multimodal.averageHash(enc(a, "bmp")).get
    assert(hPng == hBmp, "same raster, different codec must agree")
    // perturbation stays within a few bits; different content far
    val hB = Multimodal.averageHash(enc(b, "png")).get
    val hC = Multimodal.averageHash(enc(c, "png")).get
    assert(java.lang.Long.bitCount(hPng ^ hB) <= 3,
      s"near-copy drifted ${java.lang.Long.bitCount(hPng ^ hB)} bits")
    assert(java.lang.Long.bitCount(hPng ^ hC) > 3,
      s"different image too close: ${java.lang.Long.bitCount(hPng ^ hC)}")
    assert(Multimodal.averageHash(Array[Byte](1, 2, 3)).isEmpty)

    // end to end: the block-LSH pairing finds exactly the near pair
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", enc(a, "png"), "mem://1"),
      Multimodal.MediaRecord(2L, "image", enc(b, "bmp"), "mem://2"),
      Multimodal.MediaRecord(3L, "image", enc(c, "png"), "mem://3"),
      Multimodal.MediaRecord(4L, "image", Array[Byte](9, 9), "mem://4"),
    ).toDS()
    val hashes = Multimodal.imageHashes(media)
    assert(hashes.count() == 3L, "undecodable payloads drop")
    val pairs = Multimodal.imageNearDupPairs(hashes)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
  }
  test("DCT hash: container/offset invariant, ramp-robust where aHash drifts, paired") {
    import java.awt.image.BufferedImage
    val spark2 = spark
    import spark2.implicits._
    def textured(f: (Int, Int) => Int): BufferedImage = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = math.max(0, math.min(255, f(x, y)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def enc(img: BufferedImage, fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    // synthesize FROM a deterministic pseudo-random 8×8 spectrum, so
    // every low-frequency coefficient has a real margin from the
    // median (a photo-like spectrum; a pure high-frequency texture
    // would leave the whole comparison set in noise)
    def base(seed: Int)(x: Int, y: Int): Int = {
      var s = 128.0
      for (u <- 0 until 8; v <- 0 until 8; if u != 0 || v != 0) {
        val m = (u * 31 + v * 17 + seed * 29) % 22
        val amp = (if ((u * 7 + v * 13 + seed) % 2 == 0) 1 else -1) * (4 + m) / 8.0
        s += amp * math.cos((2 * x + 1) * u * math.Pi / 64.0) *
          math.cos((2 * y + 1) * v * math.Pi / 64.0)
      }
      s.toInt
    }
    val a = textured(base(0))

    // identical raster through different containers agrees
    val hPng = Multimodal.dctHash(enc(a, "png")).get
    val hBmp = Multimodal.dctHash(enc(a, "bmp")).get
    assert(hPng == hBmp, "same raster, different codec must agree")
    assert((hPng & 1L) == 0L, "DC slot bit must stay 0")

    // constant image: all-zero AC, strict > ⇒ hash 0
    assert(Multimodal.dctHash(enc(textured((_, _) => 128), "png")).get == 0L)

    // exact invariance under a global brightness offset (pure DC move)
    val hOff = Multimodal.dctHash(enc(textured((x, y) => base(0)(x, y) + 30), "png")).get
    assert(hOff == hPng, "brightness offset must not touch the AC comparisons")

    // an illumination RAMP (lighting change): pHash stays near, aHash drifts —
    // the ramp is low-frequency energy in one or two coefficients for the
    // DCT, but it drags half the cells across aHash's global-mean threshold
    val rampPng = enc(textured((x, y) => base(0)(x, y) + x * 60 / 31), "png")
    val dP = java.lang.Long.bitCount(hPng ^ Multimodal.dctHash(rampPng).get)
    val dA = java.lang.Long.bitCount(
      Multimodal.averageHash(enc(a, "png")).get ^ Multimodal.averageHash(rampPng).get)
    assert(dP <= 4, s"pHash drifted $dP bits under the illumination ramp")
    assert(dA > dP && dA >= 12, s"aHash should drift wide (got $dA vs pHash $dP)")

    // undecodable payloads yield None
    assert(Multimodal.dctHash(Array[Byte](1, 2, 3)).isEmpty)

    // end to end: a near-copy pairs, different structure does not
    val b = textured(base(0))
    for (i <- 0 until 4) b.setRGB(i, 0, 0xffffff)
    val c = textured(base(3))
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", enc(a, "png"), "mem://1"),
      Multimodal.MediaRecord(2L, "image", enc(b, "bmp"), "mem://2"),
      Multimodal.MediaRecord(3L, "image", enc(c, "png"), "mem://3"),
      Multimodal.MediaRecord(4L, "image", Array[Byte](9, 9), "mem://4"),
    ).toDS()
    val hashes = Multimodal.imageDctHashes(media)
    assert(hashes.count() == 3L, "undecodable payloads drop")
    val pairs = Multimodal.imageDctNearDupPairs(hashes)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
  }

  test("audio envelope hash: bit-depth invariant shape, tone-position sensitive, paired") {
    import javax.sound.sampled._
    val spark2 = spark
    import spark2.implicits._
    def toneWav(toneFrom: Double, toneTo: Double, bits: Int = 16): Array[Byte] = {
      val rate = 8000; val n = rate * 2
      val fmt = new AudioFormat(rate.toFloat, bits, 1, bits == 16, false)
      val fb = bits / 8
      val pcm = new Array[Byte](n * fb)
      if (bits == 8) java.util.Arrays.fill(pcm, 128.toByte)
      for (i <- 0 until n) {
        val t = i.toDouble / n
        val s = if (t >= toneFrom && t < toneTo)
          math.sin(2 * math.Pi * 440 * i / rate) * 0.8 else 0.0
        if (bits == 16) {
          val v = (s * 32767).toInt
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        } else pcm(i) = ((s * 127).toInt + 128).toByte
      }
      val in = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val h16 = Multimodal.audioEnvelopeHash(toneWav(0.5, 1.0, 16)).get
    val h8 = Multimodal.audioEnvelopeHash(toneWav(0.5, 1.0, 8)).get
    // same envelope SHAPE through different bit depths: within a few
    // windows of quantization wobble at the tone boundary
    assert(java.lang.Long.bitCount(h16 ^ h8) <= 3,
      s"bit-depth drift ${java.lang.Long.bitCount(h16 ^ h8)}")
    // tone in the FIRST half is a different envelope
    val hEarly = Multimodal.audioEnvelopeHash(toneWav(0.0, 0.5, 16)).get
    assert(java.lang.Long.bitCount(h16 ^ hEarly) > 3)
    assert(Multimodal.audioEnvelopeHash(Array[Byte](1, 2, 3)).isEmpty)

    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", toneWav(0.5, 1.0, 16), "mem://1"),
      Multimodal.MediaRecord(2L, "audio", toneWav(0.5, 1.0, 8), "mem://2"),
      Multimodal.MediaRecord(3L, "audio", toneWav(0.0, 0.5, 16), "mem://3"),
    ).toDS()
    val pairs = graft.llm.Dedup.hammingNearDupPairs(
        Multimodal.audioHashes(media), "media_id", "ahash", bits = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
  }
  test("landmark fingerprints survive the time shift that defeats the envelope hash") {
    import javax.sound.sampled._
    val spark2 = spark
    import spark2.implicits._
    val rate = 8000
    val hop = 256
    // an 8-burst "melody": distinct frequencies, 0.25 s each
    def melodyWav(freqs: Seq[Double], silencePrefixSamples: Int): Array[Byte] = {
      val burst = rate / 4
      val n = silencePrefixSamples + freqs.length * burst
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val j = i - silencePrefixSamples
        val v =
          if (j < 0) 0
          else {
            val f = freqs(j / burst)
            (math.sin(2 * math.Pi * f * j / rate) * 0.8 * 32767).toInt
          }
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
      val in = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val tune = Seq(500.0, 700.0, 900.0, 1100.0, 600.0, 800.0, 1000.0, 1200.0)
    val other = Seq(1400.0, 1700.0, 2100.0, 2500.0, 1500.0, 1900.0, 2300.0, 2700.0)
    val orig = melodyWav(tune, 0)
    val shifted = melodyWav(tune, hop * 16) // +0.5 s of silence, hop-aligned
    val unrelated = melodyWav(other, 0)

    // the envelope hash is position-coded: the shift rewrites it
    val hOrig = Multimodal.audioEnvelopeHash(orig).get
    val hShift = Multimodal.audioEnvelopeHash(shifted).get
    assert(java.lang.Long.bitCount(hOrig ^ hShift) > 3,
      "fixture drift: the envelope hash should be defeated by the shift")

    // landmarks are (f1, f2, Δt) — absolute-position-free
    val lOrig = Multimodal.audioLandmarks(orig).get.toSet
    val lShift = Multimodal.audioLandmarks(shifted).get.toSet
    val lOther = Multimodal.audioLandmarks(unrelated).get.toSet
    assert(lOrig.nonEmpty && lShift.nonEmpty && lOther.nonEmpty)
    val contShift = lOrig.intersect(lShift).size.toDouble / math.min(lOrig.size, lShift.size)
    val contOther = lOrig.intersect(lOther).size.toDouble / math.min(lOrig.size, lOther.size)
    assert(contShift >= 0.6, s"shifted containment $contShift")
    assert(contOther < 0.2, s"unrelated containment $contOther")
    assert(Multimodal.audioLandmarks(Array[Byte](1, 2, 3)).isEmpty)

    // distributed pairing: shared-landmark equi-join, never all-pairs
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", orig, "mem://1"),
      Multimodal.MediaRecord(2L, "audio", shifted, "mem://2"),
      Multimodal.MediaRecord(3L, "audio", unrelated, "mem://3"),
    ).toDS()
    val pairs = Multimodal.audioNearDupPairsByLandmarks(
        Multimodal.audioLandmarkTable(media))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
  }

  test("video near-dup: shared-frame jaccard pairs re-cuts, ignores unrelated clips") {
    import java.awt.image.BufferedImage
    val spark2 = spark
    import spark2.implicits._
    def frame(seed: Int): BufferedImage = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = (x * (seed % 7 + 2) + y * (seed % 5 + 1) * 11) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def gif(frames: Seq[BufferedImage]): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f => writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence(); ios.close(); writer.dispose()
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", gif((1 to 5).map(frame)), "mem://a"),
      Multimodal.MediaRecord(2L, "video", gif((1 to 4).map(frame) :+ frame(6)), "mem://b"),
      Multimodal.MediaRecord(3L, "video", gif((7 to 9).map(frame)), "mem://c"),
    ).toDS()
    val fh = Multimodal.videoFrameHashes(media)
    assert(fh.count() == 13L, "5 + 5 + 3 frames must hash")
    val pairs = Multimodal.videoNearDupPairs(fh, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length == 1 && pairs.head._1 == 1L && pairs.head._2 == 2L,
      pairs.mkString(","))
    // 4 shared frames of 6 distinct: jaccard 2/3
    assert(math.abs(pairs.head._3 - 4.0 / 6.0) < 1e-12, pairs.head._3.toString)
  }

  test("bilinear resize: deterministic, exact dims, pHash survives downscale") {
    import java.awt.image.BufferedImage
    val spark2 = spark
    import spark2.implicits._
    def textured(seed: Int, n: Int): BufferedImage = {
      val img = new BufferedImage(n, n, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until n; x <- 0 until n) {
        var s = 128.0
        for (u <- 0 until 8; v <- 0 until 8; if u != 0 || v != 0) {
          val m = (u * 31 + v * 17 + seed * 29) % 22
          val amp = (if ((u * 7 + v * 13 + seed) % 2 == 0) 1 else -1) * (4 + m) / 8.0
          s += amp * math.cos((2 * x + 1) * u * math.Pi / (2.0 * n)) *
            math.cos((2 * y + 1) * v * math.Pi / (2.0 * n))
        }
        val p = math.max(0, math.min(255, s.toInt))
        img.setRGB(x, y, (p << 16) | (p << 8) | p)
      }
      img
    }
    def enc(img: BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val big = enc(textured(0, 64))
    val down = Multimodal.resizeBilinear(big, 32, 32).get
    // exact output dims; deterministic bytes
    val meta = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(down))
    assert(meta.getWidth == 32 && meta.getHeight == 32)
    assert(java.util.Arrays.equals(down,
      Multimodal.resizeBilinear(big, 32, 32).get))
    // coarse spatial frequencies survive resampling: the pHash of the
    // downscaled copy stays near, while a different spectrum sits far
    val h0 = Multimodal.dctHash(big).get
    val hD = Multimodal.dctHash(down).get
    val other = Multimodal.dctHash(enc(textured(3, 32))).get
    val near = java.lang.Long.bitCount(h0 ^ hD)
    val far = java.lang.Long.bitCount(h0 ^ other)
    assert(near <= 10, s"downscale moved pHash $near bits")
    assert(far >= 24, s"different spectrum must stay far, got $far")
    // frame form drops undecodables and keeps ids
    val ds = Seq(
      Multimodal.MediaRecord(1L, "image", big, "mem://big"),
      Multimodal.MediaRecord(2L, "image", Array[Byte](1, 2, 3), "mem://junk"),
    ).toDS()
    val resized = Multimodal.resizeImages(ds, 16, 16).collect()
    assert(resized.map(_.media_id).toSeq == Seq(1L))
    // upscale works too (interpolated, no crash, right dims)
    val up = Multimodal.resizeBilinear(enc(textured(0, 16)), 48, 48).get
    val upMeta = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(up))
    assert(upMeta.getWidth == 48 && upMeta.getHeight == 48)
    intercept[IllegalArgumentException] {
      Multimodal.resizeBilinear(big, 0, 10)
    }
  }
}
