package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * media as opaque `binary` columns + typed metadata, with
  * decode / feature-extraction / frame-sampling as per-partition
  * operators.
  *
  * The Spark-side plumbing here is real and tested — schemas, typed
  * Datasets, `mapPartitions` batch shape, size-aware repartitioning —
  * while the codec itself is a [[MediaDecoder]] trait: this container
  * has no image/audio libraries, so the default implementation is
  * [[MediaDecoder.Stub]], a clearly-marked deterministic fake that
  * derives every output purely from the input bytes. Swapping in a
  * real JNI/JVM codec changes ONE injection point and none of the
  * distributed shape.
  *
  * Why `mapPartitions` (the documented last resort): codecs are
  * imperative byte-array libraries with per-call setup cost —
  * per-partition iteration amortizes codec init across a partition's
  * records, which is exactly the case the escape hatch exists for.
  * Everything around it (filters, metadata projections, joins back to
  * text/embedding tables) stays declarative.
  */
object Multimodal {

  /** One media object: id, modality kind, raw bytes, source URI. */
  final case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      uri: String,
  )

  /** Decoded metadata (image dims / audio samples / frame count — the
    * union of modality headers; unused fields are -1). */
  final case class MediaMeta(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      channels: Int,
      sample_rate: Int,
      n_frames: Int,
      byte_len: Long,
  )

  final case class MediaFeature(media_id: Long, feature: Array[Float])

  final case class Frame(media_id: Long, frame_idx: Int, bytes: Array[Byte])

  /** The codec seam. Implementations MUST be deterministic per input
    * bytes (replay/retry safety: a Spark task can run twice). */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): MediaMeta
    def features(r: MediaRecord, dim: Int): Array[Float]
    def sampleFrames(r: MediaRecord, everyNth: Int): Iterator[Frame]
  }

  object MediaDecoder {

    /** STUB CODEC — deterministic fake for environments without media
      * libraries. Header fields are parsed from the first bytes of the
      * payload (big-endian int32 pairs), features are a seeded hash
      * fold of the bytes, frames are fixed-size slices. Every value is
      * a pure function of the input, so tests exercise the full
      * distributed path with exact assertions. */
    object Stub extends MediaDecoder {
      private def be32(b: Array[Byte], off: Int): Int =
        if (b.length < off + 4) -1
        else ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
          ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

      def decode(r: MediaRecord): MediaMeta = r.kind match {
        case "image" =>
          MediaMeta(r.media_id, r.kind, be32(r.bytes, 0), be32(r.bytes, 4),
            3, -1, 1, r.bytes.length.toLong)
        case "audio" =>
          MediaMeta(r.media_id, r.kind, -1, -1, 1, be32(r.bytes, 0),
            -1, r.bytes.length.toLong)
        case _ => // video: dims + frame count
          MediaMeta(r.media_id, r.kind, be32(r.bytes, 0), be32(r.bytes, 4),
            3, -1, be32(r.bytes, 8), r.bytes.length.toLong)
      }

      def features(r: MediaRecord, dim: Int): Array[Float] = {
        // splitmix over (byte-fold, index): deterministic pseudo-embedding
        val fold = r.bytes.foldLeft(1125899906842597L)((h, b) => 31 * h + b)
        Array.tabulate(dim) { i =>
          var z = fold + i.toLong * 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          ((z ^ (z >>> 31)).toDouble / Long.MaxValue).toFloat
        }
      }

      def sampleFrames(r: MediaRecord, everyNth: Int): Iterator[Frame] = {
        val meta = decode(r)
        val header = 12
        val n = math.max(meta.n_frames, 0)
        val body = r.bytes.drop(header)
        val frameSize = if (n > 0) math.max(body.length / n, 1) else 0
        (0 until n by math.max(everyNth, 1)).iterator.map { i =>
          Frame(r.media_id, i, body.slice(i * frameSize, (i + 1) * frameSize))
        }
      }
    }

    /** REAL minimal codec — pure-JVM decoders for two actual on-disk
      * image formats, proving the [[MediaDecoder]] seam against real
      * bytes without external libraries:
      *
      *   - BMP (Windows bitmap): little-endian int32 width/height at
      *     byte offsets 18/22 of the BITMAPINFOHEADER, bit depth at 28.
      *   - PGM (netpbm P5): ASCII "P5 <w> <h> <maxval>" header before
      *     binary payload.
      *
      * `features` averages raw payload bytes into `dim` buckets (a
      * real, if crude, content signature); frame sampling treats a
      * still image as its own single frame. Anything unrecognized
      * falls back to header-absent metadata (-1 dims) rather than
      * throwing — decode errors are data, not crashes, same as the
      * validation philosophy. */
    object Minimal extends MediaDecoder {
      private def le32(b: Array[Byte], off: Int): Int =
        if (b.length < off + 4) -1
        else (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
          ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

      private def pgmHeader(b: Array[Byte]): Option[(Int, Int)] = {
        if (b.length < 2 || b(0) != 'P' || b(1) != '5') return None
        val s = new String(b, 0, math.min(b.length, 64), java.nio.charset.StandardCharsets.US_ASCII)
        val nums = "\\d+".r.findAllIn(s.drop(2)).take(2).toSeq
        if (nums.length == 2) Some((nums(0).toInt, nums(1).toInt)) else None
      }

      def decode(r: MediaRecord): MediaMeta = {
        val b = r.bytes
        if (b.length >= 30 && b(0) == 'B' && b(1) == 'M')
          MediaMeta(r.media_id, "image", le32(b, 18), le32(b, 22),
            math.max((b(28) & 0xff) / 8, 1), -1, 1, b.length.toLong)
        else pgmHeader(b) match {
          case Some((w, h)) =>
            MediaMeta(r.media_id, "image", w, h, 1, -1, 1, b.length.toLong)
          case None =>
            MediaMeta(r.media_id, r.kind, -1, -1, -1, -1, -1, b.length.toLong)
        }
      }

      def features(r: MediaRecord, dim: Int): Array[Float] = {
        val b = r.bytes
        val out = new Array[Float](dim)
        val cnt = new Array[Int](dim)
        var i = 0
        while (i < b.length) {
          val k = (i * dim) / math.max(b.length, 1)
          out(k) += (b(i) & 0xff) / 255.0f
          cnt(k) += 1
          i += 1
        }
        var j = 0
        while (j < dim) { if (cnt(j) > 0) out(j) /= cnt(j); j += 1 }
        out
      }

      def sampleFrames(r: MediaRecord, everyNth: Int): Iterator[Frame] =
        Iterator.single(Frame(r.media_id, 0, r.bytes))
    }

    /** FULL-FORMAT image codec via `javax.imageio` — the JDK's own
      * decoder registry (PNG, JPEG, GIF, BMP, WBMP out of the box), so
      * genuine third-party image formats decode with ZERO external
      * dependencies. Unrecognized payloads fall through to [[Minimal]]
      * (which adds PGM and the errors-are-data -1 fallback) — decode
      * failure never throws.
      *
      * `ImageIO.read` is threadsafe per call and needs no per-codec
      * init, but disk-caching of intermediate streams is off
      * (`setUseCache(false)`) because executor tasks shouldn't touch
      * local tmp for an in-heap byte array. Features are the mean
      * LUMINANCE per horizontal pixel bucket — a real content
      * signature over decoded pixels, not payload bytes, so the same
      * image re-encoded (PNG vs BMP) lands on nearby vectors. */
    object ImageIO extends MediaDecoder {
      javax.imageio.ImageIO.setUseCache(false)

      private def readImage(b: Array[Byte]): Option[java.awt.image.BufferedImage] =
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
        catch { case _: Exception => None }

      /** Run `use` with the registry reader for these bytes (None when
        * no installed reader recognizes the format). The reader/stream
        * pair is disposed either way — ImageReaders hold native-ish
        * buffers a long-lived executor must not leak. */
      private def withReader[A](b: Array[Byte])(
          use: javax.imageio.ImageReader => A): Option[A] = {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); return None }
        val reader = readers.next()
        try {
          reader.setInput(iis)
          Some(use(reader))
        } catch { case _: Exception => None }
        finally { reader.dispose(); iis.close() }
      }

      /** Frame's placement and disposal from the GIF image metadata
        * tree; (0, 0, "none") for non-GIF formats or absent nodes. */
      private def frameInfo(
          reader: javax.imageio.ImageReader, i: Int): (Int, Int, String) =
        try {
          val fmt = "javax_imageio_gif_image_1.0"
          val md = reader.getImageMetadata(i)
          if (!md.getMetadataFormatNames.contains(fmt)) return (0, 0, "none")
          val kids = md.getAsTree(fmt).getChildNodes
          var x = 0; var y = 0; var disp = "none"
          var j = 0
          while (j < kids.getLength) {
            val n = kids.item(j)
            n.getNodeName match {
              case "ImageDescriptor" =>
                val a = n.getAttributes
                x = a.getNamedItem("imageLeftPosition").getNodeValue.toInt
                y = a.getNamedItem("imageTopPosition").getNodeValue.toInt
              case "GraphicControlExtension" =>
                disp = n.getAttributes.getNamedItem("disposalMethod").getNodeValue
              case _ => ()
            }
            j += 1
          }
          (x, y, disp)
        } catch { case _: Exception => (0, 0, "none") }

      /** Logical screen dims from the GIF stream metadata; None for
        * other formats (single-frame: the frame IS the screen). */
      private def logicalScreen(
          reader: javax.imageio.ImageReader): Option[(Int, Int)] =
        try {
          val fmt = "javax_imageio_gif_stream_1.0"
          val md = reader.getStreamMetadata
          if (md == null || !md.getMetadataFormatNames.contains(fmt)) return None
          val kids = md.getAsTree(fmt).getChildNodes
          var j = 0
          while (j < kids.getLength) {
            val n = kids.item(j)
            if (n.getNodeName == "LogicalScreenDescriptor") {
              val a = n.getAttributes
              return Some((
                a.getNamedItem("logicalScreenWidth").getNodeValue.toInt,
                a.getNamedItem("logicalScreenHeight").getNodeValue.toInt))
            }
            j += 1
          }
          None
        } catch { case _: Exception => None }

      def decode(r: MediaRecord): MediaMeta = withReader(r.bytes) { reader =>
        // ONE reader pass: dims and frame count come from the headers
        // (no raster decode — metadata is the hot path at corpus
        // scale), channels from the reader's image type
        val it = reader.getImageTypes(0)
        val channels =
          if (it.hasNext) it.next().getColorModel.getNumComponents else 3
        MediaMeta(r.media_id, "image", reader.getWidth(0), reader.getHeight(0),
          channels, -1, math.max(reader.getNumImages(true), 1),
          r.bytes.length.toLong)
      }.getOrElse(Minimal.decode(r))

      def features(r: MediaRecord, dim: Int): Array[Float] = readImage(r.bytes) match {
        case Some(img) =>
          val w = img.getWidth; val h = img.getHeight
          val out = new Array[Float](dim)
          val cnt = new Array[Int](dim)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              val k = (x * dim) / w
              out(k) += lum / 255.0f
              cnt(k) += 1
              x += 1
            }
            y += 1
          }
          var j = 0
          while (j < dim) { if (cnt(j) > 0) out(j) /= cnt(j); j += 1 }
          out
        case None => Minimal.features(r, dim)
      }

      /** Multi-frame decode for animated containers (GIF is the one
        * the JDK registry reads): every Nth frame emitted as a
        * standalone PNG of the full logical screen — downstream
        * consumers get self-contained image payloads, not raw rasters
        * with out-of-band metadata. Real-world optimized GIFs store
        * frames after the first as DELTA RECTANGLES with an offset and
        * a disposal method, so frames COMPOSITE onto a persistent
        * canvas (cumulative draw; restore-to-background clears the
        * frame's rect; restore-to-previous rolls the canvas back) —
        * emitting `reader.read(i)` raw would hand consumers
        * wrong-sized partial images. Every frame composites even when
        * strided, because frame i's pixels depend on 0..i−1.
        *
        * Still images (or unrecognized bytes) degrade to the
        * single-frame identity the interface always had. The frame
        * LIST is an eager per-record decode (a GIF's frames live in
        * one payload — there is no partition-spanning video here);
        * the flatMap fan-out to rows happens in
        * [[Multimodal.sampleFrames]] exactly as before. */
      def sampleFrames(r: MediaRecord, everyNth: Int): Iterator[Frame] = {
        import java.awt.image.BufferedImage
        def png(img: BufferedImage): Array[Byte] = {
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          out.toByteArray
        }
        def copyOf(img: BufferedImage): BufferedImage = {
          val c = new BufferedImage(img.getWidth, img.getHeight, img.getType)
          val g = c.createGraphics()
          g.drawImage(img, 0, 0, null)
          g.dispose()
          c
        }
        val frames = withReader(r.bytes) { reader =>
          val n = reader.getNumImages(true)
          val (cw, ch) = logicalScreen(reader)
            .getOrElse((reader.getWidth(0), reader.getHeight(0)))
          val canvas = new BufferedImage(
            math.max(cw, 1), math.max(ch, 1), BufferedImage.TYPE_INT_ARGB)
          val g = canvas.createGraphics()
          val stride = math.max(everyNth, 1)
          val out = Seq.newBuilder[Frame]
          var i = 0
          while (i < n) {
            val img = reader.read(i)
            val (x, y, disp) = frameInfo(reader, i)
            val saved = if (disp == "restoreToPrevious") copyOf(canvas) else null
            g.drawImage(img, x, y, null)
            if (i % stride == 0) out += Frame(r.media_id, i, png(canvas))
            disp match {
              case "restoreToBackgroundColor" =>
                val c = g.getComposite
                g.setComposite(java.awt.AlphaComposite.Clear)
                g.fillRect(x, y, img.getWidth, img.getHeight)
                g.setComposite(c)
              case "restoreToPrevious" =>
                val c = g.getComposite
                g.setComposite(java.awt.AlphaComposite.Src)
                g.drawImage(saved, 0, 0, null)
                g.setComposite(c)
              case _ => ()
            }
            i += 1
          }
          g.dispose()
          out.result()
        }
        frames match {
          case Some(fs) if fs.nonEmpty => fs.iterator
          case _ => Iterator.single(Frame(r.media_id, 0, r.bytes))
        }
      }
    }

    /** REAL audio codec via the JDK's `javax.sound.sampled` — the
      * audio twin of [[ImageIO]], closing the "audio is metadata-only"
      * gap without external libraries: WAV/AU/AIFF containers parse to
      * their true format (channels, sample rate, frame count) and the
      * PCM payload decodes to actual samples. Features are the mean
      * ABSOLUTE AMPLITUDE per time bucket over decoded samples
      * (normalized to [0, 1]) — a real envelope signature, so the same
      * signal re-encoded at a different bit depth or endianness lands
      * on nearby vectors, exactly like the luminance buckets do for
      * PNG-vs-BMP. Frames are 1-second PCM windows (every Nth kept).
      * Non-audio / unparseable bytes fall back to [[Stub]] semantics,
      * keeping the decoder total. */
    object Audio extends MediaDecoder {
      private def stream(b: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] =
        try Option(javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(b)))
        catch { case _: Exception => None }

      /** [[samples]] understands linear PCM only — signed at
        * 8/16/24/32 bits, unsigned at 8 — so everything else routes
        * through the JVM's codec chain to 16-bit signed; None if no
        * conversion path exists (→ Stub fallback, deterministic
        * rather than silently wrong). AU files commonly carry
        * ULAW/ALAW (8-bit, NON-linear — decoding them as linear PCM
        * yields silently wrong envelopes); those convert fine.
        *
        * 16-bit UNSIGNED is special-cased to an ENDIAN-FLIPPED signed
        * target: OpenJDK's PCMtoPCMCodec silently passes bytes
        * through unchanged on a same-endianness 16-bit sign switch
        * (verified empirically on JDK 17 — `isConversionSupported`
        * says true, the returned stream converts nothing), while the
        * sign+endian-swap combination actually converts. samples()
        * reads either endianness, so the flipped output costs
        * nothing. Without this, a 16-bit unsigned payload decodes
        * every sample off by full scale — the exact silent-corruption
        * class this router exists to prevent.
        *
        * `private[llm]` so the spec can pin the routing table
        * directly — synthesizing a container that PARSES to e.g.
        * 16-bit unsigned is format-dependent, the routing contract is
        * not. */
      private[llm] def toPcm(
          in: javax.sound.sampled.AudioInputStream
      ): Option[javax.sound.sampled.AudioInputStream] = {
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        val f = in.getFormat
        val enc = f.getEncoding
        val bits = f.getSampleSizeInBits
        if ((enc == AudioFormat.Encoding.PCM_SIGNED &&
            (bits == 8 || bits == 16 || bits == 24 || bits == 32)) ||
          (enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)) Some(in)
        else try {
          val flipEndian =
            enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 16
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
            f.getSampleRate, if (flipEndian) !f.isBigEndian else false)
          Some(AudioSystem.getAudioInputStream(target, in))
        } catch { case _: Exception => None }
      }

      private def readAll(in: javax.sound.sampled.AudioInputStream): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      }

      /** Decoded samples in [-1, 1]: signed PCM at 16/24/32 bits
        * (either endianness) or 8-bit signed/unsigned — the WAV/AIFF
        * encodings in the wild, studio depths included. [[toPcm]]
        * guarantees nothing else reaches here. */
      private def samples(
          bytes: Array[Byte], f: javax.sound.sampled.AudioFormat): Array[Float] = {
        val enc = f.getEncoding
        val bits = f.getSampleSizeInBits
        if (bits == 16 || bits == 24 || bits == 32) {
          val w = bits / 8
          val n = bytes.length / w
          val out = new Array[Float](n)
          val scale = (1L << (bits - 1)).toFloat
          var i = 0
          while (i < n) {
            // sign-extend from the MSB, then fold in the lower bytes
            var v = 0
            var j = 0
            while (j < w) {
              val b = bytes(i * w + (if (f.isBigEndian) j else w - 1 - j))
              v = if (j == 0) b.toInt else (v << 8) | (b & 0xff)
              j += 1
            }
            out(i) = v / scale
            i += 1
          }
          out
        } else {
          val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          bytes.map(b => if (signed) b / 128.0f else ((b & 0xff) - 128) / 128.0f)
        }
      }

      def decode(r: MediaRecord): MediaMeta = stream(r.bytes) match {
        case Some(in) =>
          try {
            val f = in.getFormat
            MediaMeta(r.media_id, "audio", -1, -1, f.getChannels,
              f.getSampleRate.toInt, in.getFrameLength.toInt, r.bytes.length.toLong)
          } finally in.close()
        case None => Stub.decode(r)
      }

      def features(r: MediaRecord, dim: Int): Array[Float] = stream(r.bytes).flatMap(toPcm) match {
        case Some(in) =>
          try {
            val f = in.getFormat
            val s = samples(readAll(in), f)
            val frames = math.max(s.length / math.max(f.getChannels, 1), 1)
            val out = new Array[Float](dim)
            val cnt = new Array[Int](dim)
            var i = 0
            while (i < s.length) {
              val k = math.min((i / math.max(f.getChannels, 1)) * dim / frames, dim - 1)
              out(k) += math.abs(s(i))
              cnt(k) += 1
              i += 1
            }
            var j = 0
            while (j < dim) { if (cnt(j) > 0) out(j) /= cnt(j); j += 1 }
            out
          } finally in.close()
        case None => Stub.features(r, dim)
      }

      /** Channel-averaged mono samples in [-1, 1]; None when the JVM
        * can't parse the container (no Stub fallback — callers that
        * need a perceptual signal must know decode failed). */
      private[llm] def monoSamples(b: Array[Byte]): Option[Array[Float]] =
        stream(b).flatMap(toPcm).map { in =>
          try {
            val f = in.getFormat
            val s = samples(readAll(in), f)
            val ch = math.max(f.getChannels, 1)
            if (ch == 1) s
            else {
              val n = s.length / ch
              val out = new Array[Float](n)
              var i = 0
              while (i < n) {
                var c = 0; var acc = 0f
                while (c < ch) { acc += s(i * ch + c); c += 1 }
                out(i) = acc / ch
                i += 1
              }
              out
            }
          } finally in.close()
        }

      def sampleFrames(r: MediaRecord, everyNth: Int): Iterator[Frame] = stream(r.bytes).flatMap(toPcm) match {
        case Some(in) =>
          try {
            val f = in.getFormat
            val bytes = readAll(in)
            val windowBytes = math.max(f.getSampleRate.toInt, 1) * math.max(f.getFrameSize, 1)
            val n = math.max((bytes.length + windowBytes - 1) / windowBytes, 0)
            (0 until n by math.max(everyNth, 1)).iterator.map { i =>
              Frame(r.media_id, i,
                bytes.slice(i * windowBytes, math.min((i + 1) * windowBytes, bytes.length)))
            }
          } finally in.close()
        case None => Stub.sampleFrames(r, everyNth)
      }
    }
  }

  /** Decode metadata for every record — per-partition so a real codec
    * initializes once per partition, not once per record. */
  def decodeMeta(ds: Dataset[MediaRecord], decoder: MediaDecoder = MediaDecoder.Stub): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decoder.decode))
  }

  /** Feature extraction → (media_id, float vector) — the output feeds
    * straight into [[Similarity]] / [[Dedup.embeddingNearDupPairs]]. */
  def extractFeatures(
      ds: Dataset[MediaRecord],
      dim: Int,
      decoder: MediaDecoder = MediaDecoder.Stub,
  ): Dataset[MediaFeature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(r => MediaFeature(r.media_id, decoder.features(r, dim))))
  }

  /** Frame sampling (video → frame rows): a flatMap, so one huge video
    * fans out to many small frame records without driver involvement. */
  def sampleFrames(
      ds: Dataset[MediaRecord],
      everyNth: Int,
      decoder: MediaDecoder = MediaDecoder.Stub,
  ): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(decoder.sampleFrames(_, everyNth)))
  }

  /** Size-aware repartitioning: media rows are wildly skewed (a 4 KB
    * thumbnail vs a 2 GB video), so partition count comes from TOTAL
    * BYTES / target, not row count — otherwise one partition OOMs on
    * the big objects while others idle. One 1-row aggregate on the
    * driver; RangePartition on media_id spreads adjacent big objects. */
  def repartitionBySize(
      df: DataFrame,
      bytesCol: String,
      targetPartitionBytes: Long = 256L << 20,
  ): DataFrame = {
    val total = df.select(sum(length(col(bytesCol)))).head().getLong(0)
    val parts = math.max((total / targetPartitionBytes).toInt, 1)
    df.repartitionByRange(parts, col("media_id"))
  }

  /** 64-bit AVERAGE-HASH perceptual fingerprint of an image payload —
    * the image-dedup workhorse (near-identical images after re-encode,
    * mild resize, or format change hash close in Hamming space; the
    * text-side analogue is the X67 SimHash): decode via the JDK
    * registry, box-average luminance onto an 8×8 grid (integer
    * 299/587/114 luma, the [[MediaDecoder.ImageIO]] formula), then
    * one bit per cell — set iff the cell mean exceeds the global
    * mean (strict: a constant image hashes to 0). Deterministic per
    * input bytes (the decoder-seam contract); None for bytes the
    * registry can't read. */
  def averageHash(bytes: Array[Byte]): Option[Long] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }
    img.map { im =>
      val w = im.getWidth; val h = im.getHeight
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          val k = (y * 8 / h) * 8 + (x * 8 / w)
          sums(k) += lum
          cnts(k) += 1
          x += 1
        }
        y += 1
      }
      val means = Array.tabulate(64)(k =>
        if (cnts(k) > 0) sums(k).toDouble / cnts(k) else 0.0)
      val global = means.sum / 64.0
      var hash = 0L
      var k = 0
      while (k < 64) {
        if (means(k) > global) hash |= (1L << k)
        k += 1
      }
      hash
    }
  }

  /** 64-bit DCT perceptual hash (pHash) — the FREQUENCY-domain tier
    * above [[averageHash]] (the widely documented pHash method: decode,
    * box-average luminance onto a 32×32 grid, 2-D DCT-II, keep the
    * top-left 8×8 LOW-FREQUENCY coefficients, one bit per coefficient —
    * set iff it exceeds the MEDIAN of the 63 AC coefficients; the DC
    * slot is excluded from the median and its bit stays 0, so the hash
    * carries 63 informative structure bits and NO absolute-brightness
    * bit at all). What the DCT buys over per-cell brightness: the
    * comparison set is the image's coarse SPATIAL-FREQUENCY mix, so a
    * smooth illumination change (vignette, lighting ramp, brightness/
    * contrast move) lands almost entirely in one or two low-order
    * coefficients and the median barely moves — while [[averageHash]]
    * compares every cell against the GLOBAL mean, which an illumination
    * ramp drags through half the cells (spec-pinned: a luminance ramp
    * flips aHash far wide of pHash on the same raster). Affine
    * luminance maps (s·lum + o, s>0) are exactly invariant: DCT is
    * linear, the offset is pure DC, every AC coefficient scales by s,
    * and the median scales with them. Deterministic per input bytes:
    * fixed 32×32 grid, fixed-shape sequential IEEE double arithmetic,
    * strict `>` (a constant image has all-zero AC → hash 0). None for
    * payloads the JDK registry can't read. */
  def dctHash(bytes: Array[Byte]): Option[Long] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }
    img.map { im =>
      val w = im.getWidth; val h = im.getHeight
      val n = 32
      val sums = new Array[Long](n * n)
      val cnts = new Array[Long](n * n)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          val k = (y * n / h) * n + (x * n / w)
          sums(k) += lum
          cnts(k) += 1
          x += 1
        }
        y += 1
      }
      val g = Array.tabulate(n * n)(k =>
        if (cnts(k) > 0) sums(k).toDouble / cnts(k) else 0.0)
      // cos((2t+1)·u·π/(2n)) for t in [0,n), u in [0,8) — the only
      // basis rows the 8×8 block needs; orthonormal α(u) applied below
      val cos = Array.tabulate(8, n)((u, t) =>
        math.cos((2 * t + 1) * u * math.Pi / (2.0 * n)))
      val a0 = math.sqrt(1.0 / n); val a1 = math.sqrt(2.0 / n)
      val c = new Array[Double](64)
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var acc = 0.0
          var yy = 0
          while (yy < n) {
            var rowAcc = 0.0
            var xx = 0
            while (xx < n) { rowAcc += g(yy * n + xx) * cos(u)(xx); xx += 1 }
            acc += rowAcc * cos(v)(yy)
            yy += 1
          }
          val scaled = acc *
            (if (u == 0) a0 else a1) * (if (v == 0) a0 else a1)
          // structurally-zero frequencies leave ~1e-11 float residue
          // (Σ cos over a full period); clamp so a constant image
          // hashes to 0, not to the residue's sign noise
          c(v * 8 + u) = if (math.abs(scaled) < 1e-9) 0.0 else scaled
          u += 1
        }
        v += 1
      }
      val ac = new Array[Double](63)
      System.arraycopy(c, 1, ac, 0, 63)
      java.util.Arrays.sort(ac)
      val median = ac(31) // true middle of 63: 31 below, 31 above
      var hash = 0L
      var k = 1 // DC slot excluded — bit 0 stays 0
      while (k < 64) {
        if (c(k) > median) hash |= (1L << k)
        k += 1
      }
      hash
    }
  }

  /** Deterministic BILINEAR image resize (the preprocessing step a
    * multimodal training pipeline runs on every image: normalize to
    * the model's input resolution): decode via the JDK registry,
    * hand-rolled center-aligned bilinear sampling (NOT Graphics2D —
    * its interpolation is renderer-dependent; this loop is fixed
    * double arithmetic, so the SAME bytes resize to the SAME bytes
    * on every executor and replay — the [[MediaDecoder]] determinism
    * contract), re-encoded as PNG (lossless, deterministic writer).
    * Pure per-payload map work; None for undecodable bytes. The
    * quality argument is spec-pinned where it matters for dedup: a
    * 2× downscale moves the [[dctHash]] only a few bits (coarse
    * spatial frequencies survive resampling), so near-dup pairing
    * still catches resized copies — the reason pipelines hash AFTER
    * normalization. */
  def resizeBilinear(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    require(w >= 1 && h >= 1, s"target dims must be >= 1: ${w}x$h")
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }
    img.map { im =>
      val sw = im.getWidth
      val sh = im.getHeight
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        val fy = (y + 0.5) * sh / h - 0.5
        val y0 = math.max(0, math.min(sh - 1, math.floor(fy).toInt))
        val y1 = math.min(sh - 1, y0 + 1)
        val wy = math.max(0.0, math.min(1.0, fy - y0))
        var x = 0
        while (x < w) {
          val fx = (x + 0.5) * sw / w - 0.5
          val x0 = math.max(0, math.min(sw - 1, math.floor(fx).toInt))
          val x1 = math.min(sw - 1, x0 + 1)
          val wx = math.max(0.0, math.min(1.0, fx - x0))
          val p00 = im.getRGB(x0, y0); val p10 = im.getRGB(x1, y0)
          val p01 = im.getRGB(x0, y1); val p11 = im.getRGB(x1, y1)
          def ch(s: Int): Int = {
            val v =
              ((p00 >> s) & 0xff) * (1 - wx) * (1 - wy) +
                ((p10 >> s) & 0xff) * wx * (1 - wy) +
                ((p01 >> s) & 0xff) * (1 - wx) * wy +
                ((p11 >> s) & 0xff) * wx * wy
            math.max(0, math.min(255, math.round(v).toInt))
          }
          out.setRGB(x, y, (ch(16) << 16) | (ch(8) << 8) | ch(0))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Frame form: every image payload resized to (w, h) PNG;
    * undecodable payloads drop (the quarantine-upstream contract). */
  def resizeImages(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r =>
      resizeBilinear(r.bytes, w, h).map(b => r.copy(bytes = b))))
  }

  /** DCT-hash table → (media_id, dhash) for image payloads;
    * undecodable payloads drop. The [[imageHashes]] discipline on the
    * [[dctHash]] tier — persist beside the media or feed straight to
    * [[imageDctNearDupPairs]]. */
  def imageDctHashes(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r =>
        dctHash(r.bytes).map(hh => (r.media_id, hh))))
      .toDF("media_id", "dhash")
  }

  /** Image near-dup pairs over a (media_id, dhash) table — the X67
    * block-LSH pigeonhole discipline ([[graft.llm.Dedup.
    * hammingNearDupPairs]]) on the DCT hash: pairs within `maxHamming`
    * agree on ≥ 1 of `blocks` slices, so candidates come from an
    * equi-join on (block, slice), never all-pairs. */
  def imageDctNearDupPairs(
      hashes: DataFrame,
      blocks: Int = 4,
      maxHamming: Int = 3,
  ): DataFrame =
    Dedup.hammingNearDupPairs(hashes, "media_id", "dhash",
      bits = 64, blocks = blocks, maxHamming = maxHamming)

  /** 64-bit energy-envelope fingerprint of an audio payload — the
    * audio analogue of [[averageHash]] (the third modality's near-dup
    * tier: text X67, image X143, audio here): mean-|amplitude| over
    * 64 equal time windows ([[MediaDecoder.Audio]]'s envelope,
    * channel-interleaved like its features), one bit per window —
    * set iff the window's energy exceeds the global mean (strict:
    * silence hashes to 0). Robust to gain-preserving re-encodes
    * (16→24-bit PCM quantizes the same envelope shape); NOT robust
    * to time-shifts — that is [[audioLandmarks]]'s tier (same
    * division of labor as X142 vs X39). None when the JDK
    * can't parse the container. */
  def audioEnvelopeHash(bytes: Array[Byte]): Option[Long] = {
    val env = MediaDecoder.Audio.features(
      MediaRecord(-1L, "audio", bytes, ""), 64)
    // Audio.features degrades to the Stub byte-fold for unparseable
    // payloads; detect real decode by re-checking the stream seam
    val parseable =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        in.close(); true
      } catch { case _: Exception => false }
    if (!parseable) None
    else Some {
      val mean = env.map(_.toDouble).sum / 64.0
      var hash = 0L
      var k = 0
      while (k < 64) {
        if (env(k) > mean) hash |= (1L << k)
        k += 1
      }
      hash
    }
  }

  /** LANDMARK (constellation) audio fingerprints — the time-shift-
    * robust tier above [[audioEnvelopeHash]] (Wang 2003, "An
    * Industrial-Strength Audio Search Algorithm", the public
    * Shazam-family method): spectrogram → per-band spectral peaks →
    * each anchor peak pairs with the next `fanout` peaks inside a
    * bounded target zone, hashed as (anchor_bin, target_bin, Δframes).
    * Every hash depends only on two frequencies and their time GAP —
    * never absolute position — so a clip shifted by whole hops (or
    * prefixed with silence) keeps its landmark set except at the
    * edges, exactly the case the envelope hash is defeated by
    * (spec-pinned fixture). Matching is set overlap, so pairing rides
    * the same shared-key equi-join discipline as
    * [[videoNearDupPairs]] — never all-pairs.
    *
    * Deterministic per input bytes: fixed Hann window, fixed radix-2
    * FFT, integer peak/bin arithmetic, ties to the lower bin. Returns
    * the DISTINCT hash set sorted; Some(empty) for parseable silence
    * or too-short clips, None when the container doesn't parse. */
  def audioLandmarks(
      bytes: Array[Byte],
      frameSize: Int = 512,
      hop: Int = 256,
      bands: Int = 6,
      fanout: Int = 3,
      maxDt: Int = 31,
      minMag: Double = 1.0,
  ): Option[Array[Long]] = {
    require(Integer.bitCount(frameSize) == 1, "frameSize must be a power of 2")
    require(hop >= 1 && bands >= 1 && fanout >= 1, "bad landmark params")
    require(maxDt >= 1 && maxDt <= 63, "maxDt must fit the 6-bit hash field")
    MediaDecoder.Audio.monoSamples(bytes).map { mono =>
      val half = frameSize / 2
      // Hann window, precomputed once per call
      val win = Array.tabulate(frameSize)(i =>
        0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (frameSize - 1))))
      val peaks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var t = 0
      var off = 0
      while (off + frameSize <= mono.length) {
        val re = new Array[Double](frameSize)
        val im = new Array[Double](frameSize)
        var i = 0
        while (i < frameSize) { re(i) = mono(off + i) * win(i); i += 1 }
        fftInPlace(re, im)
        // per-band argmax over bins 1..half-1 (skip DC); ties → lower bin
        var b = 0
        while (b < bands) {
          val lo = 1 + b * (half - 1) / bands
          val hi = 1 + (b + 1) * (half - 1) / bands
          var bestBin = -1
          var bestMag = minMag * minMag // compare squared magnitudes
          var k = lo
          while (k < hi) {
            val m2 = re(k) * re(k) + im(k) * im(k)
            if (m2 > bestMag) { bestMag = m2; bestBin = k }
            k += 1
          }
          if (bestBin >= 0) peaks += ((t, bestBin))
          b += 1
        }
        t += 1
        off += hop
      }
      // anchor→target pairing inside the zone Δt ∈ [1, maxDt]
      val hashes = scala.collection.mutable.TreeSet.empty[Long]
      val n = peaks.length
      var a = 0
      while (a < n) {
        val (ta, fa) = peaks(a)
        var taken = 0
        var j = a + 1
        while (j < n && taken < fanout) {
          val (tb, fb) = peaks(j)
          val dt = tb - ta
          if (dt >= 1 && dt <= maxDt) {
            hashes += (fa.toLong << 15) | (fb.toLong << 6) | dt.toLong
            taken += 1
          }
          if (dt > maxDt) j = n // peaks are frame-ordered: zone exhausted
          else j += 1
        }
        a += 1
      }
      hashes.toArray
    }
  }

  /** Iterative radix-2 Cooley–Tukey FFT, in place (textbook form). */
  private def fftInPlace(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val er = re(base + k); val ei = im(base + k)
          val or_ = re(base + k + len / 2); val oi = im(base + k + len / 2)
          val pr = or_ * cr - oi * ci
          val pi = or_ * ci + oi * cr
          re(base + k) = er + pr; im(base + k) = ei + pi
          re(base + k + len / 2) = er - pr; im(base + k + len / 2) = ei - pi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Landmark table → (media_id, lm), one row per distinct landmark
    * hash; unparseable payloads drop. The explode IS the index: at
    * scale this is the posting-list layout a shared-landmark
    * equi-join prunes on. */
  def audioLandmarkTable(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r =>
        audioLandmarks(r.bytes).iterator.flatMap(_.iterator.map(h => (r.media_id, h)))))
      .toDF("media_id", "lm")
  }

  /** Audio near-dup pairs by landmark-set CONTAINMENT: |A∩B| /
    * min(|A|,|B|) ≥ `threshold` — containment, not Jaccard, because
    * the motivating case is a clip embedded in (or shifted within) a
    * longer one, where the shorter side's landmarks survive nearly
    * whole but the union is diluted. Candidates from the shared-lm
    * equi-join, counts reduced per pair — the [[videoNearDupPairs]]
    * shape on a different posting list. */
  def audioNearDupPairsByLandmarks(
      landmarks: DataFrame,
      threshold: Double = 0.25,
  ): DataFrame = {
    val sets = landmarks.select(col("media_id"), col("lm")).distinct()
    val sizes = sets.groupBy(col("media_id")).agg(count(lit(1)).as("n"))
    val shared = sets.as("a")
      .join(sets.as("b"),
        col("a.lm") === col("b.lm") && col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    shared
      .join(sizes.withColumnRenamed("media_id", "id_a")
        .withColumnRenamed("n", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("media_id", "id_b")
        .withColumnRenamed("n", "n_b"), Seq("id_b"))
      .withColumn("containment",
        col("inter").cast("double") / least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("n_a"), col("n_b"),
        col("containment"))
  }

  /** Envelope-hash table → (media_id, ahash) for audio payloads;
    * unparseable payloads drop. Pairs via [[imageNearDupPairs]]'s
    * generic discipline ([[graft.llm.Dedup.hammingNearDupPairs]]). */
  def audioHashes(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r =>
        audioEnvelopeHash(r.bytes).map(hh => (r.media_id, hh))))
      .toDF("media_id", "ahash")
  }

  /** Perceptual-hash table → (media_id, ahash); undecodable payloads
    * drop (they can't be perceptually compared). Feed to
    * [[imageNearDupPairs]] or persist next to the media. */
  def imageHashes(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r =>
        averageHash(r.bytes).map(hh => (r.media_id, hh))))
      .toDF("media_id", "ahash")
  }

  /** Image near-dup pairs over a (media_id, ahash) table: the X67
    * block-LSH pigeonhole discipline on the 64-bit perceptual hash —
    * pairs within `maxHamming` agree on ≥ 1 of `blocks` hash slices,
    * so the equi-join on (block, slice) finds every such pair without
    * an all-pairs comparison. */
  def imageNearDupPairs(
      hashes: DataFrame,
      blocks: Int = 4,
      maxHamming: Int = 3,
  ): DataFrame =
    Dedup.hammingNearDupPairs(hashes, "media_id", "ahash",
      bits = 64, blocks = blocks, maxHamming = maxHamming)

  /** Per-FRAME perceptual hashes for animated/video containers: the
    * [[sampleFrames]] fan-out (frames emit as self-contained images)
    * composed with [[averageHash]] — (media_id, frame_idx, ahash),
    * undecodable frames dropped. The video near-dup signature is the
    * SET of frame hashes. */
  def videoFrameHashes(
      ds: Dataset[MediaRecord],
      everyNth: Int = 1,
      decoder: MediaDecoder = MediaDecoder.ImageIO,
  ): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(r =>
        decoder.sampleFrames(r, everyNth).flatMap(f =>
          averageHash(f.bytes).map(hh => (f.media_id, f.frame_idx, hh)))))
      .toDF("media_id", "frame_idx", "ahash")
  }

  /** Video near-dup pairs by frame-set overlap: two videos are near
    * dups when the Jaccard of their DISTINCT frame-hash sets reaches
    * `threshold` — re-encoded/trimmed copies share most frames,
    * unrelated videos share none. Candidates come from an equi-join
    * on the frame hash (a shared frame IS the candidate signal —
    * never an all-pairs video comparison), counts reduce per pair,
    * and the Jaccard uses the exact |A|, |B|, |A∩B|. The frame sets
    * ride the same X1-style hash-grouped shapes as text dedup; at
    * scale the join carries (hash, media_id) pairs only. */
  def videoNearDupPairs(
      frameHashes: DataFrame,
      threshold: Double = 0.5,
  ): DataFrame = {
    val sets = frameHashes
      .select(col("media_id"), col("ahash")).distinct()
    val sizes = sets.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n"))
    val shared = sets.as("a")
      .join(sets.as("b"),
        col("a.ahash") === col("b.ahash") &&
          col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    shared
      .join(sizes.withColumnsRenamed(Map("media_id" -> "id_a", "n" -> "n_a")), "id_a")
      .join(sizes.withColumnsRenamed(Map("media_id" -> "id_b", "n" -> "n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Synthesize a deterministic media table (the testdata ships no
    * binary tables) — header-bearing payloads per the Stub format. */
  def syntheticMedia(spark: SparkSession, n: Int, kind: String = "image"): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val w = 64 + (i % 8).toInt * 16
      val h = 48 + (i % 5).toInt * 16
      val frames = 4 + (i % 3).toInt
      val headerVals = kind match {
        case "image" => Seq(w, h)
        case "audio" => Seq(16000 + (i % 4).toInt * 8000)
        case _       => Seq(w, h, frames)
      }
      val header = headerVals.flatMap(v =>
        Seq((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte))
      val body = Array.tabulate(256 + (i % 7).toInt * 64)(j => ((i * 131 + j * 17) % 251).toByte)
      MediaRecord(i, kind, header.toArray ++ body, s"mem://$kind/$i")
    }
  }
}
