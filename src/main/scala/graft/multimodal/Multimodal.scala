package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The codec is PLUGGABLE (`Codec`). All three modalities decode REAL
  * container formats with nothing but the JVM: `ImageIoCodec`
  * (PNG/JPEG/GIF/BMP via javax.imageio), `WavCodec` (RIFF/WAV PCM via
  * javax.sound.sampled), and `Y4mCodec` (YUV4MPEG2 uncompressed video
  * — pure-Scala stream parse). `MediaCodec` remains as the
  * deterministic stub proving the codec seam itself (a JNI/javacpp
  * H.264 decoder would plug in the same way). `AutoCodec` (the
  * default) dispatches on the payload's magic bytes. Everything
  * Spark-side is real and tested: the parquet-able schema, the
  * mapPartitions batch shape (bounded batches, iterator-in/
  * iterator-out — the same contract a vectorized/Arrow UDF would
  * have), the partitioning behavior, and the output schemas. Swapping
  * in a compressed-video codec changes no plan shape.
  *
  * Scale notes: payloads stay off the driver (mapPartitions only); a
  * 100 TB media table partitions by content hash; decode is
  * embarrassingly parallel and the feature output is narrow (media_id +
  * small float vector), so the expensive scan writes a skinny result.
  */
object Multimodal {

  /** Payload → integer samples in [0, 256), or None for undecodable
    * bytes (the caller's quarantine channel). Implementations must be
    * closure-serializable — they ship to executors via mapPartitions.
    */
  trait Codec extends Serializable {
    def decode(bytes: Array[Byte]): Option[Array[Int]]
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))), nullable = true)))

  /** STUB codec. Layout: 4-byte magic "GRFT", 1 byte kind, then payload.
    * A real implementation would hand `bytes` to an image/audio codec;
    * the deterministic fake derives "pixels"/"samples" from the payload
    * bytes so every downstream op has stable, assertable output.
    */
  object MediaCodec extends Codec {
    val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")

    def encode(kind: String, payload: Array[Byte]): Array[Byte] =
      Magic ++ Array(kindByte(kind)) ++ payload

    private def kindByte(kind: String): Byte = kind match {
      case "image" => 1; case "audio" => 2; case "video" => 3
      case other => throw new IllegalArgumentException(s"unknown kind: $other")
    }

    /** STUB decode: payload bytes as unsigned "samples" in [0, 256). */
    def decode(bytes: Array[Byte]): Option[Array[Int]] =
      if (bytes == null || bytes.length < 5 || !bytes.take(4).sameElements(Magic)) None
      else Some(bytes.drop(5).map(b => b & 0xff))
  }

  /** REAL image decode via the in-JDK javax.imageio (PNG, JPEG, GIF,
    * BMP — whatever the JRE's registered readers handle): pixels in
    * row-major order → integer luma (ITU-R 601 in integer math, so the
    * value is deterministic across JVMs; a gray pixel r=g=b=v maps to
    * exactly v, which is what makes lossless PNG digest-oracle-able).
    * Headless-safe: ImageIO needs no display.
    */
  object ImageIoCodec extends Codec {
    def decode(bytes: Array[Byte]): Option[Array[Int]] = {
      if (bytes == null || bytes.length == 0) return None
      // ImageIO returns null for unrecognized formats but THROWS on a
      // recognized-but-corrupt payload (truncated JPEG) — both are the
      // same quarantine case for a 100 TB crawl
      val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Int](w * h)
      var y = 0
      var i = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          out(i) = (r * 299 + g * 587 + b * 114) / 1000
          i += 1
          x += 1
        }
        y += 1
      }
      Some(out)
    }

    /** Encode row-major gray samples as a real PNG (test/ingest
      * helper; lossless, so decode(encodePng(px)) == px exactly).
      */
    def encodePng(width: Int, height: Int, samples: Array[Int]): Array[Byte] = {
      require(samples.length == width * height, "samples must be width*height")
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      var i = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val v = samples(i) & 0xff
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          i += 1
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** REAL audio decode via the in-JDK javax.sound.sampled (WAV/RIFF —
    * the JRE's WaveFileReader; headless-safe, no audio device needed).
    * PCM 8/16-bit, any channel count (channel 0 is taken — a
    * deterministic choice, where mixing would need float math);
    * samples map to [0, 256) by the top byte: a 16-bit value s becomes
    * (s >> 8) + 128 — the exact inverse of `encodeWav`'s
    * (v − 128) << 8, so a generated WAV round-trips its samples
    * bit-exactly (what makes WAV digest-oracle-able, m22). Compressed
    * encodings (μ-law, MP3) and corrupt payloads quarantine as None.
    */
  object WavCodec extends Codec {
    def decode(bytes: Array[Byte]): Option[Array[Int]] = {
      if (bytes == null || bytes.length < 12) return None
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = ais.getFormat
          val enc = fmt.getEncoding
          val bits = fmt.getSampleSizeInBits
          val frameSize = fmt.getFrameSize
          val big = fmt.isBigEndian
          import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
          if ((enc != PCM_SIGNED && enc != PCM_UNSIGNED) ||
            (bits != 8 && bits != 16) || frameSize <= 0) return None
          val raw = ais.readAllBytes()
          val nFrames = raw.length / frameSize
          val out = new Array[Int](nFrames)
          var f = 0
          while (f < nFrames) {
            val off = f * frameSize // channel 0 of the frame
            out(f) =
              if (bits == 8) {
                val b = raw(off)
                if (enc == PCM_UNSIGNED) b & 0xff else (b + 128) & 0xff
              } else {
                val lo = if (big) raw(off + 1) else raw(off)
                val hi = if (big) raw(off) else raw(off + 1)
                val s = (hi << 8) | (lo & 0xff) // hi sign-extends: signed 16
                ((s >> 8) + 128) & 0xff
              }
            f += 1
          }
          Some(out)
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Encode [0, 256) samples as a REAL 16-bit PCM mono little-endian
      * WAV: v ↦ (v − 128) << 8, so decode(encodeWav(_, vs)) == vs
      * exactly (test/ingest helper, the audio counterpart of
      * encodePng).
      */
    def encodeWav(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false)
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        val s = ((samples(i) & 0xff) - 128) << 8
        data(2 * i) = (s & 0xff).toByte
        data(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** REAL video decode: YUV4MPEG2 (y4m) — the uncompressed
    * interchange container mjpegtools/ffmpeg emit (`-f yuv4mpegpipe`);
    * pure-Scala stream parse, no native codec. Layout: one ASCII
    * stream header `YUV4MPEG2 W<w> H<h> ...\n`, then per frame a
    * `FRAME...\n` marker followed by planar YUV — Y is w·h bytes,
    * chroma size from the C tag (C420*: two (⌈w/2⌉·⌈h/2⌉) planes,
    * C422: two ⌈w/2⌉·h, C444: two w·h; default 420). Decode returns
    * the LUMA samples of every frame concatenated (chroma skipped) —
    * luma bytes live verbatim in the container, so a generated y4m
    * round-trips them exactly, which is what makes real video
    * digest-oracle-able (m10/m28) the same way PNG (m17) and WAV
    * (m22) are. Truncated/malformed streams quarantine as None.
    */
  object Y4mCodec extends Codec {
    val Magic: Array[Byte] = "YUV4MPEG2 ".getBytes("US-ASCII")

    def decode(bytes: Array[Byte]): Option[Array[Int]] = {
      if (bytes == null || bytes.length < Magic.length ||
        !bytes.take(Magic.length).sameElements(Magic)) return None
      val nl = bytes.indexOf('\n'.toByte)
      if (nl < 0) return None
      val params = new String(bytes, 0, nl, "US-ASCII").split(' ').drop(1)
      def tag(c: Char): Option[String] =
        params.find(p => p.nonEmpty && p.head == c).map(_.tail)
      (tag('W').flatMap(_.toIntOption), tag('H').flatMap(_.toIntOption)) match {
        case (Some(w), Some(h)) if w > 0 && h > 0 =>
          val cs = tag('C').getOrElse("420jpeg")
          val chroma =
            if (cs.startsWith("444")) 2 * w * h
            else if (cs.startsWith("422")) 2 * ((w + 1) / 2) * h
            else 2 * ((w + 1) / 2) * ((h + 1) / 2) // 420 family
          val luma = w * h
          val out = new scala.collection.mutable.ArrayBuffer[Int]()
          var pos = nl + 1
          while (pos < bytes.length) {
            val fnl = bytes.indexOf('\n'.toByte, pos)
            if (fnl < 0 || fnl - pos < 5 ||
              new String(bytes, pos, 5, "US-ASCII") != "FRAME") return None
            pos = fnl + 1
            if (pos + luma > bytes.length) return None // truncated frame
            var j = 0
            while (j < luma) { out += bytes(pos + j) & 0xff; j += 1 }
            pos += luma + chroma
          }
          Some(out.toArray)
        case _ => None
      }
    }

    /** Encode luma frames as a real y4m stream (C420jpeg, neutral-gray
      * chroma planes) — test/ingest helper, the video counterpart of
      * encodePng/encodeWav: decode(encodeY4m(w, h, fs)) == fs.flatten
      * exactly.
      */
    def encodeY4m(width: Int, height: Int, frames: Seq[Array[Int]]): Array[Byte] = {
      require(frames.forall(_.length == width * height),
        "every frame must be width*height luma samples")
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420jpeg\n"
        .getBytes("US-ASCII"))
      val chroma = Array.fill[Byte](
        2 * ((width + 1) / 2) * ((height + 1) / 2))(128.toByte)
      frames.foreach { f =>
        bos.write("FRAME\n".getBytes("US-ASCII"))
        f.foreach(v => bos.write(v & 0xff))
        bos.write(chroma)
      }
      bos.toByteArray
    }
  }

  /** Default codec: dispatch on the payload's magic bytes — GRFT →
    * stub, PNG/JPEG/GIF/BMP signatures → ImageIO, RIFF → WAV,
    * YUV4MPEG2 → y4m video; anything else is undecodable (None → the
    * row drops to the quarantine channel).
    */
  object AutoCodec extends Codec {
    def decode(bytes: Array[Byte]): Option[Array[Int]] = {
      if (bytes == null || bytes.length < 4) return None
      val b0 = bytes(0) & 0xff
      val b1 = bytes(1) & 0xff
      if (bytes.take(4).sameElements(MediaCodec.Magic)) MediaCodec.decode(bytes)
      else if ((b0 == 0x89 && b1 == 'P') || // PNG
        (b0 == 0xff && b1 == 0xd8) || // JPEG
        (b0 == 'G' && b1 == 'I') || // GIF
        (b0 == 'B' && b1 == 'M')) // BMP
        ImageIoCodec.decode(bytes)
      else if (b0 == 'R' && b1 == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
        WavCodec.decode(bytes)
      else if (b0 == 'Y' && b1 == 'U' && bytes(2) == 'V' && bytes(3) == '4')
        Y4mCodec.decode(bytes)
      else None
    }
  }

  private val featDim = 16

  /** Feature extraction: decode → fixed 16-bin histogram, L1-normalized.
    * (The stub stand-in for "embed the image"; same output shape.)
    */
  def features(samples: Array[Int]): Array[Float] = {
    val hist = new Array[Float](featDim)
    samples.foreach(s => hist(s * featDim / 256) += 1f)
    val n = math.max(1, samples.length)
    hist.map(_ / n)
  }

  /** STUB resize: subsample "pixels" to at most `target` samples with a
    * fixed stride (real impl: bilinear resize in the codec).
    */
  def resize(samples: Array[Int], target: Int): Array[Int] = {
    if (samples.length <= target) samples
    else {
      val stride = samples.length.toDouble / target
      Array.tabulate(target)(i => samples((i * stride).toInt))
    }
  }

  /** Decode + featurize as a batched mapPartitions pass. `batchSize`
    * bounds per-batch memory exactly like an Arrow record batch; rows
    * whose payload fails to decode are dropped (quarantine channel at
    * the caller if needed). `resizeTo` inserts the resize step between
    * decode and featurize (the normalize-before-embed shape), so
    * n_samples in the output is the POST-resize length.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64,
      resizeTo: Option[Int] = None, codec: Codec = AutoCodec): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("kind"), col("media"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.grouped(batchSize).flatMap { batch =>
          // one "batch decode" call — the boundary a vectorized codec
          // (or mapInArrow) would cross once per batch, not per row
          batch.iterator.flatMap { r =>
            codec.decode(r.getAs[Array[Byte]]("media")).map { decoded =>
              val samples = resizeTo.map(resize(decoded, _)).getOrElse(decoded)
              Row(r.getLong(0), r.getString(1), samples.length, features(samples))
            }
          }
        }
      }(encoder)
  }

  /** Deterministic augmentation: horizontal mirror then center crop by
    * `margin` pixels per side — pure index arithmetic over the decoded
    * row-major grid (out[y][x] = in[y+m][w−1−(x+m)]), so an oracle can
    * replay the transform on the pixel-generator formula without ever
    * touching image bytes. The training-pipeline augmentations that
    * matter at corpus scale are exactly these cheap reindexings; the
    * expensive part (decode) is the batched pass around it.
    */
  def flipCrop(samples: Array[Int], w: Int, h: Int, margin: Int): Array[Int] = {
    val cw = w - 2 * margin
    val ch = h - 2 * margin
    require(cw > 0 && ch > 0, s"margin $margin too large for ${w}x$h")
    Array.tabulate(cw * ch) { k =>
      val y = k / cw + margin
      val x = k % cw + margin
      samples(y * w + (w - 1 - x))
    }
  }

  /** Decode → flipCrop → integer digest in one batched mapPartitions
    * pass (the extractFeatures shape): one row per decodable image
    * with (media_id, out_w, out_h, digest) where digest =
    * Σ (k+1)·(px[k] DIV 16 + 1) over the augmented pixels — exact,
    * order-pinned, SQL-replayable.
    */
  def augmentDigest(media: DataFrame, margin: Int = 1, batchSize: Int = 64,
      codec: Codec = AutoCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("out_w", IntegerType, nullable = false),
      StructField("out_h", IntegerType, nullable = false),
      StructField("digest", LongType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("media"),
        col("meta.width").as("w"), col("meta.height").as("h"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val w = r.getInt(2); val h = r.getInt(3)
            codec.decode(r.getAs[Array[Byte]]("media")).map { px =>
              val aug = flipCrop(px, w, h, margin)
              var d = 0L
              var k = 0
              while (k < aug.length) {
                d += (k + 1).toLong * (aug(k) / 16 + 1)
                k += 1
              }
              Row(r.getLong(0), w - 2 * margin, h - 2 * margin, d)
            }
          }
        }
      }(encoder)
  }

  /** Difference hash (dHash) — the standard perceptual image
    * fingerprint (the Hacker Factor/imagehash algorithm): sample the
    * decoded grayscale onto a 9×8 grid (nearest neighbor — explicit
    * integer index math, NOT Graphics2D scaling, so the grid is
    * bit-identical on every platform) and emit one bit per
    * horizontally-adjacent pair, row-major. Rendered as a 64-char
    * '0'/'1' string: portable across engines (no sign-bit trap at bit
    * 63) and directly groupable. Invariant to global brightness shifts
    * and any resample that preserves local ordering — the transforms
    * that defeat byte-exact dedup on image corpora.
    */
  def dhash(samples: Array[Int], w: Int, h: Int): String = {
    val sb = new java.lang.StringBuilder(64)
    var r = 0
    while (r < 8) {
      val sy = r * h / 8
      var c = 0
      while (c < 8) {
        val a = samples(sy * w + (c * w / 9))
        val b = samples(sy * w + ((c + 1) * w / 9))
        sb.append(if (b > a) '1' else '0')
        c += 1
      }
      r += 1
    }
    sb.toString
  }

  /** Decode → dHash as the same batched mapPartitions pass as
    * extractFeatures: one row per decodable image, (media_id, dhash).
    * Grid geometry comes from the meta struct (the decoded sample
    * array is flat), so undecodable payloads AND rows without
    * width/height drop to the caller's quarantine channel.
    */
  def imageDhash(media: DataFrame, batchSize: Int = 64,
      codec: Codec = AutoCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", StringType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("media"),
        col("meta.width").as("w"), col("meta.height").as("h"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            if (r.isNullAt(2) || r.isNullAt(3)) None
            else {
              val w = r.getInt(2); val h = r.getInt(3)
              if (w < 9 || h < 8) None
              else codec.decode(r.getAs[Array[Byte]]("media"))
                .filter(_.length >= w * h)
                .map(px => Row(r.getLong(0), dhash(px, w, h)))
            }
          }
        }
      }(encoder)
  }

  /** Frame sampling: split samples into n_frames equal frames, keep
    * every k-th frame, featurize each — one output row per kept frame.
    * Defaults to video rows; pass `kinds = Seq("audio")` to window
    * real audio the same way (fixed-length analysis windows over WAV
    * samples — the same op, m24 proves it over real RIFF bytes).
    */
  def sampleFrames(media: DataFrame, everyK: Int = 2, batchSize: Int = 64,
      codec: Codec = AutoCodec, kinds: Seq[String] = Seq("video")): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.filter(col("kind").isin(kinds: _*))
      .select(col("media_id"), col("media"), col("meta.n_frames").as("n_frames"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val nFrames = math.max(1, r.getInt(2))
            codec.decode(r.getAs[Array[Byte]]("media")).toSeq.flatMap { samples =>
              val frameLen = math.max(1, samples.length / nFrames)
              (0 until nFrames by everyK).map { f =>
                val frame = samples.slice(f * frameLen, (f + 1) * frameLen)
                Row(r.getLong(0), f, features(frame))
              }
            }
          }
        }
      }(encoder)
  }
}
