package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaCodec

/** The Spark-side multimodal plumbing is real even though the codec is
  * a stub: binary columns round-trip through parquet, mapPartitions
  * batches bound memory, schemas are stable, malformed payloads drop.
  */
class MultimodalSpec extends SparkSpec {

  private def syntheticMedia(n: Int) = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      // deterministic payload per id
      val payload = Array.tabulate(100 + i % 50)(j => ((i * 31 + j * 7) % 256).toByte)
      Row(i.toLong, kind, MediaCodec.encode(kind, payload),
        Row(64, 64, 16000, 4))
    }
    spark.createDataFrame(sc.parallelize(rows, 3), Multimodal.mediaSchema)
  }

  test("binary media round-trips through parquet with typed metadata") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-media").toString
    syntheticMedia(30).write.mode("overwrite").parquet(tmp)
    val back = spark.read.schema(Multimodal.mediaSchema).parquet(tmp)
    assert(back.count() === 30)
    val r = back.filter(col("media_id") === 7L).collect().head
    val decoded = MediaCodec.decode(r.getAs[Array[Byte]]("media"))
    assert(decoded.isDefined)
    assert(r.getAs[Row]("meta").getInt(0) === 64)
  }

  test("extractFeatures: one L1-normalized 16-dim vector per decodable row") {
    val feats = Multimodal.extractFeatures(syntheticMedia(30), batchSize = 8).collect()
    assert(feats.length === 30)
    feats.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("feature")
      assert(v.length === 16)
      assert(math.abs(v.sum - 1.0f) < 1e-5)
    }
    // determinism: same input → same features
    val again = Multimodal.extractFeatures(syntheticMedia(30), batchSize = 64).collect()
    assert(feats.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("malformed payloads are dropped, not fatal") {
    import spark.implicits._
    val bad = spark.createDataFrame(sc.parallelize(Seq(
      Row(100L, "image", "not-a-media-file".getBytes, Row(0, 0, 0, 0)),
      Row(101L, "image", MediaCodec.encode("image", Array[Byte](1, 2, 3)), Row(0, 0, 0, 0)),
      Row(102L, "image", null, Row(0, 0, 0, 0))), 1), Multimodal.mediaSchema)
    val out = Multimodal.extractFeatures(bad).select("media_id").as[Long].collect()
    assert(out.toSeq === Seq(101L))
  }

  test("sampleFrames: every-k-th frame of video rows only") {
    val frames = Multimodal.sampleFrames(syntheticMedia(30), everyK = 2).collect()
    // 10 videos × frames 0 and 2 (n_frames=4, k=2)
    assert(frames.length === 20)
    assert(frames.map(_.getInt(1)).distinct.sorted.toSeq === Seq(0, 2))
  }

  test("real PNG decode: ImageIO round-trip recovers exact gray pixels") {
    import graft.multimodal.Multimodal.ImageIoCodec
    // lossless contract: encodePng → decode is the identity on gray
    // samples (luma of r=g=b=v is exactly v)
    val px = Array.tabulate(96)(j => (j * 11) % 256)
    val bytes = ImageIoCodec.encodePng(8, 12, px)
    assert(bytes.take(4).map(_ & 0xff).toSeq === Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt))
    assert(ImageIoCodec.decode(bytes).get.toSeq === px.toSeq)
    // and the default AutoCodec dispatches PNG bytes to ImageIO
    assert(Multimodal.AutoCodec.decode(bytes).get.toSeq === px.toSeq)
  }

  test("extractFeatures over real PNG bytes matches features of the raw pixels") {
    val rows = (0 until 24).map { i =>
      val w = 8 + i % 4
      val px = Array.tabulate(w * 12)(j => (i * 37 + j * 11) % 256)
      Row(i.toLong, "image", Multimodal.ImageIoCodec.encodePng(w, 12, px),
        Row(w, 12, 0, 0))
    }
    val media = spark.createDataFrame(sc.parallelize(rows, 3), Multimodal.mediaSchema)
    // no-resize path (m9 shape): features computed on executors from
    // DECODED image bytes must equal features of the source pixels
    val got = Multimodal.extractFeatures(media, batchSize = 8).collect()
      .map(r => r.getLong(0) -> (r.getInt(2),
        r.getAs[scala.collection.Seq[Float]]("feature").toSeq)).toMap
    (0 until 24).foreach { i =>
      val w = 8 + i % 4
      val px = Array.tabulate(w * 12)(j => (i * 37 + j * 11) % 256)
      assert(got(i.toLong) === ((w * 12, Multimodal.features(px).toSeq)),
        s"media $i: decoded-PNG features must equal raw-pixel features")
    }
    // resize path (m11 shape): stride-subsample AFTER the real decode
    val resized = Multimodal.extractFeatures(media, batchSize = 8, resizeTo = Some(64))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(resized.values.toSet === Set(64))
  }

  test("real JPEG decodes through AutoCodec; garbage with a JPEG magic drops") {
    import graft.multimodal.Multimodal.ImageIoCodec
    // JPEG is lossy — assert decodability + shape, not exact pixels
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(y => (0 until 16).foreach { x =>
      val v = (x * 16 + y) % 256; img.setRGB(x, y, (v << 16) | (v << 8) | v)
    })
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    assert((jpeg(0) & 0xff) === 0xff && (jpeg(1) & 0xff) === 0xd8)
    val decoded = Multimodal.AutoCodec.decode(jpeg)
    assert(decoded.isDefined && decoded.get.length === 256)
    assert(decoded.get.forall(v => v >= 0 && v < 256))
    // truncated JPEG header only → ImageIO returns null → quarantine
    assert(Multimodal.AutoCodec.decode(Array(0xff.toByte, 0xd8.toByte, 0, 0)).isEmpty)
  }

  test("resize subsamples deterministically") {
    val s = Array.tabulate(100)(identity)
    val r = Multimodal.resize(s, 10)
    assert(r.length === 10)
    assert(r.toSeq === Seq(0, 10, 20, 30, 40, 50, 60, 70, 80, 90))
    assert(Multimodal.resize(Array(1, 2, 3), 10).toSeq === Seq(1, 2, 3))
  }

  test("real WAV decode: 16-bit PCM round-trip recovers exact samples") {
    val samples = Array.tabulate(777)(j => (j * 31 + 5) % 256)
    val wav = Multimodal.WavCodec.encodeWav(16000, samples)
    // a real RIFF file, dispatched by AutoCodec's magic check
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(Multimodal.WavCodec.decode(wav).get.toSeq === samples.toSeq)
    assert(Multimodal.AutoCodec.decode(wav).get.toSeq === samples.toSeq)
  }

  test("real y4m video decode: luma of every frame round-trips exactly; chroma skipped") {
    val w = 9 // odd width exercises the ceil(w/2) chroma plane math
    val h = 5
    val frames = (0 until 3).map(f =>
      Array.tabulate(w * h)(k => (f * 97 + k * 13) % 256))
    val y4m = Multimodal.Y4mCodec.encodeY4m(w, h, frames)
    // a real YUV4MPEG2 stream, dispatched by AutoCodec's magic check
    assert(new String(y4m.take(9), "US-ASCII") === "YUV4MPEG2")
    assert(Multimodal.Y4mCodec.decode(y4m).get.toSeq === frames.flatten)
    assert(Multimodal.AutoCodec.decode(y4m).get.toSeq === frames.flatten)
  }

  test("malformed y4m quarantines as None, never throws") {
    // magic but garbage header
    assert(Multimodal.AutoCodec.decode(
      "YUV4MPEG2 WX HY\nFRAME\n".getBytes("US-ASCII")).isEmpty)
    // truncated mid-frame: last frame's luma cut short
    val good = Multimodal.Y4mCodec.encodeY4m(4, 4,
      Seq(Array.tabulate(16)(identity), Array.tabulate(16)(_ + 16)))
    assert(Multimodal.Y4mCodec.decode(good.take(good.length - 20)).isEmpty)
    // a frame marker that isn't FRAME
    val bad = good.clone()
    val fi = good.indexOfSlice("FRAME".getBytes("US-ASCII"))
    bad(fi) = 'X'.toByte
    assert(Multimodal.Y4mCodec.decode(bad).isEmpty)
  }

  test("corrupt or compressed WAV quarantines as None, never throws") {
    // RIFF magic but garbage body
    val junk = "RIFFxxxxWAVEfmt garbage".getBytes("US-ASCII")
    assert(Multimodal.AutoCodec.decode(junk).isEmpty)
    // truncated real WAV: header survives, data chunk cut mid-frame —
    // decode must not throw (partial frames drop)
    val wav = Multimodal.WavCodec.encodeWav(8000,
      Array.tabulate(100)(identity))
    val truncated = wav.take(wav.length - 3)
    Multimodal.WavCodec.decode(truncated) // any Option is fine; no throw
  }

  test("dhash: brightness-invariant, pattern-sensitive, PNG-round-trip stable") {
    val w = 32; val h = 24
    val base = Array.tabulate(w * h)(j => (j * 11) % 200)
    // global brightness shift preserves every adjacent ordering
    assert(Multimodal.dhash(base.map(_ + 30), w, h) === Multimodal.dhash(base, w, h))
    // a different pattern moves the hash
    val other = Array.tabulate(w * h)(j => (j * 13 + 7) % 200)
    assert(Multimodal.dhash(other, w, h) !== Multimodal.dhash(base, w, h))
    // the REAL decode path reproduces the in-memory hash bit for bit
    val png = Multimodal.ImageIoCodec.encodePng(w, h, base)
    val decoded = Multimodal.ImageIoCodec.decode(png).get
    assert(Multimodal.dhash(decoded, w, h) === Multimodal.dhash(base, w, h))
    // hash is 64 bits of '0'/'1'
    assert(Multimodal.dhash(base, w, h).length === 64)
    assert(Multimodal.dhash(base, w, h).forall(c => c == '0' || c == '1'))
  }

  test("property: flipCrop geometry — margin-0 mirror is an involution, crops nest") {
    val gen = for {
      w <- org.scalacheck.Gen.chooseNum(3, 24)
      h <- org.scalacheck.Gen.chooseNum(3, 24)
      seed <- org.scalacheck.Gen.chooseNum(0, 10000)
    } yield (w, h, seed)
    org.scalacheck.Gen.listOfN(100, gen).sample.get.foreach { case (w, h, seed) =>
      val px = Array.tabulate(w * h)(j => (seed * 37 + j * 11) % 256)
      // mirror twice with no crop == identity
      val twice = Multimodal.flipCrop(
        Multimodal.flipCrop(px, w, h, 0), w, h, 0)
      assert(twice.toSeq === px.toSeq, s"mirror not involutive at ${w}x$h")
      // flip-then-crop == crop-of-flip: the m=1 output must equal the
      // interior of the m=0 mirror (index arithmetic consistency)
      val m0 = Multimodal.flipCrop(px, w, h, 0)
      val m1 = Multimodal.flipCrop(px, w, h, 1)
      val interior = (0 until (w - 2) * (h - 2)).map { k =>
        val y = k / (w - 2) + 1; val x = k % (w - 2) + 1
        m0(y * w + x)
      }
      assert(m1.toSeq === interior, s"crop window drifted at ${w}x$h")
    }
  }

  test("property: systematic-sampling grid places exactly 20 picks for any weights") {
    // the m49 integer formula, replayed in plain Scala over random
    // weight vectors: Σ picks == 20 whenever total ≥ 20, and any
    // weight ≥ step guarantees selection
    val gen = org.scalacheck.Gen.nonEmptyListOf(
      org.scalacheck.Gen.chooseNum(1, 500))
    (1 to 100).foreach { _ =>
      val ws = gen.sample.get
      val tot = ws.map(_.toLong).sum
      if (tot >= 20) {
        val step = tot / 20
        var cum = 0L
        var picks = 0L
        ws.foreach { w =>
          cum += w
          val hi = math.min((cum - 1) / step, 19L)
          val lo = (cum - w + step - 1) / step
          val k = hi - lo + 1
          if (k > 0) picks += k
          // sound guarantee bound: an interval of length >= step+20
          // must contain a grid multiple with index <= 19 (a bare
          // w >= step can land wholly in the post-19*step tail — the
          // counterexample this property run surfaced: w=151,
          // step=145, interval entirely past the last grid point)
          if (w >= step + 20) assert(k >= 1,
            s"weight $w >= step+20 (${step + 20}) skipped")
        }
        assert(picks === 20L, s"grid placed $picks picks for weights $ws")
      }
    }
  }
}
