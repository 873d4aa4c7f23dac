package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The actual codec step is STUBBED — this container has no image or
  * audio libraries — behind `MediaCodec`, a deterministic fake that
  * "decodes" a fixed header + payload layout. Everything Spark-side is
  * real and tested: the parquet-able schema, the mapPartitions batch
  * shape (bounded batches, iterator-in/iterator-out — the same
  * contract a vectorized/Arrow UDF would have), the partitioning
  * behavior, and the output schemas. Swapping MediaCodec for a real
  * JNI/javacpp codec changes no plan shape.
  *
  * Scale notes: payloads stay off the driver (mapPartitions only); a
  * 100 TB media table partitions by content hash; decode is
  * embarrassingly parallel and the feature output is narrow (media_id +
  * small float vector), so the expensive scan writes a skinny result.
  */
object Multimodal {

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
  object MediaCodec {
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
      resizeTo: Option[Int] = None): DataFrame = {
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
            MediaCodec.decode(r.getAs[Array[Byte]]("media")).map { decoded =>
              val samples = resizeTo.map(resize(decoded, _)).getOrElse(decoded)
              Row(r.getLong(0), r.getString(1), samples.length, features(samples))
            }
          }
        }
      }(encoder)
  }

  /** Frame sampling for "video": split samples into n_frames equal
    * frames, keep every k-th frame, featurize each — one output row per
    * kept frame.
    */
  def sampleFrames(media: DataFrame, everyK: Int = 2, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("media"), col("meta.n_frames").as("n_frames"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val nFrames = math.max(1, r.getInt(2))
            MediaCodec.decode(r.getAs[Array[Byte]]("media")).toSeq.flatMap { samples =>
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
