package graft.sources

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-file Bloom filters for point-lookup file skipping — the metadata
  * axis the `_stats` min/max sidecars cannot serve: on a table whose
  * files are NOT clustered by the lookup key (the common case — hash
  * partitioning, arrival order), every file's [min, max] spans the whole
  * key domain and range pruning keeps everything, while a Bloom filter
  * still rules out every file the key is provably absent from. This is
  * the same role Delta's bloom-filter index and parquet's own
  * split-block blooms play; it is built here as a sidecar so it rides
  * the existing manifest snapshot lifecycle (GC of a version dir
  * collects its bloom with it; absence of a bloom always means "may
  * contain", never a wrong prune).
  *
  * Hashing is plain Scala on the CANONICAL STRING rendering of the
  * value (same rendering on the build and probe sides, so no
  * engine-internal hash function is involved): FNV-1a 64 over the UTF-8
  * bytes, with the classic Kirsch–Mitzenmacher double-hashing scheme
  * g_i(x) = h1(x) + i·h2(x) deriving the k probe positions from two
  * base hashes.
  *
  * Sizing: `bits` is per FILE (default 2^13 = 1 KiB of filter per
  * file). At ~1 % target false-positive rate the filter holds ~850 keys
  * per KiB; size it as `bits ≈ 10 × distinct keys per file` for large
  * files (a 1M-row, key-unique 128 MB file wants ~1.25 MB of filter —
  * still 1/100th of the file). A false positive only costs reading one
  * extra file; the residual predicate keeps correctness regardless.
  */
object BloomIndex {

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** FNV-1a 64 over UTF-8 bytes, with a seed folded into the offset
    * basis so one value yields two independent base hashes.
    */
  private def fnv1a(bytes: Array[Byte], seed: Long): Long = {
    var h = FnvOffset ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** The k bit positions of `value` in an m-bit filter. h2 is forced
    * odd so successive probes cycle through distinct positions even
    * when m is a power of two.
    */
  private[sources] def positions(value: String, k: Int, m: Int): Array[Int] = {
    val bytes = value.getBytes("UTF-8")
    val h1 = fnv1a(bytes, 0L)
    val h2 = fnv1a(bytes, 0x9e3779b97f4a7c15L) | 1L
    Array.tabulate(k) { i =>
      val g = h1 + i * h2
      // floorMod over the full long keeps the distribution unbiased
      java.lang.Math.floorMod(g, m.toLong).toInt
    }
  }

  /** Is `value` possibly in the filter? False ⇒ provably absent. */
  def mightContain(bits: Array[Long], k: Int, value: String): Boolean = {
    val m = bits.length * 64
    if (m == 0) return true // degenerate sidecar: never prune
    positions(value, k, m).forall { p =>
      (bits(p >>> 6) & (1L << (p & 63))) != 0L
    }
  }

  /** Fold canonical string values into one m-bit filter. Partial
    * aggregation is the bitwise OR merge — map-side combine applies and
    * the shuffle carries one fixed-width buffer per file regardless of
    * row count, the same sketch shape as MinHashAgg.
    */
  class BloomAgg(bits: Int, k: Int) extends Aggregator[String, Array[Long], Array[Long]] {
    require(bits % 64 == 0, "bloom size must be a multiple of 64 bits")

    override def zero: Array[Long] = new Array[Long](bits / 64)

    override def reduce(buf: Array[Long], value: String): Array[Long] = {
      if (value != null) {
        val ps = positions(value, k, bits)
        var i = 0
        while (i < ps.length) {
          buf(ps(i) >>> 6) |= 1L << (ps(i) & 63)
          i += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** One file's filter as stored in a `_bloom_<column>` sidecar. */
  final case class FileBloom(k: Int, bits: Array[Long])

  private val b64e = java.util.Base64.getEncoder
  private val b64d = java.util.Base64.getDecoder

  /** Sidecar wire format: one `relPath \t k \t m \t base64(bits)` line
    * per file; bits serialize big-endian long-by-long, and `m` (the
    * declared bit count) must match the decoded length EXACTLY — a
    * base64 payload torn at a decodable boundary would otherwise parse
    * as a shorter-but-plausible filter whose probes land on the wrong
    * bits and wrongly prune. A malformed line is dropped on read
    * (absence ⇒ keep the file — pruning must never rest on bytes that
    * didn't parse).
    */
  def encodeLine(relPath: String, fb: FileBloom): String = {
    val bb = java.nio.ByteBuffer.allocate(fb.bits.length * 8)
    fb.bits.foreach(bb.putLong)
    s"$relPath\t${fb.k}\t${fb.bits.length * 64}\t${b64e.encodeToString(bb.array())}"
  }

  def decodeLine(line: String): Option[(String, FileBloom)] =
    line.split('\t') match {
      case Array(f, kStr, mStr, b64) =>
        try {
          val k = kStr.toInt
          val m = mStr.toInt
          val raw = b64d.decode(b64)
          if (k <= 0 || m <= 0 || raw.length * 8 != m) None
          else {
            val bb = java.nio.ByteBuffer.wrap(raw)
            val bits = Array.fill(raw.length / 8)(bb.getLong)
            Some(f -> FileBloom(k, bits))
          }
        } catch { case _: IllegalArgumentException | _: NumberFormatException => None }
      case _ => None
    }

  /** Read a `_bloom_<column>` sidecar; absent or unreadable ⇒ empty
    * (prune nothing).
    */
  def read(fs: org.apache.hadoop.fs.FileSystem,
      sidecar: org.apache.hadoop.fs.Path): Map[String, FileBloom] = {
    if (!fs.exists(sidecar)) return Map.empty
    val in = fs.open(sidecar)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    txt.split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
      .flatMap(decodeLine).toMap
  }

  /** Write a sidecar via temp-file + rename: unlike the `_stats` sidecar
    * (written before its version's manifest commit, so a torn write
    * means the version never publishes), a bloom index is built LAZILY
    * against an already-committed snapshot — a torn in-place write
    * could decode to a valid-looking filter with missing bits and
    * wrongly prune. The rename makes the sidecar appear whole or not at
    * all.
    */
  def write(fs: org.apache.hadoop.fs.FileSystem,
      sidecar: org.apache.hadoop.fs.Path,
      blooms: Map[String, FileBloom]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(
      sidecar.getParent, s".${sidecar.getName}.tmp")
    val out = fs.create(tmp, true)
    try {
      val lines = blooms.toSeq.sortBy(_._1).map { case (f, fb) => encodeLine(f, fb) }
      out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    } finally out.close()
    if (!fs.rename(tmp, sidecar)) {
      fs.delete(sidecar, false)
      if (!fs.rename(tmp, sidecar))
        throw new java.io.IOException(s"cannot publish bloom sidecar $sidecar")
    }
  }
}
