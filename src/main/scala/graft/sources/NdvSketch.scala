package graft.sources

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-file HyperLogLog sketches for metadata-only approximate
  * distinct counts — the NDV axis of the sidecar family (`_stats` =
  * min/max, `_rows` = counts/nulls, `_bloom_<col>` = membership,
  * `_ndv_<col>` = cardinality). Iceberg ships the same statistic as
  * theta sketches in puffin files; the use is identical: a planner (or
  * an operator sizing a join/aggregation) asks "how many distinct keys
  * does this column hold?" and gets an answer from kilobytes of
  * metadata instead of a table scan.
  *
  * HLL is the right sketch here because registers merge by elementwise
  * MAX — associative and idempotent — so per-FILE sketches built once
  * at index time compose into a per-snapshot estimate at read time for
  * free, stay valid under compaction (re-built with the new version),
  * and a 100 TB table's NDV is answered from |files| × 2^p bytes of
  * sidecar.
  *
  * Determinism: hashing is the same canonical-string discipline as
  * BloomIndex (FNV-1a 64 over UTF-8 bytes), finalized through the
  * splitmix64 avalanche so register indexing and rank extraction see
  * uniform bits. Everything is integer/bit math — the same value
  * stream yields the same registers on every engine and every run.
  * Accuracy at p=12 (4096 registers, 4 KiB/file): ~1.6 % standard
  * error.
  */
object NdvSketch {

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private[sources] def hash(value: String): Long = {
    val bytes = value.getBytes("UTF-8")
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    splitmix64(h)
  }

  /** Fold canonical string values into 2^p HLL registers. */
  class HllAgg(p: Int) extends Aggregator[String, Array[Byte], Array[Byte]] {
    require(p >= 4 && p <= 16, "HLL precision must be in [4,16]")
    private val m = 1 << p

    override def zero: Array[Byte] = new Array[Byte](m)

    override def reduce(buf: Array[Byte], value: String): Array[Byte] = {
      if (value != null) {
        val h = hash(value)
        val idx = (h >>> (64 - p)).toInt
        // rank = leading-zero count of the remaining 64-p bits, + 1;
        // shifting the index bits out left keeps the count in-range
        val rest = h << p
        val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
        if (rank > (buf(idx) & 0xff)) buf(idx) = rank.toByte
      }
      buf
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) {
        if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
        i += 1
      }
      a
    }

    override def finish(buf: Array[Byte]): Array[Byte] = buf

    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge register sets (elementwise max). Arrays must share p. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, "cannot merge sketches of different precision")
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) {
      out(i) = if ((b(i) & 0xff) > (a(i) & 0xff)) b(i) else a(i)
      i += 1
    }
    out
  }

  /** Standard HLL estimate with the small-range linear-counting
    * correction (64-bit hash ⇒ no large-range correction needed).
    */
  def estimate(registers: Array[Byte]): Long = {
    val m = registers.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = registers(i) & 0xff
      invSum += java.lang.Math.scalb(1.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / invSum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.round(corrected)
  }

  private val b64e = java.util.Base64.getEncoder
  private val b64d = java.util.Base64.getDecoder

  /** Sidecar wire format (`_ndv_<column>`): one
    * `relPath \t m \t base64(registers)` line per file; the declared
    * register count must match the decoded length exactly (the
    * BloomIndex torn-write rule). Malformed lines drop on read —
    * a missing entry degrades the snapshot estimate to "unknown",
    * never to a wrong number presented as known.
    */
  def encodeLine(relPath: String, registers: Array[Byte]): String =
    s"$relPath\t${registers.length}\t${b64e.encodeToString(registers)}"

  def decodeLine(line: String): Option[(String, Array[Byte])] =
    line.split('\t') match {
      case Array(f, mStr, b64) =>
        try {
          val m = mStr.toInt
          val raw = b64d.decode(b64)
          if (m <= 0 || raw.length != m) None else Some(f -> raw)
        } catch { case _: IllegalArgumentException | _: NumberFormatException => None }
      case _ => None
    }

  def read(fs: org.apache.hadoop.fs.FileSystem,
      sidecar: org.apache.hadoop.fs.Path): Map[String, Array[Byte]] = {
    if (!fs.exists(sidecar)) return Map.empty
    val in = fs.open(sidecar)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    txt.split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
      .flatMap(decodeLine).toMap
  }

  /** Temp+rename publish, same rationale as BloomIndex.write: the
    * sketch is built lazily against a committed snapshot, so the
    * sidecar must appear whole or not at all.
    */
  def write(fs: org.apache.hadoop.fs.FileSystem,
      sidecar: org.apache.hadoop.fs.Path,
      sketches: Map[String, Array[Byte]]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(
      sidecar.getParent, s".${sidecar.getName}.tmp")
    val out = fs.create(tmp, true)
    try {
      val lines = sketches.toSeq.sortBy(_._1).map { case (f, r) => encodeLine(f, r) }
      out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    } finally out.close()
    if (!fs.rename(tmp, sidecar)) {
      fs.delete(sidecar, false)
      if (!fs.rename(tmp, sidecar))
        throw new java.io.IOException(s"cannot publish ndv sidecar $sidecar")
    }
  }
}
