package graft.sources

import java.io.InputStream
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Model

/** Distributed scan of EDINET XBRL-to-CSV filings (reference:
  * utils/api.py:96-139, scripts/bypass_import_csv.py:57-78 — S3/S4/S5).
  *
  * The reference loops file-by-file with runtime chardet sniffing; here
  * ONE distributed CSV scan per physical encoding variant replaces the
  * loop, with `input_file_name()` as the document key (S5) and file row
  * order captured so downstream "first match wins" extraction is
  * deterministic.
  *
  * Physical variants, same logical schema (FIXTURES.md §1):
  *  - raw downloads: UTF-16LE, tab-delimited, quoted
  *  - golden files:  UTF-8 with BOM, comma-delimited
  *  - stray legacy exports: Shift-JIS, comma-delimited
  * A cheap driver-side sniff (BOM / odd-zero bytes / strict-decode
  * probe — the distributed analogue of chardet.detect) classifies each
  * file; mixed directories are read as one scan per variant, unioned
  * (encoding is a per-scan option, not per-file — so group by variant,
  * not per-file Python loops). Unrecognized encodings fail loudly.
  */
object EdinetCsv {

  sealed trait Variant { def encoding: String; def sep: String }
  case object Utf16Tab extends Variant { val encoding = "UTF-16LE"; val sep = "\t" }
  case object Utf8Comma extends Variant { val encoding = "UTF-8"; val sep = "," }
  // stray legacy exports: Shift-JIS (superset windows-31j), comma
  case object SjisComma extends Variant { val encoding = "windows-31j"; val sep = "," }

  /** Strict decode probe. `truncatedTail = true` means the buffer is a
    * prefix of a larger file (a full 8 KiB head), so a multi-byte char
    * cut at the very end must count as underflow, not malformed —
    * `decode(in, out, endOfInput = false)` gives exactly that. With
    * `truncatedTail = false` the buffer is the whole file and an
    * incomplete trailing sequence IS malformed (decode with
    * endOfInput = true, then flush).
    */
  private def strictDecodes(bytes: Array[Byte], charset: String,
      truncatedTail: Boolean): Boolean = {
    val dec = java.nio.charset.Charset.forName(charset).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val in = java.nio.ByteBuffer.wrap(bytes)
    val out = java.nio.CharBuffer.allocate(bytes.length + 1)
    val res = dec.decode(in, out, !truncatedTail)
    if (res.isError) false
    else if (truncatedTail) true
    else !dec.flush(out).isError
  }

  /** Classify an up-to-8-KiB head — the encoding decision itself, a
    * pure bytes→variant function so it runs on executors (readAuto) and
    * on the driver (sniff) identically. BOM / odd-zero checks pick out
    * the two EDINET variants from 4 bytes; otherwise a strict decode of
    * the head distinguishes UTF-8 from Shift-JIS strays (a
    * UTF-8-invalid, Shift-JIS-valid head). `truncatedTail = true` means
    * the head is a PREFIX of a larger file, so a multi-byte char cut at
    * the buffer edge counts as underflow, not malformed (a hard chop
    * would misfire when the head ends on a COMPLETE char — common for
    * dense 2-byte Japanese text). A head valid as neither fails
    * LOUDLY — silently mis-decoding into PERMISSIVE nulls is the
    * failure mode this guards against.
    */
  private[sources] def classify(head: Array[Byte], truncatedTail: Boolean,
      file: String): Variant = {
    val n = head.length
    if (n >= 2 && head(0) == 0xFF.toByte && head(1) == 0xFE.toByte) Utf16Tab
    // UTF-16LE without BOM: ASCII-range chars put 0x00 in odd bytes
    else if (n >= 4 && head(1) == 0x00.toByte && head(3) == 0x00.toByte) Utf16Tab
    else if (strictDecodes(head, "UTF-8", truncatedTail)) Utf8Comma
    else if (strictDecodes(head, "windows-31j", truncatedTail)) SjisComma
    else throw new IllegalArgumentException(
      s"unrecognized encoding (not UTF-16LE/UTF-8/Shift-JIS): $file")
  }

  private def variantByName(name: String): Variant = name match {
    case "Utf16Tab" => Utf16Tab
    case "Utf8Comma" => Utf8Comma
    case "SjisComma" => SjisComma
    // a wildcard default would silently mis-decode a future variant —
    // the exact failure mode classify exists to prevent
    case other => throw new IllegalArgumentException(s"unknown variant: $other")
  }

  /** 8-KiB head read + classify against an explicit hadoop conf — the
    * shared core of the driver-side sniff and readAuto's executor-side
    * distributed sniff. Reads ONLY the head, whatever the file size.
    * The buffer is 8 KiB + 1: the extra byte distinguishes "file is
    * exactly 8 KiB" (whole file read → strict tail decode catches a
    * malformed trailing sequence) from "file is larger" (head is a
    * prefix → an edge-cut multi-byte char is underflow, not malformed).
    */
  private def sniffWith(conf: org.apache.hadoop.conf.Configuration,
      file: String): Variant = {
    val path = new Path(file)
    val fs = path.getFileSystem(conf)
    var in: InputStream = null
    try {
      in = fs.open(path)
      val buf = new Array[Byte](8193)
      // readNBytes, not read: a short read (HDFS may return partial
      // buffers) could cut a multi-byte char and fail the UTF-8 probe
      val n = in.readNBytes(buf, 0, buf.length)
      classify(java.util.Arrays.copyOf(buf, math.min(math.max(0, n), 8192)),
        truncatedTail = n == buf.length, file)
    } finally if (in != null) in.close()
  }

  /** Sniff the encoding of one file on the driver — the analogue of the
    * reference's per-file chardet.detect (utils/api.py:129-137).
    */
  def sniff(spark: SparkSession, file: String): Variant =
    sniffWith(spark.sparkContext.hadoopConfiguration, file)

  /** One distributed scan of a glob/dir of filings in a single physical
    * variant. Adds `doc_id` (parent directory name = EDINET document
    * id, from input_file_name) and `_rid` (per-file row order).
    */
  def read(spark: SparkSession, pathSpec: String, variant: Variant): DataFrame =
    readPaths(spark, Seq(pathSpec), variant)

  /** The scan itself, over explicit paths (dirs, globs, or files). */
  def readPaths(spark: SparkSession, paths: Seq[String], variant: Variant): DataFrame = {
    // Spark 4 allowlists CSV charsets; windows-31j needs the legacy
    // java-charsets escape hatch (guarded set, same as Tables.load)
    if (variant == SjisComma &&
        !spark.conf.getOption("spark.sql.legacy.javaCharsets").contains("true"))
      spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    val raw = spark.read
      .schema(Model.rawSchema)
      .option("header", "true")
      .option("sep", variant.sep)
      .option("encoding", variant.encoding)
      // whole-file decoding for EVERY variant: (a) the default line
      // splitter cuts on 0x0A bytes, which shreds UTF-16; (b) a split
      // file would get partition-order _rid values, breaking the
      // first-match-wins contract. Filings are small files, so
      // parallelism comes from the many-files layout, one per filing.
      .option("multiLine", "true")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.csv")
      .option("mode", "PERMISSIVE")
      .csv(paths: _*)
    withDocColumns(raw)
  }

  /** doc key: .../download/{doc_id}/XBRL_TO_CSV/file.csv → {doc_id}
    * (falls back to the file name for flat layouts), plus `_rid`
    * preserving in-file row order for first-match-wins extraction.
    * Shared by the batch and streaming readers.
    */
  def withDocColumns(raw: DataFrame): DataFrame = {
    val segs = split(input_file_name(), "/")
    // the EDINET layout marker decides: {doc_id}/XBRL_TO_CSV/file.csv →
    // grandparent dir; anything else (flat layout) → the file name
    // itself. (input_file_name is a URI, so a bare size() check would
    // always pick the nested branch and collapse flat files onto one
    // shared doc_id.)
    val docFromDir = when(element_at(segs, -2) === "XBRL_TO_CSV", element_at(segs, -3))
      .otherwise(regexp_replace(element_at(segs, -1), "\\.csv$", ""))
    raw
      .withColumn("doc_id", docFromDir)
      .withColumn("_rid", monotonically_increasing_id())
  }

  /** Sniff EVERY csv under the path and run one scan per encoding
    * variant, unioned — a landing dir mixing UTF-16LE raw downloads
    * with UTF-8 golden files decodes each file correctly (encoding is a
    * per-scan option; a single-variant guess would silently shred the
    * other variant into PERMISSIVE nulls).
    *
    * The sniff is DISTRIBUTED and BOUNDED: the (driver-side) listing —
    * which the scan needs anyway — is parallelized to the executors,
    * each task opens its files and reads ONLY an 8 KiB head (a
    * binaryFile scan would materialize whole files just to classify 4
    * bytes — a multi-GB stray would OOM the task), and the driver
    * collects one tiny (path, variant) row per file instead of doing a
    * sequential open+read per file (the round-3 listing-scale
    * bottleneck). The executor rebuilds the hadoop conf from a
    * broadcast property snapshot, so custom filesystem settings
    * survive the trip.
    */
  def readAuto(spark: SparkSession, pathSpec: String): DataFrame = {
    val path = new Path(pathSpec)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // globStatus first: listFiles does not expand globs, and readPaths'
    // contract (dirs, globs, or files) must hold here too
    val roots = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Nil)
    // skip dot/underscore names at EVERY level (the filter Spark's own
    // file index applies): a `_temporary` tree from a crashed write or
    // a `._filing.csv` AppleDouble fork must not reach the classifier
    def hidden(n: String) = n.startsWith(".") || n.startsWith("_")
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    // the filter applies to CHILDREN only — an explicitly-passed root
    // is the user's choice, exactly as Spark's file index behaves
    def walk(st: org.apache.hadoop.fs.FileStatus, isRoot: Boolean): Unit =
      if (isRoot || !hidden(st.getPath.getName)) {
        if (st.isDirectory) fs.listStatus(st.getPath).foreach(walk(_, false))
        else if (st.getPath.getName.endsWith(".csv")) files += st.getPath.toString
      }
    roots.foreach(walk(_, true))
    if (files.isEmpty) return read(spark, pathSpec, Utf8Comma)
    val confProps = {
      val conf = spark.sparkContext.hadoopConfiguration
      val b = Vector.newBuilder[(String, String)]
      val e = conf.iterator()
      while (e.hasNext) { val kv = e.next(); b += ((kv.getKey, kv.getValue)) }
      b.result()
    }
    val bc = spark.sparkContext.broadcast(confProps)
    val slices = math.min(256, math.max(1, files.size / 64))
    val classified = spark.sparkContext
      .parallelize(files.toSeq, slices)
      .mapPartitions { part =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        bc.value.foreach { case (k, v) => conf.set(k, v) }
        part.map(f => (f, sniffWith(conf, f).toString))
      }
      .collect()
    classified.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (name, group) =>
        readPaths(spark, group.map(_._1).toSeq, variantByName(name)) }
      .reduce(_.unionByName(_))
  }
}
