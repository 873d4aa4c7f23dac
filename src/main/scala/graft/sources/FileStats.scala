package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession

import java.util.Base64
import scala.jdk.CollectionConverters._

/** Per-file column min/max statistics for manifest-mode data skipping —
  * the file-pruning layer Delta/Iceberg keep in their metadata, built
  * here from the parquet FOOTERS the write already produced (no second
  * pass over the data; row-group stats are aggregated per file).
  *
  * Stored as a `_stats` sidecar inside each `_vN` version dir, so GC of
  * a version dir collects its stats with it and the manifest wire
  * format is untouched (old snapshots without sidecars simply never
  * prune — absence of stats always means "may contain").
  *
  * Scale: footer reads are distributed across executors when the
  * version has many files (the 100 TB case: thousands of files → one
  * ~8 KB footer read each, no data pages touched); the collected stats
  * are O(files × columns) strings on the driver — the same order as the
  * manifest file list itself. Pruning at read time is a driver-side
  * filter over that list; the pruned scan then reads only surviving
  * files. Parquet may truncate binary min/max (the truncated min is
  * still a lower bound, the truncated max still an upper bound), so
  * pruning on truncated stats remains safe, never exact — exactness
  * comes from the residual predicate `readSkipping` applies on top.
  */
object FileStats {

  /** One column's footer stats for one file. `typ` ∈
    * long|double|string|date|ts|tsntz|decimal; min/max are decimal
    * strings (numeric; `date` is epoch days, `ts`/`tsntz` micros,
    * `decimal` a plain unambiguous decimal string) or base64 UTF-8
    * (string).
    */
  final case class ColStat(typ: String, min: String, max: String)

  /** Typed bound wrappers for the temporal/decimal stat families.
    * Raw `Long` bounds keep meaning "plain integer" (the `long`
    * typ), so a date predicate can never be confused with an int
    * predicate anywhere in the prune stack: a layer that does not
    * recognize the wrapper falls through to keep — the safe
    * direction. Days/micros mirror Spark's internal Date/Timestamp
    * representations exactly (int32 days, int64 micros), which is
    * what makes these stats EXACT, unlike truncatable binary stats.
    */
  final case class DateDays(days: Long)
  final case class Micros(us: Long, utc: Boolean)

  /** One file's row-level footer stats: exact row count (always present
    * in a parquet footer) and per-column null counts (present only for
    * columns where EVERY row group recorded numNulls — absent means
    * "unknown", never zero). Powers metadata-only `count(*)` and
    * IS NULL / IS NOT NULL file pruning.
    */
  final case class RowStat(numRows: Long, nullCounts: Map[String, Long])

  private val b64e = Base64.getEncoder
  private val b64d = Base64.getDecoder

  /** Aggregate row-group stats of one parquet file into per-column
    * (typ, min, max). Only top-level primitive columns with usable
    * stats appear; anything else is skippable-never (absent ⇒ keep).
    * INT32/INT64 fold to `long`, FLOAT/DOUBLE to `double`, BINARY to
    * `string` (parquet annotates Spark strings as UTF8; byte order =
    * unsigned lexicographic, which is what `mayContain` compares).
    */
  def footerStats(conf: Configuration, absPath: String): Map[String, ColStat] =
    footerAll(conf, absPath)._1

  /** One footer open → BOTH stat families: per-column min/max (as
    * footerStats) and the file's RowStat (row count + null counts).
    */
  def footerAll(conf: Configuration,
      absPath: String): (Map[String, ColStat], RowStat) = {
    val in = HadoopInputFile.fromPath(new Path(absPath), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val acc = scala.collection.mutable.Map[String, (String, Any, Any)]()
      var statsComplete = Set[String]()
      var numRows = 0L
      val nulls = scala.collection.mutable.Map[String, Long]()
      var nullsBad = Set[String]()
      for (block <- reader.getFooter.getBlocks.asScala) numRows += block.getRowCount
      for (block <- reader.getFooter.getBlocks.asScala;
           col <- block.getColumns.asScala) {
        // null counts ride the same loop: a column's count is usable
        // only when every row group set numNulls — "absent" must mean
        // unknown, never a silent zero that would wrongly prune IS NULL
        locally {
          val path = col.getPath.toDotString
          if (!path.contains('.')) {
            val st = col.getStatistics
            if (st == null || !st.isNumNullsSet) nullsBad += path
            else nulls(path) = nulls.getOrElse(path, 0L) + st.getNumNulls
          }
        }
        val path = col.getPath.toDotString
        if (!path.contains('.')) {
          val st = col.getStatistics
          val ptn = col.getPrimitiveType.getPrimitiveTypeName
          // decimal/date/timestamp ride INT32/INT64 with ENCODED values
          // (unscaled units, days, micros) — comparing those against a
          // caller's raw bound can WRONGLY PRUNE (e.g. decimal(9,2)
          // 5.00 is stored as 500: file min 500 > upper bound 50 even
          // though the value 5 ≤ 50). Only plain ints are safe.
          val ann = col.getPrimitiveType.getLogicalTypeAnnotation
          val plainInt = ann == null || ann.isInstanceOf[
            org.apache.parquet.schema.LogicalTypeAnnotation.IntLogicalTypeAnnotation]
          if (st != null && st.hasNonNullValue) {
            import org.apache.parquet.schema.LogicalTypeAnnotation.{
              DateLogicalTypeAnnotation, DecimalLogicalTypeAnnotation,
              TimestampLogicalTypeAnnotation, TimeUnit}
            // decimal stats: unscaled int32/int64 (Spark's non-legacy
            // writer for precision ≤ 18) or signed-big-endian binary
            // (higher precision / legacy) — both exact under parquet's
            // TYPE_DEFINED signed comparator; normalized here to a
            // scale-free plain decimal string so mayContain compares
            // in BigDecimal space regardless of each file's scale
            def decStr(unscaled: java.math.BigInteger, scale: Int): String =
              new java.math.BigDecimal(unscaled, scale).toPlainString
            val tv: Option[(String, Any, Any)] = ptn match {
              case PrimitiveTypeName.INT32 if ann.isInstanceOf[DateLogicalTypeAnnotation] =>
                // int32 epoch days — Spark's internal DateType value;
                // footer stats are the exact min/max days
                Some(("date",
                  st.genericGetMin.asInstanceOf[java.lang.Integer].longValue,
                  st.genericGetMax.asInstanceOf[java.lang.Integer].longValue))
              case PrimitiveTypeName.INT64
                  if ann.isInstanceOf[TimestampLogicalTypeAnnotation] &&
                    ann.asInstanceOf[TimestampLogicalTypeAnnotation].getUnit != TimeUnit.NANOS =>
                // int64 micros (or millis ×1000 — exact either way:
                // a millis-stored value has no sub-milli component)
                val ta = ann.asInstanceOf[TimestampLogicalTypeAnnotation]
                val scale = if (ta.getUnit == TimeUnit.MILLIS) 1000L else 1L
                Some((if (ta.isAdjustedToUTC) "ts" else "tsntz",
                  st.genericGetMin.asInstanceOf[java.lang.Long].longValue * scale,
                  st.genericGetMax.asInstanceOf[java.lang.Long].longValue * scale))
              case PrimitiveTypeName.INT32 if ann.isInstanceOf[DecimalLogicalTypeAnnotation] =>
                val sc = ann.asInstanceOf[DecimalLogicalTypeAnnotation].getScale
                Some(("decimal",
                  decStr(java.math.BigInteger.valueOf(
                    st.genericGetMin.asInstanceOf[java.lang.Integer].longValue), sc),
                  decStr(java.math.BigInteger.valueOf(
                    st.genericGetMax.asInstanceOf[java.lang.Integer].longValue), sc)))
              case PrimitiveTypeName.INT64 if ann.isInstanceOf[DecimalLogicalTypeAnnotation] =>
                val sc = ann.asInstanceOf[DecimalLogicalTypeAnnotation].getScale
                Some(("decimal",
                  decStr(java.math.BigInteger.valueOf(
                    st.genericGetMin.asInstanceOf[java.lang.Long].longValue), sc),
                  decStr(java.math.BigInteger.valueOf(
                    st.genericGetMax.asInstanceOf[java.lang.Long].longValue), sc)))
              case PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY | PrimitiveTypeName.BINARY
                  if ann.isInstanceOf[DecimalLogicalTypeAnnotation] =>
                val sc = ann.asInstanceOf[DecimalLogicalTypeAnnotation].getScale
                val bs = st.asInstanceOf[org.apache.parquet.column.statistics.BinaryStatistics]
                Some(("decimal",
                  decStr(new java.math.BigInteger(bs.genericGetMin.getBytes), sc),
                  decStr(new java.math.BigInteger(bs.genericGetMax.getBytes), sc)))
              case PrimitiveTypeName.INT32 if plainInt =>
                Some(("long",
                  st.genericGetMin.asInstanceOf[java.lang.Integer].longValue,
                  st.genericGetMax.asInstanceOf[java.lang.Integer].longValue))
              case PrimitiveTypeName.INT64 if plainInt =>
                Some(("long",
                  st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
                  st.genericGetMax.asInstanceOf[java.lang.Long].longValue))
              case PrimitiveTypeName.FLOAT =>
                Some(("double",
                  st.genericGetMin.asInstanceOf[java.lang.Float].doubleValue,
                  st.genericGetMax.asInstanceOf[java.lang.Float].doubleValue))
              case PrimitiveTypeName.DOUBLE =>
                Some(("double",
                  st.genericGetMin.asInstanceOf[java.lang.Double].doubleValue,
                  st.genericGetMax.asInstanceOf[java.lang.Double].doubleValue))
              case PrimitiveTypeName.BINARY
                  if col.getPrimitiveType.getLogicalTypeAnnotation != null &&
                    col.getPrimitiveType.getLogicalTypeAnnotation.toString == "STRING" =>
                Some(("string",
                  st.asInstanceOf[org.apache.parquet.column.statistics.BinaryStatistics]
                    .genericGetMin.getBytes,
                  st.asInstanceOf[org.apache.parquet.column.statistics.BinaryStatistics]
                    .genericGetMax.getBytes))
              case _ => None
            }
            tv.foreach { case (typ, mn, mx) =>
              statsComplete += path
              acc.get(path) match {
                case None => acc(path) = (typ, mn, mx)
                case Some((t, m0, m1)) =>
                  acc(path) = (t, minOf(t, m0, mn), maxOf(t, m1, mx))
              }
            }
          }
        }
      }
      // a column missing stats in ANY row group has no file-level bound
      val cols = acc.toMap.collect {
        case (p, (typ, mn, mx)) if statsComplete(p) && blockCount(reader) == blocksWith(reader, p) =>
          p -> ColStat(typ, enc(typ, mn), enc(typ, mx))
      }
      (cols, RowStat(numRows, (nulls -- nullsBad).toMap))
    } finally reader.close()
  }

  private def blockCount(r: ParquetFileReader): Int = r.getFooter.getBlocks.size
  private def blocksWith(r: ParquetFileReader, path: String): Int =
    r.getFooter.getBlocks.asScala.count(_.getColumns.asScala.exists(c =>
      c.getPath.toDotString == path && c.getStatistics != null &&
        c.getStatistics.hasNonNullValue))

  private def minOf(typ: String, a: Any, b: Any): Any = typ match {
    case "long" | "date" | "ts" | "tsntz" =>
      math.min(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case "double" => math.min(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case "decimal" =>
      if (new java.math.BigDecimal(a.asInstanceOf[String])
        .compareTo(new java.math.BigDecimal(b.asInstanceOf[String])) <= 0) a else b
    case _ =>
      if (cmpBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]]) <= 0) a else b
  }
  private def maxOf(typ: String, a: Any, b: Any): Any = typ match {
    case "long" | "date" | "ts" | "tsntz" =>
      math.max(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case "double" => math.max(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case "decimal" =>
      if (new java.math.BigDecimal(a.asInstanceOf[String])
        .compareTo(new java.math.BigDecimal(b.asInstanceOf[String])) >= 0) a else b
    case _ =>
      if (cmpBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]]) >= 0) a else b
  }

  /** Unsigned lexicographic byte compare — parquet's binary stat order
    * (= UTF-8 code-point order, matching Spark's string ordering).
    * Shared with Warehouse's partition-path pruning and statsMinMax so
    * every string comparison in the skipping layer uses ONE order.
    */
  private[sources] def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private def enc(typ: String, v: Any): String = typ match {
    case "string" => b64e.encodeToString(v.asInstanceOf[Array[Byte]])
    case _        => v.toString
  }

  /** Collect stats for a version's data files. Driver-side for small
    * versions; distributed footer reads (hadoop conf rebuilt from
    * broadcast entries — public API only) above `distributedThreshold`.
    */
  def collect(spark: SparkSession, versionDir: String, relFiles: Seq[String],
      distributedThreshold: Int = 64): Map[String, Map[String, ColStat]] =
    collectAll(spark, versionDir, relFiles, distributedThreshold)
      .map { case (f, (cols, _)) => f -> cols }

  /** Both stat families from ONE footer pass per file (min/max for the
    * `_stats` sidecar, row/null counts for `_rows`). The broadcast
    * conf is filtered to the filesystem/IO keys a footer read needs
    * (fs./dfs./io./hadoop./parquet.) — a secured cluster's unrelated
    * credential and service entries stay on the driver.
    */
  def collectAll(spark: SparkSession, versionDir: String, relFiles: Seq[String],
      distributedThreshold: Int = 64): Map[String, (Map[String, ColStat], RowStat)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val parquetFiles = relFiles.filter(_.endsWith(".parquet"))
    if (parquetFiles.size <= distributedThreshold) {
      if (parquetFiles.size <= 2)
        parquetFiles.map(f => f -> footerAll(conf, s"$versionDir/$f")).toMap
      else {
        // driver-side but CONCURRENT: each footer open is an
        // independent ~ms metadata read, and a 30-file version read
        // sequentially was a measurable slice of every commit (guide
        // §2.6 overlap — no Spark job needed at this size)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(8, parquetFiles.size))
        try parquetFiles.map { f =>
          f -> pool.submit(new java.util.concurrent.Callable[
            (Map[String, ColStat], RowStat)] {
            def call(): (Map[String, ColStat], RowStat) =
              footerAll(conf, s"$versionDir/$f")
          })
        }.map { case (f, fut) =>
          f -> (try fut.get() catch {
            case e: java.util.concurrent.ExecutionException =>
              throw Option(e.getCause).getOrElse(e)
          })
        }.toMap
        finally pool.shutdown()
      }
    } else {
      val keep = Seq("fs.", "dfs.", "io.", "hadoop.", "parquet.")
      val entries = conf.iterator().asScala.map(e => e.getKey -> e.getValue)
        .filter { case (k, _) => keep.exists(k.startsWith) }.toVector
      val bc = spark.sparkContext.broadcast(entries)
      spark.sparkContext.parallelize(parquetFiles, math.max(1, parquetFiles.size / 16))
        .map { f =>
          val c = new Configuration(false)
          bc.value.foreach { case (k, v) => c.set(k, v) }
          f -> footerAll(c, s"$versionDir/$f")
        }
        .collect().toMap
    }
  }

  /** Sidecar wire format: one `relPath \t col \t typ \t min \t max` line
    * per (file, column); values never contain tabs (numerics are
    * decimal, strings base64).
    */
  def write(fs: FileSystem, sidecar: Path,
      stats: Map[String, Map[String, ColStat]]): Unit = {
    val lines = for {
      (f, cols) <- stats.toSeq.sortBy(_._1)
      (c, s) <- cols.toSeq.sortBy(_._1)
    } yield s"$f\t$c\t${s.typ}\t${s.min}\t${s.max}"
    val out = fs.create(sidecar, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** `_rows` sidecar wire format, one record per line distinguished by
    * arity: `relPath \t numRows` (2 fields, exact file row count) and
    * `relPath \t col \t nullCount` (3 fields, one per column whose
    * null count is known). Tabs cannot occur in paths or column names.
    */
  def writeRows(fs: FileSystem, sidecar: Path,
      rows: Map[String, RowStat]): Unit = {
    val lines = rows.toSeq.sortBy(_._1).flatMap { case (f, rs) =>
      s"$f\t${rs.numRows}" +:
        rs.nullCounts.toSeq.sortBy(_._1).map { case (c, n) => s"$f\t$c\t$n" }
    }
    val out = fs.create(sidecar, true)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Per-PARTITION sidecar shards alongside the monolithic files:
    * `_stats_p/<first path segment>` and `_rows_p/<segment>` (root
    * files shard under "-"). The monolithic `_stats`/`_rows` stay the
    * read surface for whole-version consumers; the shards exist so a
    * partition-scoped commit (rewriting the chunks one upsert
    * touches) parses the TOUCHED partition's stats instead of the
    * whole version dir's — the O(version-size) residual the commit
    * sweep measured. Hive segments are already path-escaped (%XX), so
    * a segment is a safe file name.
    */
  private def shardKey(relFile: String): String = {
    val i = relFile.indexOf('/')
    if (i < 0) "-" else relFile.substring(0, i)
  }

  def writeSharded(fs: FileSystem, vdir: Path,
      stats: Map[String, Map[String, ColStat]],
      rows: Map[String, RowStat]): Unit = {
    val keys = (stats.keySet ++ rows.keySet).groupBy(shardKey)
    // single-shard versions (unpartitioned, or one partition) gain
    // nothing over the monolithic files — skip the duplication
    if (keys.size <= 1) return
    keys.foreach { case (seg, files) =>
      write(fs, new Path(new Path(vdir, "_stats_p"), seg),
        files.toSeq.flatMap(f => stats.get(f).map(f -> _)).toMap)
      writeRows(fs, new Path(new Path(vdir, "_rows_p"), seg),
        files.toSeq.flatMap(f => rows.get(f).map(f -> _)).toMap)
    }
  }

  /** Shard-or-monolith reads: the shard file if the shard DIR exists
    * (post-round-11 versions), else the whole monolithic sidecar —
    * absent either way means unknown, exactly the monolithic
    * contract. Callers memoize per (vdir, segment).
    */
  def readShard(fs: FileSystem, vdir: Path,
      seg: String): Option[Map[String, Map[String, ColStat]]] = {
    val dir = new Path(vdir, "_stats_p")
    if (!fs.exists(dir)) None
    else Some(read(fs, new Path(dir, seg)))
  }

  def readRowsShard(fs: FileSystem, vdir: Path,
      seg: String): Option[Map[String, RowStat]] = {
    val dir = new Path(vdir, "_rows_p")
    if (!fs.exists(dir)) None
    else Some(readRows(fs, new Path(dir, seg)))
  }

  def shardKeyOf(relFile: String): String = shardKey(relFile)

  /** Read a `_rows` sidecar; absent ⇒ empty (counts unknown — callers
    * must fall back to scanning, never assume zero).
    */
  def readRows(fs: FileSystem, sidecar: Path): Map[String, RowStat] = {
    if (!fs.exists(sidecar)) return Map.empty
    val in = fs.open(sidecar)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val recs = txt.split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
      .map(_.split('\t'))
    val counts = recs.collect { case Array(f, n) => f -> n.toLong }.toMap
    val nulls = recs.collect { case Array(f, c, n) => (f, c, n.toLong) }
      .groupBy(_._1).map { case (f, rows) =>
        f -> rows.map(r => r._2 -> r._3).toMap
      }
    counts.map { case (f, n) =>
      f -> RowStat(n, nulls.getOrElse(f, Map.empty))
    }
  }

  /** Read a `_stats` sidecar; absent sidecar ⇒ empty (prune nothing). */
  def read(fs: FileSystem, sidecar: Path): Map[String, Map[String, ColStat]] = {
    if (!fs.exists(sidecar)) return Map.empty
    val in = fs.open(sidecar)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    txt.split('\n').toSeq.map(_.trim).filter(_.nonEmpty).flatMap { line =>
      line.split('\t') match {
        case Array(f, c, t, mn, mx) => Some((f, c, ColStat(t, mn, mx)))
        case _                      => None
      }
    }.groupBy(_._1).map { case (f, rows) =>
      f -> rows.map(r => r._2 -> r._3).toMap
    }
  }

  /** Can a file with these stats contain a value in [lower, upper]
    * (either bound open)? Errs to `true` on any type mismatch — pruning
    * must never drop a file it can't prove empty. The temporal/decimal
    * typs compare ONLY against their matching wrapper bound (DateDays /
    * Micros with the same utc-ness / BigDecimal): a raw Long probing a
    * `date` stat keeps the file — epoch days and plain ints live in
    * the same value space but mean different things.
    */
  def mayContain(cs: ColStat, lower: Option[Any], upper: Option[Any]): Boolean =
    try cs.typ match {
      case "long" =>
        val mn = cs.min.toLong; val mx = cs.max.toLong
        lower.forall(l => mx >= toLong(l)) && upper.forall(u => mn <= toLong(u))
      case "date" =>
        val mn = cs.min.toLong; val mx = cs.max.toLong
        def d(v: Any): Option[Long] = v match {
          case DateDays(days) => Some(days); case _ => None
        }
        lower.forall(l => d(l).forall(mx >= _)) &&
          upper.forall(u => d(u).forall(mn <= _))
      case "ts" | "tsntz" =>
        val mn = cs.min.toLong; val mx = cs.max.toLong
        val wantUtc = cs.typ == "ts"
        def m(v: Any): Option[Long] = v match {
          case Micros(us, utc) if utc == wantUtc => Some(us); case _ => None
        }
        lower.forall(l => m(l).forall(mx >= _)) &&
          upper.forall(u => m(u).forall(mn <= _))
      case "decimal" =>
        val mn = new java.math.BigDecimal(cs.min)
        val mx = new java.math.BigDecimal(cs.max)
        def bd(v: Any): Option[java.math.BigDecimal] = v match {
          case b: java.math.BigDecimal => Some(b); case _ => None
        }
        lower.forall(l => bd(l).forall(mx.compareTo(_) >= 0)) &&
          upper.forall(u => bd(u).forall(mn.compareTo(_) <= 0))
      case "double" =>
        val mn = cs.min.toDouble; val mx = cs.max.toDouble
        lower.forall(l => mx >= toDouble(l)) && upper.forall(u => mn <= toDouble(u))
      case "string" =>
        val mn = b64d.decode(cs.min); val mx = b64d.decode(cs.max)
        val lo = lower.map(v => v.toString.getBytes("UTF-8"))
        val hi = upper.map(v => v.toString.getBytes("UTF-8"))
        lo.forall(l => cmpBytes(mx, l) >= 0) && hi.forall(u => cmpBytes(mn, u) <= 0)
      case _ => true
    } catch { case _: NumberFormatException | _: IllegalArgumentException => true }

  private def toLong(v: Any): Long = v match {
    case n: Number => n.longValue
    case s: String => s.toLong
    case other     => other.toString.toLong
  }
  private def toDouble(v: Any): Double = v match {
    case n: Number => n.doubleValue
    case s: String => s.toDouble
    case other     => other.toString.toDouble
  }
}
