package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Distributed ZIP extraction (reference: utils/api.py:96-139 — S2).
  * The reference downloads one ZIP per document and unzips it in the
  * driver loop; the distributed variant scans all landed ZIPs with the
  * `binaryFile` source and extracts matching members per-partition, so
  * a backfill over millions of archives parallelizes across the
  * cluster. The member payload stays binary until the CSV decode
  * (EdinetCsv handles the charset), and nothing touches the driver.
  */
object ZipExtract {

  val outSchema: StructType = StructType(Seq(
    StructField("archive", StringType, nullable = false),
    StructField("member", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Zip-slip guard: ZIP payloads are untrusted external content, and
    * the member name is later interpolated into a landing path — an
    * archive carrying `../../x/XBRL_TO_CSV/jpcrp1.csv` must not escape
    * the landing dir. Reject absolute names and any `.`/`..` path
    * segment (either separator).
    */
  private[sources] def safeMember(name: String): Boolean =
    !name.startsWith("/") && !name.startsWith("\\") &&
      !name.split("[/\\\\]").exists(s => s == ".." || s == ".")

  /** Scan `pathSpec` for *.zip and emit (archive, member, content) for
    * every member whose path matches `memberPattern` (reference keeps
    * `XBRL_TO_CSV/jpcrp*.csv`, api.py:124).
    */
  def extract(
      spark: SparkSession,
      pathSpec: String,
      memberPattern: String = "XBRL_TO_CSV/jpcrp.*\\.csv"): DataFrame = {
    val pat = memberPattern
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip")
      .option("recursiveFileLookup", "true")
      .load(pathSpec)
      .select(col("path"), col("content"))
      .mapPartitions { rows =>
        val regex = pat.r
        rows.flatMap { r =>
          val archive = r.getString(0)
          val zin = new ZipInputStream(
            new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          Iterator.continually(zin.getNextEntry)
            .takeWhile(_ != null)
            .filter(e => !e.isDirectory && safeMember(e.getName) &&
              regex.findFirstIn(e.getName).isDefined)
            .map(e => Row(archive, e.getName, zin.readAllBytes()))
            .toVector // materialize before the stream closes
        }
      }(encoder)
  }

  /** Write extracted members to a landing dir laid out like the
    * reference's `download/{doc_id}/XBRL_TO_CSV/x.csv`, ready for
    * EdinetCsv.readAuto. doc_id = archive file stem. Fully distributed:
    * each partition writes its members straight to the (shared)
    * filesystem via the Hadoop FS API — member payloads never visit
    * the driver, so a million-archive backfill lands in parallel.
    */
  def toLanding(extracted: DataFrame, landingDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = extracted.sparkSession
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    extracted
      .withColumn("doc_id",
        regexp_extract(element_at(split(col("archive"), "/"), -1), "(.+)\\.zip$", 1))
      .select("doc_id", "member", "content")
      .foreachPartition { rows: Iterator[Row] =>
        rows.foreach { r =>
          // defense in depth: re-check even if the caller bypassed
          // extract's filter — an unsafe name must never become a path
          require(safeMember(r.getString(1)) && !r.getString(0).contains(".."),
            s"unsafe archive member name: ${r.getString(1)}")
          val p = new org.apache.hadoop.fs.Path(
            s"$landingDir/${r.getString(0)}/${r.getString(1)}")
          val fs = p.getFileSystem(serConf.value)
          val out = fs.create(p, true)
          try out.write(r.getAs[Array[Byte]]("content")) finally out.close()
        }
      }
  }
}
