package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EDINET document-list handling (reference: utils/api.py:29-93 —
  * S1/S6/P9/P10). The reference GETs `documents.json` per submission
  * date and loops rows in the driver; here the HTTP fetch stays a thin
  * driver-side landing step (out of scope in a zero-egress build) and
  * everything after it is a distributed scan of the landed responses:
  * one `spark.read.json` over `landing/{date}.json` files replaces the
  * per-date Python calls.
  */
object EdinetApi {

  /** Pluggable first hop (reference: utils/api.py:45-139 GETs the
    * document list and each filing's ZIP). A real deployment implements
    * this with an HTTP client landing responses into a directory the
    * distributed scans read; this build ships [[LandedFetcher]] (the
    * zero-egress case: everything already landed). Swapping
    * implementations changes no downstream plan — the scans only ever
    * see the landing directory.
    */
  trait Fetcher {
    /** Land the document list for one submission date; returns the
      * landed documents.json path (api.py:45-77 contract).
      */
    def fetchDocumentList(date: java.time.LocalDate): String

    /** Land one filing's ZIP archive; returns the landed zip path
      * (api.py:96-127 contract).
      */
    def fetchArchive(docId: String): String
  }

  /** The no-network implementation: resolves paths inside an existing
    * landing directory and fails fast when the expected file was never
    * landed (the analogue of an HTTP 404).
    */
  final class LandedFetcher(spark: SparkSession, landingDir: String) extends Fetcher {
    private def requireLanded(p: String): String = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path))
        throw new java.io.FileNotFoundException(s"not landed: $p")
      p
    }
    def fetchDocumentList(date: java.time.LocalDate): String =
      requireLanded(s"$landingDir/$date.json")
    def fetchArchive(docId: String): String =
      requireLanded(s"$landingDir/$docId.zip")
  }

  /** Shape of one entry of documents.json `results` (the fields the
    * reference touches, api.py:79-93).
    */
  val resultSchema: StructType = StructType(Seq(
    StructField("docID", StringType),
    StructField("edinetCode", StringType),
    StructField("filerName", StringType),
    StructField("docDescription", StringType),
    StructField("submitDateTime", StringType),
    StructField("docTypeCode", StringType)))

  val responseSchema: StructType = StructType(Seq(
    StructField("metadata", StructType(Seq(
      StructField("title", StringType),
      StructField("status", StringType)))),
    StructField("results", ArrayType(resultSchema))))

  /** All landed document-list responses → one row per document. */
  def documentList(spark: SparkSession, landingDir: String): DataFrame =
    spark.read
      .schema(responseSchema)
      .option("multiLine", "true")
      .json(landingDir)
      .select(explode(col("results")).as("r"))
      .select(col("r.*"))

  /** P9: keep only quarterly reports (docDescription contains
    * 四半期報告書, api.py:81-83).
    */
  def quarterlyReports(docs: DataFrame): DataFrame =
    docs.filter(col("docDescription").contains("四半期報告書"))

  /** P10: docID for a company name; error if absent (api.py:29-42's
    * ValueError contract).
    */
  def docIdFor(docs: DataFrame, filerName: String): String = {
    val hit = docs.filter(col("filerName") === filerName)
      .select("docID").limit(1).collect()
    if (hit.isEmpty)
      throw new NoSuchElementException(s"no document found for filer: $filerName")
    hit.head.getString(0)
  }
}
