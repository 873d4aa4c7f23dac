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

  /** The live first hop: java.net.http GETs against an EDINET-shaped
    * API (reference: utils/api.py:45-139), landing each response into
    * `landingDir` so everything downstream stays the same distributed
    * landing-dir scan as with [[LandedFetcher]]. Contract parity:
    *
    *  - per-request timeout, default 30 s (api.py:62's
    *    `requests.get(..., timeout=30)`)
    *  - `documents.json?date=<d>&type=2` for the document list
    *    (api.py:45-77), `documents/<docId>?type=5` for the CSV ZIP
    *    (api.py:96-127), with an optional API key appended as the
    *    `Subscription-Key` query parameter
    *  - HTTP 404 → FileNotFoundException (LandedFetcher's analogue);
    *    connect/read failures and 5xx retry with linear backoff up to
    *    `maxRetries`, then fail loudly — transient upstream blips
    *    don't abort a multi-date backfill, real outages do
    *
    * Landing is ATOMIC per file (download to a `._tmp` sibling, rename
    * into place): a crashed fetch never leaves a half-written JSON/ZIP
    * a later distributed scan would half-parse. `baseUrl` is injected
    * (never hardcoded) so tests run against an in-process stub server
    * with zero egress — swapping it for the real endpoint changes no
    * downstream plan.
    */
  final class HttpFetcher(spark: SparkSession, baseUrl: String,
      landingDir: String, apiKey: Option[String] = None,
      timeout: java.time.Duration = java.time.Duration.ofSeconds(30),
      maxRetries: Int = 2, retryBackoffMs: Long = 500L) extends Fetcher {

    private val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(timeout)
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()

    private def keyParam: String =
      apiKey.map(k => s"&Subscription-Key=$k").getOrElse("")

    /** The credential must never reach logs: every error message (and
      * anything else human-facing) reports the URL with the
      * Subscription-Key parameter's VALUE masked — fetch failures
      * stack-trace through job logs and retry loops, which would
      * otherwise persist the key in plaintext on every blip.
      */
    private def redact(url: String): String =
      url.replaceAll("(Subscription-Key=)[^&]*", "$1***")

    def fetchDocumentList(date: java.time.LocalDate): String =
      land(s"$baseUrl/documents.json?date=$date&type=2$keyParam",
        s"$landingDir/$date.json")

    def fetchArchive(docId: String): String =
      land(s"$baseUrl/documents/$docId?type=5$keyParam",
        s"$landingDir/$docId.zip")

    private def land(url: String, dest: String): String = {
      val destPath = new org.apache.hadoop.fs.Path(dest)
      val fs = destPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(timeout).GET().build()
      var attempt = 0
      var body: Array[Byte] = null
      while (body == null) {
        val outcome =
          try {
            val resp = client.send(req,
              java.net.http.HttpResponse.BodyHandlers.ofByteArray())
            resp.statusCode() match {
              case 200 => Right(resp.body())
              case 404 => throw new java.io.FileNotFoundException(
                s"HTTP 404: ${redact(url)}")
              case s if s >= 500 => Left(s"HTTP $s")
              case s => throw new java.io.IOException(
                s"HTTP $s fetching ${redact(url)} — not retryable")
            }
          } catch {
            case e: java.io.FileNotFoundException => throw e
            case e: InterruptedException =>
              // an interrupt is a shutdown signal, never a retryable
              // blip — restore the flag and fail the fetch loudly
              Thread.currentThread().interrupt()
              throw new java.io.IOException(
                s"interrupted fetching ${redact(url)}", e)
            case e: java.io.IOException => Left(redact(e.toString))
          }
        outcome match {
          case Right(b) => body = b
          case Left(why) =>
            if (attempt >= maxRetries)
              throw new java.io.IOException(
                s"fetch failed after ${attempt + 1} attempts: ${redact(url)} ($why)")
            attempt += 1
            Thread.sleep(retryBackoffMs * attempt)
        }
      }
      val tmp = new org.apache.hadoop.fs.Path(dest + "._tmp")
      val out = fs.create(tmp, true)
      try out.write(body) finally out.close()
      if (fs.exists(destPath)) fs.delete(destPath, false)
      if (!fs.rename(tmp, destPath))
        throw new java.io.IOException(s"could not land $dest (rename failed)")
      dest
    }
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
