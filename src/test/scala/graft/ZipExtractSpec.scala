package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.etl.{Ingest, Summary}
import graft.sources.{Warehouse, ZipExtract}

/** Distributed ZIP extraction: synthetic EDINET-shaped archives →
  * binaryFile scan → member filter → landing layout → full ingest.
  */
class ZipExtractSpec extends SparkSpec {

  private def makeZip(dir: String, docId: String, csvBytes: Array[Byte]): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(s"$dir/$docId.zip"))
    zos.putNextEntry(new ZipEntry(s"XBRL_TO_CSV/jpcrp-$docId.csv"))
    zos.write(csvBytes)
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("XBRL_TO_CSV/jpaud-audit.csv")) // filtered out
    zos.write("audit".getBytes)
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("manifest.xml")) // filtered out
    zos.write("<m/>".getBytes)
    zos.closeEntry()
    zos.close()
  }

  test("zip scan extracts only matching members; ingest composes") {
    val zipDir = Files.createTempDirectory("zips").toString
    val landing = Files.createTempDirectory("landing-zip").toString

    // build the member CSV by reusing the filing fixture, then zipping it
    val stage = Files.createTempDirectory("stage").toString
    Filings.write(stage, "S100AAAA", "E11111", "アルファ株式会社", 200000000L, 50000000L)
    Filings.write(stage, "S100BBBB", "E22222", "ベータ株式会社", 1000000000L, 100000000L)
    for (doc <- Seq("S100AAAA", "S100BBBB")) {
      val csv = Files.readAllBytes(
        java.nio.file.Paths.get(stage, doc, "XBRL_TO_CSV", s"jpcrp-$doc.csv"))
      makeZip(zipDir, doc, csv)
    }

    val extracted = ZipExtract.extract(spark, zipDir)
    val members = extracted.select("member").collect().map(_.getString(0)).sorted
    assert(members.toSeq === Seq(
      "XBRL_TO_CSV/jpcrp-S100AAAA.csv", "XBRL_TO_CSV/jpcrp-S100BBBB.csv"))

    ZipExtract.toLanding(extracted, landing)
    val wh = new Warehouse(spark, Files.createTempDirectory("wh-zip").toString)
    val quarantine = new Ingest(spark, wh).run(landing)
    assert(quarantine.count() === 0)
    val summary = Summary.allCompanies(
      wh.read("companies"), wh.read("financial_reports"),
      wh.read("financial_data"), wh.read("financial_items"))
    assert(summary.count() === 2)
  }

  test("zip-slip member names are rejected, not landed outside the dir") {
    val zipDir = Files.createTempDirectory("zipslip").toString
    val zos = new ZipOutputStream(new FileOutputStream(s"$zipDir/S100EVIL.zip"))
    // matches the member pattern but tries to escape the landing dir
    zos.putNextEntry(new ZipEntry("../../escape/XBRL_TO_CSV/jpcrp1.csv"))
    zos.write("evil".getBytes)
    zos.closeEntry()
    zos.putNextEntry(new ZipEntry("XBRL_TO_CSV/jpcrp-ok.csv"))
    zos.write("ok".getBytes)
    zos.closeEntry()
    zos.close()
    val extracted = ZipExtract.extract(spark, zipDir)
    assert(extracted.select("member").collect().map(_.getString(0)).toSeq ===
      Seq("XBRL_TO_CSV/jpcrp-ok.csv"))
    // defense in depth: toLanding refuses an unsafe name outright
    import spark.implicits._
    val forged = Seq(("file:/x/S100EVIL.zip", "../../escape/jpcrp1.csv",
      "evil".getBytes)).toDF("archive", "member", "content")
    val landing = Files.createTempDirectory("landing-slip").toString
    val ex = intercept[org.apache.spark.SparkException] {
      ZipExtract.toLanding(forged, landing)
    }
    assert(ex.getMessage.contains("unsafe archive member name") ||
      Option(ex.getCause).exists(_.getMessage.contains("unsafe archive member name")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(landing).getParent.resolve("escape")))
  }
}
