package graft

import java.nio.charset.Charset
import java.nio.file.{Files, Paths}
import graft.etl.{Model, Standardize}
import graft.sources.EdinetCsv

/** Round-trip tests for the multi-encoding EDINET CSV reader: the two
  * physical variants (UTF-16LE + tab, UTF-8-BOM + comma) must produce
  * identical logical rows, the sniffer must pick the right variant, and
  * doc_id must derive from the directory layout.
  */
class EdinetCsvSpec extends SparkSpec {

  private val header = Model.rawJpColumns.mkString(",")
  private val rows = Seq(
    Seq("jpdei_cor:EDINETCodeDEI", "EDINETコード、DEI", "FilingDateInstant",
      "提出日時点", "その他", "時点", "－", "", "E12345"),
    Seq("jppfs_cor:NetSales", "売上高", "CurrentYTDDuration",
      "当四半期累計期間", "連結", "期間", "JPY", "円", "1000000"))

  private def writeVariant(dir: String, docId: String, v: EdinetCsv.Variant): Unit = {
    val d = Paths.get(dir, docId, "XBRL_TO_CSV")
    Files.createDirectories(d)
    val sep = v.sep
    val content = (header.replace(",", sep) +: rows.map(_.mkString(sep)))
      .mkString("\n")
    v match {
      case EdinetCsv.Utf16Tab =>
        // BOM + UTF-16LE, as the raw EDINET downloads ship
        val bom = Array[Byte](0xFF.toByte, 0xFE.toByte)
        Files.write(d.resolve("jpcrp.csv"),
          bom ++ content.getBytes(Charset.forName("UTF-16LE")))
      case EdinetCsv.Utf8Comma =>
        val bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
        Files.write(d.resolve("jpcrp.csv"), bom ++ content.getBytes("UTF-8"))
      case EdinetCsv.SjisComma =>
        // no BOM — only the strict-decode probe can classify this
        Files.write(d.resolve("jpcrp.csv"),
          content.getBytes(Charset.forName("windows-31j")))
    }
  }

  test("UTF-16LE/tab and UTF-8-BOM/comma variants read identically") {
    val d16 = Files.createTempDirectory("edinet16").toString
    val d8 = Files.createTempDirectory("edinet8").toString
    writeVariant(d16, "S100AAAA", EdinetCsv.Utf16Tab)
    writeVariant(d8, "S100BBBB", EdinetCsv.Utf8Comma)

    val r16 = EdinetCsv.readAuto(spark, d16)
    val r8 = EdinetCsv.readAuto(spark, d8)
    val c16 = r16.select(Model.rawJpColumns.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq)
    val c8 = r8.select(Model.rawJpColumns.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq)
    assert(c16.length === 2)
    assert(c16.toSeq === c8.toSeq)
    // Japanese content survives both encodings
    assert(c16.head.contains("EDINETコード、DEI"))
  }

  test("sniffer distinguishes the variants from leading bytes") {
    val d16 = Files.createTempDirectory("sniff16").toString
    writeVariant(d16, "S100CCCC", EdinetCsv.Utf16Tab)
    val f16 = s"$d16/S100CCCC/XBRL_TO_CSV/jpcrp.csv"
    assert(EdinetCsv.sniff(spark, f16) === EdinetCsv.Utf16Tab)

    val d8 = Files.createTempDirectory("sniff8").toString
    writeVariant(d8, "S100DDDD", EdinetCsv.Utf8Comma)
    val f8 = s"$d8/S100DDDD/XBRL_TO_CSV/jpcrp.csv"
    assert(EdinetCsv.sniff(spark, f8) === EdinetCsv.Utf8Comma)
  }

  test("Shift-JIS stray files: sniffed, decoded, and mixable with the others") {
    val dir = Files.createTempDirectory("edinetsjis").toString
    writeVariant(dir, "S100FFFF", EdinetCsv.SjisComma)
    val f = s"$dir/S100FFFF/XBRL_TO_CSV/jpcrp.csv"
    assert(EdinetCsv.sniff(spark, f) === EdinetCsv.SjisComma)

    // a mixed landing dir: all three encodings, one logical result
    writeVariant(dir, "S100GGGG", EdinetCsv.Utf16Tab)
    writeVariant(dir, "S100HHHH", EdinetCsv.Utf8Comma)
    val all = EdinetCsv.readAuto(spark, dir)
    assert(all.select("doc_id").distinct().count() === 3)
    // Japanese content survives the Shift-JIS decode
    val sjis = all.filter(org.apache.spark.sql.functions.col("doc_id") === "S100FFFF")
      .select(Model.rawJpColumns.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq)
    assert(sjis.length === 2)
    assert(sjis.head.contains("EDINETコード、DEI"))
  }

  test("Shift-JIS file >= 8 KiB whose head ends on a complete char still sniffs") {
    // 5000 2-byte chars: the 8192-byte probe head ends exactly on a
    // char boundary, so a hard one-byte chop would leave a dangling
    // lead byte and reject the file as malformed; the underflow-aware
    // decode (endOfInput = false) must accept it
    val dir = Files.createTempDirectory("sjisbig")
    val f = dir.resolve("big.csv")
    Files.write(f, ("あ" * 5000).getBytes("windows-31j"))
    assert(EdinetCsv.sniff(spark, f.toString) === EdinetCsv.SjisComma)
    // and a truncated trailing sequence (head cut mid-char) still sniffs:
    // 4096 chars + 1 ASCII shifts every later boundary to odd offsets
    val g = dir.resolve("bigodd.csv")
    Files.write(g, ("x" + "あ" * 5000).getBytes("windows-31j"))
    assert(EdinetCsv.sniff(spark, g.toString) === EdinetCsv.SjisComma)
  }

  test("unrecognized encoding fails loudly instead of mis-decoding") {
    val dir = Files.createTempDirectory("edinetbad").toString
    val d = Paths.get(dir, "S100IIII", "XBRL_TO_CSV")
    Files.createDirectories(d)
    // bytes invalid in UTF-8 AND Shift-JIS, no UTF-16 markers
    Files.write(d.resolve("jpcrp.csv"),
      Array[Byte](0x41, 0x42, 0xFD.toByte, 0xFE.toByte, 0xFF.toByte, 0x43))
    val e = intercept[IllegalArgumentException] {
      EdinetCsv.sniff(spark, s"$dir/S100IIII/XBRL_TO_CSV/jpcrp.csv")
    }
    assert(e.getMessage.contains("unrecognized encoding"))
  }

  test("flat layout: each file gets its own doc_id (file-name stem)") {
    val dir = Files.createTempDirectory("edinetflat").toString
    val header = Model.rawJpColumns.mkString(",")
    for (n <- Seq("docX", "docY")) {
      val content = header + "\n" + rows.head.mkString(",")
      Files.write(Paths.get(dir, s"$n.csv"),
        ("\ufeff" + content).getBytes("UTF-8"))
    }
    val ids = EdinetCsv.readAuto(spark, dir)
      .select("doc_id").distinct().collect().map(_.getString(0)).sorted
    assert(ids.toSeq === Seq("docX", "docY"))
  }

  test("doc_id derives from the document directory; standardize composes") {
    val dir = Files.createTempDirectory("edinetdoc").toString
    writeVariant(dir, "S100EEEE", EdinetCsv.Utf8Comma)
    val staged = Standardize(EdinetCsv.readAuto(spark, dir))
    val docs = staged.select("doc_id").distinct().collect().map(_.getString(0))
    assert(docs.toSeq === Seq("S100EEEE"))
    // standardized columns present
    assert(staged.columns.contains("element_id"))
    assert(staged.columns.contains("is_numeric"))
  }
}
