package graft

import java.nio.file.{Files, Paths}
import graft.etl.{Extract, Standardize}
import graft.sources.EdinetCsv

/** Parity against the reference's own golden input: a REAL 2023-Q3
  * filing (299 rows, UTF-8-BOM comma CSV) shipped as
  * documents/test.csv in the reference repo. Expected values are the
  * reference's own test expectations
  * (tests/test_mapping.py:118-139). Skipped if the reference checkout
  * is absent.
  */
class GoldenFileSpec extends SparkSpec {

  private val golden = "/root/reference/documents/test.csv"

  private lazy val staged =
    Standardize(EdinetCsv.read(spark, golden, EdinetCsv.Utf8Comma))

  test("reference golden filing: report extraction matches test_mapping") {
    assume(Files.exists(Paths.get(golden)), "reference checkout not present")
    assert(staged.count() === 299)

    val report = Extract.reportCandidates(staged).collect().head
    assert(report.getAs[String]("document_type") === "四半期報告書")
    assert(report.getAs[String]("fiscal_year_end") === "2023/12/31")
    assert(report.getAs[String]("filing_date") === "2024/2/9")
    assert(report.getAs[String]("fiscal_year") === "2023")
    assert(report.getAs[String]("quarter_type") === "Q3")
    assert(!report.getAs[Boolean]("_invalid"))
  }

  test("reference golden filing: item master profile matches the corpus") {
    assume(Files.exists(Paths.get(golden)), "reference checkout not present")
    // FIXTURES.md profile: jppfs_cor: x154 rows; items dedup by element_id
    val financialRows = staged
      .filter(org.apache.spark.sql.functions.col("element_id")
        .rlike(graft.etl.Model.financialElementPattern))
    assert(financialRows.count() === 154)
    val items = Extract.itemCandidates(staged)
    val n = items.count()
    assert(n > 0 && n <= 154)
    // company extraction yields the filer's real EDINET code shape
    val company = Extract.companyCandidates(staged).collect().head
    assert(company.getAs[String]("edinet_code").matches("E\\d{5}"))
    assert(!company.getAs[Boolean]("_invalid"))
  }
}
