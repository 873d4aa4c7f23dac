package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.functions.Fns

/** Golden-value tests for the Japanese period parsers (semantics pinned
  * to /root/reference/utils/parser.py:16-131 and the reference's own
  * test expectations, tests/test_mapping.py:125-131), plus property
  * tests pinning the codegen column-expression path to the pure-Scala
  * reference implementation.
  */
class FnsSpec extends AnyFunSuite {

  // ---- extract_fiscal_year golden cases ------------------------------
  test("fiscal year: Gregorian date range takes the END year") {
    assert(Fns.extractFiscalYear(
      "第121期 第３四半期(自  2023年10月１日  至  2023年12月31日)") === Some("2023"))
    assert(Fns.extractFiscalYear("自 2022年4月1日 至 2023年3月31日") === Some("2023"))
  }

  test("fiscal year/quarter: ideographic space (U+3000) — real raw cover pages") {
    // download/S100SPIM form: Python's \s matches U+3000, ASCII \s does
    // not — the patterns carry an explicit class
    val real = "第75期第３四半期（自　2023年10月１日　至　2023年12月31日）"
    assert(Fns.extractFiscalYear(real) === Some("2023"))
    assert(Fns.extractQuarterType(real) === Some("Q3"))
    assert(Fns.extractFiscalYear("自　令和５年10月21日　至　令和６年１月20日") === Some("2024"))
    assert(Fns.extractQuarterType("第　３　四半期") === Some("Q3"))
  }

  test("fiscal year: Reiwa era range converts via 2019 + n - 1") {
    assert(Fns.extractFiscalYear(
      "第52期第１四半期(自  令和５年10月21日  至  令和６年１月20日)") === Some("2024"))
    assert(Fns.extractFiscalYear("自 令和元年4月1日 至 令和2年3月31日") === Some("2020"))
    assert(Fns.extractFiscalYear("自 令和2年4月1日 至 令和元年3月31日") === Some("2019"))
  }

  test("fiscal year: Reiwa year beyond Int range is None, no fall-through") {
    val c = "自 令和3000000000年4月1日 至 令和3000000000年3月31日 2023"
    assert(Fns.extractFiscalYear(c) === None)
  }

  test("fiscal year: bare 4-digit year only within [1990, 2100]") {
    assert(Fns.extractFiscalYear("2023年3月期") === Some("2023"))
    assert(Fns.extractFiscalYear("1989年決算") === None)
    assert(Fns.extractFiscalYear("9999") === None)
    assert(Fns.extractFiscalYear("第121期") === None) // no 4-digit match
    assert(Fns.extractFiscalYear("") === None)
  }

  test("fiscal year: first 4-digit match decides (no backtracking)") {
    // 0121 is the first 4-digit run; out of range ⇒ None, 2023 not tried
    assert(Fns.extractFiscalYear("第0121期 2023") === None)
  }

  // ---- extract_quarter_type golden cases -----------------------------
  test("quarter: kanji, full-width and ASCII digits all map") {
    assert(Fns.extractQuarterType("第３四半期") === Some("Q3"))
    assert(Fns.extractQuarterType("第3四半期") === Some("Q3"))
    assert(Fns.extractQuarterType("第三四半期") === Some("Q3"))
    assert(Fns.extractQuarterType("第 １ 四半期") === Some("Q1"))
    assert(Fns.extractQuarterType(
      "第121期 第３四半期(自  2023年10月１日  至  2023年12月31日)") === Some("Q3"))
  }

  test("quarter: out-of-range and unmatched forms are None") {
    assert(Fns.extractQuarterType("第０四半期") === None) // 0 out of range
    assert(Fns.extractQuarterType("通期") === None)
    assert(Fns.extractQuarterType("") === None)
  }

  // ---- property: column-expression path ≡ pure-Scala reference -------
  private val periodGen: Gen[String] = {
    val year = Gen.chooseNum(1850, 2200)
    val reiwaDigit = Gen.oneOf("元", "１", "２", "３", "５", "1", "2", "6", "10")
    val quarter = Gen.oneOf("１", "２", "３", "４", "1", "2", "3", "4",
      "一", "二", "三", "四", "0", "０", "5")
    // separator sweep incl. IDEOGRAPHIC SPACE (real raw cover pages)
    val sep = Gen.oneOf(" ", "  ", "　", "")
    Gen.oneOf(
      for { y1 <- year; y2 <- year; q <- quarter; s1 <- sep; s2 <- sep } yield
        s"第121期 第${q}四半期(自${s1}${y1}年10月1日 至${s2}${y2}年12月31日)",
      for { r1 <- reiwaDigit; r2 <- reiwaDigit; q <- quarter; s1 <- sep; s2 <- sep } yield
        s"第52期第${q}四半期(自${s1}令和${r1}年10月21日 至${s2}令和${r2}年1月20日)",
      for { y <- year } yield s"${y}年3月期",
      Gen.alphaNumStr,
      Gen.const(""))
  }

  test("property: fiscalYearExpr/quarterTypeExpr match the Scala fns") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val samples = Gen.listOfN(300, periodGen).sample.get
    val df = samples.toDF("content")
      .withColumn("fy_expr", Fns.fiscalYearExpr(col("content")))
      .withColumn("qt_expr", Fns.quarterTypeExpr(col("content")))
      .collect()
    df.foreach { r =>
      val content = r.getString(0)
      assert(Option(r.getString(1)) === Fns.extractFiscalYear(content),
        s"fiscal year mismatch for '$content'")
      assert(Option(r.getString(2)) === Fns.extractQuarterType(content),
        s"quarter mismatch for '$content'")
    }
  }
}
