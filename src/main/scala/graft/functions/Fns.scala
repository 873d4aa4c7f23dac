package graft.functions

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text-extraction functions for Japanese financial-disclosure
  * cover-page strings (reference: utils/parser.py:16-131). Two
  * implementations with identical semantics:
  *
  *  - `extractFiscalYear` / `extractQuarterType`: pure Scala, exposed
  *    as UDFs — the readable reference implementation.
  *  - `fiscalYearExpr` / `quarterTypeExpr`: pure Catalyst column
  *    expressions (regexp_extract + translate + try_cast cascade) —
  *    stays inside whole-stage codegen for the hot ETL path.
  *
  * A ScalaCheck property test pins the two to each other (FnsSpec).
  */
object Fns {

  // Whitespace class: real EDINET cover pages separate 自/至 from the
  // year with IDEOGRAPHIC SPACE (U+3000, e.g. 自　2023年 —
  // download/S100SPIM). Python's \s (reference parser.py:28) matches
  // it; Java's and RE2's ASCII \s do NOT, so the class is explicit —
  // in the UDFs, the column expressions, AND the DuckDB oracle.
  private val WS = """[\s　]"""

  // ---- pattern 1: Gregorian date range 自YYYY年…至YYYY年 → end year ----
  private val DateRange = (s"""自$WS*(\\d{4})年.*?至$WS*(\\d{4})年""").r
  // ---- pattern 2: Reiwa-era range → 2019 + n - 1 ----------------------
  private val ReiwaRange = (s"""自$WS*令和(元|\\d+|[０-９]+)年.*?至$WS*令和(元|\\d+|[０-９]+)年""").r
  // ---- pattern 3: bare 4-digit year, accepted iff in [1990, 2100] -----
  private val BareYear = """(\d{4})""".r

  /** 元 (first era year) → 1; otherwise NFKC-normalize full-width digits
    * and parse. (reference: parser.py:60-69.) Years beyond Int range
    * yield None — Python's arbitrary-precision int would produce an
    * absurd year string; both our paths (Scala and try_cast in the
    * column expr) agree on null instead.
    */
  def convertJapaneseYearToNumber(s: String): Option[Int] =
    if (s == "元") Some(1)
    else try Some(Normalizer.normalize(s, Normalizer.Form.NFKC).toInt)
    catch { case _: NumberFormatException => None }

  /** Fiscal year from a cover-page period string; three-pattern cascade.
    * Returns the END year of a range. (reference: parser.py:16-57 —
    * note: pattern 1/2 return str(int(...)) i.e. leading zeros
    * stripped; pattern 3 returns the matched text verbatim.)
    */
  def extractFiscalYear(content: String): Option[String] = content match {
    case null => None
    case c =>
      DateRange.findFirstMatchIn(c) match {
        case Some(m) => Some(m.group(2).toInt.toString)
        case None => ReiwaRange.findFirstMatchIn(c) match {
          case Some(m) =>
            // matched pattern 2: resolve here (None on overflow), do
            // NOT fall through to the bare-year pattern
            convertJapaneseYearToNumber(m.group(2)).map(n => (2019 + n - 1).toString)
          case None =>
            BareYear.findFirstIn(c).filter { y =>
              val i = y.toInt; i >= 1990 && i <= 2100
            }
        }
      }
  }

  private val QuarterPat = (s"""第$WS*([0-4０-４一二三四１２３４]+)$WS*四半期""").r
  private val QuarterMap = Map(
    "一" -> 1, "二" -> 2, "三" -> 3, "四" -> 4,
    "１" -> 1, "２" -> 2, "３" -> 3, "４" -> 4,
    "1" -> 1, "2" -> 2, "3" -> 3, "4" -> 4)

  /** Quarter string → 1..4. Single-char map first, then a lenient
    * numeric parse (Python int() accepts full-width digits, so
    * normalize before parsing). (reference: parser.py:107-131)
    */
  def convertQuarterToNumber(quarterText: String): Option[Int] =
    QuarterMap.get(quarterText).orElse {
      try {
        val n = Normalizer.normalize(quarterText, Normalizer.Form.NFKC).toInt
        if (n >= 1 && n <= 4) Some(n) else None
      } catch { case _: NumberFormatException => None }
    }

  /** "Qn" from 第N四半期 (kanji / full-width / ASCII digit), range-checked
    * 1..4. (reference: parser.py:72-104)
    */
  def extractQuarterType(content: String): Option[String] = content match {
    case null => None
    case c =>
      QuarterPat.findFirstMatchIn(c)
        .flatMap(m => convertQuarterToNumber(m.group(1).trim))
        .filter(n => n >= 1 && n <= 4)
        .map(n => s"Q$n")
  }

  // ---------------------------------------------------------------------
  // Column-expression fast path (whole-stage-codegen friendly)
  // ---------------------------------------------------------------------

  private val FW = "０１２３４５６７８９"
  private val HW = "0123456789"

  /** Full-width → half-width digits, 元 → 1 (column form of
    * convertJapaneseYearToNumber, non-throwing via try_cast).
    */
  private def reiwaNum(g: Column): Column =
    when(g === "元", lit(1)).otherwise(translate(g, FW, HW).try_cast("int"))

  /** Column-expression form of extractFiscalYear. */
  def fiscalYearExpr(c: Column): Column = {
    val p1 = s"自$WS*(\\d{4})年.*?至$WS*(\\d{4})年"
    val p2 = s"自$WS*令和(元|\\d+|[０-９]+)年.*?至$WS*令和(元|\\d+|[０-９]+)年"
    val p3 = "(\\d{4})"
    val g1 = regexp_extract(c, p1, 2)
    val g2 = regexp_extract(c, p2, 2)
    val g3 = regexp_extract(c, p3, 1)
    val bare = g3.try_cast("int")
    when(g1 =!= "", g1.try_cast("int").cast("string"))
      .when(g2 =!= "", (lit(2019) + reiwaNum(g2) - lit(1)).cast("string"))
      .when(g3 =!= "" && bare >= 1990 && bare <= 2100, g3)
  }

  /** Column-expression form of extractQuarterType. */
  def quarterTypeExpr(c: Column): Column = {
    val g = trim(regexp_extract(c, s"第$WS*([0-4０-４一二三四１２３４]+)$WS*四半期", 1))
    val n = translate(g, FW + "一二三四", HW + "1234").try_cast("int")
    when(g =!= "" && n.isNotNull && n >= 1 && n <= 4,
      concat(lit("Q"), n.cast("string")))
  }

  /** UDF forms (reference implementations, also usable from SQL). */
  val extractFiscalYearUdf = udf(extractFiscalYear _)
  val extractQuarterTypeUdf = udf(extractQuarterType _)
}
