package graft.etl

import org.apache.spark.sql.DataFrame

/** Static chart egress over `Summary.chartSeries` — the last
  * presentation step of the reference's dashboard (app/app.py:172-189
  * renders the per-company summary as an Altair bar chart inside
  * Streamlit). The engine's job ends at a chart SPEC, not a widget:
  * this writer emits one self-contained HTML page with a Vega-Lite
  * spec per (company, period) — Altair compiles to exactly Vega-Lite,
  * so the encoding here is field-for-field the reference's chart
  * (mark bar; x = 項目 nominal with sort null, i.e. insertion order;
  * y = 金額 quantitative with a zero-anchored scale; both axes at
  * font size 20).
  *
  * Driver boundary: the collect is the presentation edge — 4 metric
  * rows per summary, the same bounded surface `Cli summary
  * --format=json` already prints. Rendering needs the vega scripts
  * (CDN reference in the page head); without network the page still
  * shows each spec as pretty-printed JSON inside a <pre> fallback.
  */
object ChartWriter {

  private def jsonStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case '<' => b.append("\\u003c") // specs embed in <script>/<pre>
      case c => b.append(c)
    }
    b.append('"').toString
  }

  private def jsonNum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" // a null 金額 surfaces as NaN;
      // bare NaN/Infinity is invalid JSON — Vega-Lite treats a null
      // datum as missing, which is the faithful rendering
    else if (d == d.floor && math.abs(d) < 1e15)
      s"${d.toLong}.0"
    else d.toString

  /** The Vega-Lite spec for one summary's chart rows — the reference's
    * Altair encoding verbatim (app/app.py:172-189): bar mark, 項目 on
    * x unsorted (insertion order), 金額 on y from zero, 20-pt axis
    * fonts. `rows` come in chartSeries order (売上高, 営業利益,
    * 経常利益, 純利益).
    */
  def vegaLiteSpec(company: String, period: String,
      rows: Seq[(String, Double)]): String = {
    val values = rows.map { case (item, amount) =>
      s"""{"項目":${jsonStr(item)},"金額":${jsonNum(amount)}}"""
    }.mkString("[", ",", "]")
    s"""{"$$schema":"https://vega.github.io/schema/vega-lite/v5.json",""" +
      s""""title":${jsonStr(s"$company $period")},""" +
      s""""data":{"values":$values},""" +
      """"mark":"bar",""" +
      """"encoding":{""" +
      """"x":{"field":"項目","type":"nominal","sort":null,""" +
      """"axis":{"labelFontSize":20,"titleFontSize":20}},""" +
      """"y":{"field":"金額","type":"quantitative","scale":{"zero":true},""" +
      """"axis":{"labelFontSize":20,"titleFontSize":20}}}}"""
  }

  /** All (company, period) specs of a chartSeries frame, in
    * (company, period) order with metric rows kept in chartSeries'
    * insertion order (Altair sort=None — LayoutSpec of the chart: the
    * x axis must read 売上高, 営業利益, 経常利益, 純利益).
    */
  def specs(series: DataFrame): Seq[(String, String, String)] = {
    val rows = series.collect().toSeq
    rows.zipWithIndex
      .groupBy { case (r, _) =>
        (r.getAs[String]("company_name"), r.getAs[String]("period_name"))
      }
      .view.mapValues(_.sortBy(_._2)) // keep frame order within a chart
      .toSeq.sortBy(_._1)
      .map { case ((company, period), rs) =>
        val metrics = rs.map { case (r, _) =>
          r.getAs[String]("項目") ->
            Option(r.getAs[java.lang.Double]("金額"))
              .map(_.doubleValue).getOrElse(Double.NaN)
        }
        (company, period, vegaLiteSpec(company, period, metrics))
      }
  }

  private def chartDivs(ss: Seq[(String, String, String)]): String =
    ss.zipWithIndex.map { case ((_, _, spec), i) =>
      s"""<div id="chart$i"></div>
         |<pre class="fallback" id="spec$i">$spec</pre>
         |<script>
         |if (window.vegaEmbed) {
         |  document.getElementById("spec$i").style.display = "none";
         |  vegaEmbed("#chart$i", $spec);
         |}
         |</script>""".stripMargin
    }.mkString("\n")

  private def page(title: String, body: String): String =
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8">
       |<title>$title</title>
       |<script src="https://cdn.jsdelivr.net/npm/vega@5"></script>
       |<script src="https://cdn.jsdelivr.net/npm/vega-lite@5"></script>
       |<script src="https://cdn.jsdelivr.net/npm/vega-embed@6"></script>
       |<style>body{font-family:sans-serif;margin:2em}pre.fallback{background:#f6f6f6;padding:1em;overflow-x:auto}</style>
       |</head><body>
       |$body
       |</body></html>
       |""".stripMargin

  private def writeFile(path: java.nio.file.Path, content: String): Unit = {
    if (path.getParent != null)
      java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.write(path, content.getBytes("UTF-8"))
    ()
  }

  /** One static HTML page, a chart div per spec. */
  def writeHtml(series: DataFrame, outFile: String): Unit =
    writeFile(java.nio.file.Paths.get(outFile),
      page("financial summary", "<h1>決算サマリー</h1>\n" +
        chartDivs(specs(series))))

  private def htmlEsc(s: String): String =
    s.flatMap {
      case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
      case '"' => "&quot;"; case c => c.toString
    }

  /** Company-picker parity with the reference's one remaining live
    * surface (the Streamlit selectbox at app/app.py:95-101 chooses
    * which company's chart renders): a static SITE — `index.html`
    * listing every company as a link, one `company_<i>.html` per
    * company with that company's charts. The engine's boundary is
    * unchanged (specs, not widgets); the interactive picker becomes
    * navigation. Filenames are index-based so company names (Japanese,
    * arbitrary) never have to be filesystem-safe.
    */
  def writeSite(series: DataFrame, outDir: String): Unit = {
    val ss = specs(series)
    val dir = java.nio.file.Paths.get(outDir)
    val companies = ss.map(_._1).distinct // specs() sorts by company
    companies.zipWithIndex.foreach { case (c, i) =>
      writeFile(dir.resolve(s"company_$i.html"),
        page(c, s"""<p><a href="index.html">← 企業一覧</a></p>
                   |<h1>${htmlEsc(c)} 決算サマリー</h1>
                   |""".stripMargin + chartDivs(ss.filter(_._1 == c))))
    }
    val items = companies.zipWithIndex.map { case (c, i) =>
      s"""<li><a href="company_$i.html">${htmlEsc(c)}</a></li>"""
    }.mkString("\n")
    writeFile(dir.resolve("index.html"),
      page("決算サマリー", s"<h1>企業一覧</h1>\n<ul>\n$items\n</ul>"))
  }
}
