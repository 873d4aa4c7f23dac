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
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15)
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

  /** One static HTML page, a chart div per spec. */
  def writeHtml(series: DataFrame, outFile: String): Unit = {
    val ss = specs(series)
    val divs = ss.zipWithIndex.map { case ((_, _, spec), i) =>
      s"""<div id="chart$i"></div>
         |<pre class="fallback" id="spec$i">$spec</pre>
         |<script>
         |if (window.vegaEmbed) {
         |  document.getElementById("spec$i").style.display = "none";
         |  vegaEmbed("#chart$i", $spec);
         |}
         |</script>""".stripMargin
    }.mkString("\n")
    val html =
      s"""<!DOCTYPE html>
         |<html><head><meta charset="utf-8">
         |<title>financial summary</title>
         |<script src="https://cdn.jsdelivr.net/npm/vega@5"></script>
         |<script src="https://cdn.jsdelivr.net/npm/vega-lite@5"></script>
         |<script src="https://cdn.jsdelivr.net/npm/vega-embed@6"></script>
         |<style>body{font-family:sans-serif;margin:2em}pre.fallback{background:#f6f6f6;padding:1em;overflow-x:auto}</style>
         |</head><body>
         |<h1>決算サマリー</h1>
         |$divs
         |</body></html>
         |""".stripMargin
    val p = java.nio.file.Paths.get(outFile)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, html.getBytes("UTF-8"))
    ()
  }
}
