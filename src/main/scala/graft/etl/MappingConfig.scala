package graft.etl

import java.io.{FileInputStream, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.Properties

/** Parsed extraction-mapping configuration (the reference drives this
  * from config/config.toml:33-50 via tomllib; we drive it from a
  * properties resource with an external-override path — same
  * change-without-recompile contract, no extra dependency).
  */
final case class ExtractionMapping(
    company: Seq[(String, String)],
    report: Seq[(String, String)],
    summary: Seq[(String, Seq[String])],
    financialElementPattern: String)

/** Loads the extraction mapping. Resolution order:
  *  1. `-Dgraft.mapping.path=<file>` system property
  *  2. `GRAFT_MAPPING_PATH` env var
  *  3. bundled `/graft-mapping.properties` resource
  * Missing keys fail fast with the key name (a silently-absent mapping
  * would drop fields from every document).
  */
object MappingConfig {

  lazy val default: ExtractionMapping =
    sys.props.get("graft.mapping.path")
      .orElse(sys.env.get("GRAFT_MAPPING_PATH"))
      .map(load)
      .getOrElse(load(getClass.getResourceAsStream("/graft-mapping.properties")))

  def load(path: String): ExtractionMapping = load(new FileInputStream(path))

  def load(in: InputStream): ExtractionMapping = {
    require(in != null, "mapping config stream is null (resource missing?)")
    val props = new Properties()
    try props.load(new InputStreamReader(in, StandardCharsets.UTF_8))
    finally in.close()
    def get(k: String): String = Option(props.getProperty(k)).map(_.trim)
      .getOrElse(throw new IllegalArgumentException(s"missing mapping key: $k"))
    def fields(section: String): Seq[String] =
      get(s"$section.order").split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    ExtractionMapping(
      company = fields("company").map(f => f -> get(s"company.$f")),
      report = fields("report").map(f => f -> get(s"report.$f")),
      summary = fields("summary").map(f =>
        f -> get(s"summary.$f").split(",").toSeq.map(_.trim).filter(_.nonEmpty)),
      financialElementPattern = get("financial_element_pattern"))
  }
}
