package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{EdinetCsv, Warehouse}

/** End-to-end ingest (reference lifecycle §3.2/§3.3): one distributed
  * job replaces the per-document Python loop —
  *
  *   scan all CSVs (doc_id from path) → standardize (pure column ops)
  *   → derive 3 dimension DataFrames + the fact DataFrame
  *   → anti-join / window upserts → parquet warehouse.
  *
  * The reference's per-document flush()-for-keys transaction (§3.2c)
  * disappears: surrogate keys are deterministic hashes of natural keys,
  * so fact rows can be keyed WITHOUT first persisting the dims — the
  * whole ingest is embarrassingly parallel per file and idempotent on
  * retry (same input → same keys → upsert converges).
  */
class Ingest(spark: SparkSession, wh: Warehouse) {

  /** The reference's import script (scripts/import_financial_data.py:
    * 38-53) as ONE composition: land the date's document list →
    * quarterly filter (P9) → land each filing's ZIP → distributed
    * member extract into a CSV landing dir → one distributed ingest of
    * everything landed. The reference loops documents serially,
    * fetching AND persisting one at a time inside the loop; here the
    * driver loop only LANDS archives (a date's filing list is small —
    * tens of rows; ZIP payloads go fetcher-to-disk, never through
    * Spark's driver), and everything downstream is the same
    * distributed scan/extract/upsert pipeline as `run`. A filing
    * whose archive 404s is reported and skipped (the reference's
    * "Failed to Fetch data." branch, import_financial_data.py:52-53)
    * — one missing upstream file never aborts the date.
    *
    * Returns (ingested doc ids, fetch-failed doc ids, quarantine).
    */
  def runForDate(fetcher: graft.sources.EdinetApi.Fetcher,
      date: java.time.LocalDate, workDir: String,
      strict: Boolean = false): (Seq[String], Seq[String], DataFrame) = {
    import spark.implicits._
    val listPath = fetcher.fetchDocumentList(date)
    val docs = graft.sources.EdinetApi.quarterlyReports(
      graft.sources.EdinetApi.documentList(spark, listPath))
    val ids = docs.select("docID").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val landed = ids.map { id =>
      id -> (try Some(fetcher.fetchArchive(id))
        catch { case _: java.io.FileNotFoundException => None })
    }
    val ok = landed.collect { case (id, Some(_)) => id }
    val failed = landed.collect { case (id, None) => id }
    if (ok.isEmpty)
      return (Nil, failed, Seq.empty[(String, String)].toDF("doc_id", "reason"))
    // the fetcher lands all archives under one dir — extract THIS
    // date's members only (other dates' zips may share the landing)
    val zipDir = new org.apache.hadoop.fs.Path(
      landed.collectFirst { case (_, Some(p)) => p }.get).getParent.toString
    val extracted = graft.sources.ZipExtract.extract(spark, zipDir)
      .filter(element_at(split(col("archive"), "/"), -1)
        .isin(ok.map(_ + ".zip"): _*))
    // per-DATE csv landing: the work dir is shared across a multi-date
    // backfill loop, and `run` scans its whole pathSpec — landing every
    // date into one flat `csv/` would re-scan and re-upsert all earlier
    // dates' documents on each later date (output polluted with stale
    // docs, work quadratic in the number of dates). A date-scoped
    // subdir keeps each call's scan exactly its own extract.
    val csvDir = s"$workDir/csv/$date"
    graft.sources.ZipExtract.toLanding(extracted, csvDir)
    (ok, failed, run(csvDir, strict))
  }

  /** Ingest every filing under `pathSpec`. Returns the quarantine
    * DataFrame (docs whose required fields failed extraction —
    * reference raises and aborts; we route and continue, strict=false).
    */
  def run(pathSpec: String, strict: Boolean = false): DataFrame = {
    val staged = Standardize(EdinetCsv.readAuto(spark, pathSpec))
    staged.persist()
    try runStaged(staged, strict)
    finally { staged.unpersist(); () }
  }

  def runStaged(staged: DataFrame, strict: Boolean): DataFrame = {
    val now = current_timestamp()

    val companyCand = Extract.companyCandidates(staged, strict)
    val reportCand = Extract.reportCandidates(staged, strict)

    // quarantine: any doc invalid in either extraction (F4 error channel),
    // plus docs whose date fields are present but parse in NEITHER ISO
    // (2023-12-31 — raw EDINET CSVs) nor slash (2023/12/31 — golden
    // files) form. try_to_date never throws (vs to_date under Spark 4's
    // ANSI default, where one stray date fails the whole job), and the
    // reference aborts the whole document on any bad field, so these
    // docs route out entirely rather than ingesting with null dates
    // (null filing_date would corrupt the amendment-wins ordering).
    val parseDate = (c: org.apache.spark.sql.Column) =>
      coalesce(try_to_date(c), try_to_date(c, "yyyy/M/d"))
    val dateBad = reportCand.filter(!col("_invalid") &&
        ((col("fiscal_year_end").isNotNull && parseDate(col("fiscal_year_end")).isNull) ||
         (col("filing_date").isNotNull && parseDate(col("filing_date")).isNull)))
      .select(col("doc_id"), lit("bad_date").as("reason"))
    val quarantine = companyCand.filter(col("_invalid"))
      .select(col("doc_id"), lit("company").as("reason"))
      .unionByName(reportCand.filter(col("_invalid"))
        .select(col("doc_id"), lit("report").as("reason")))
      .unionByName(dateBad)
    val badDocs = quarantine.select("doc_id").distinct()

    val goodCompany = companyCand.filter(!col("_invalid"))
      .join(badDocs, Seq("doc_id"), "left_anti")
    val goodReport = reportCand.filter(!col("_invalid"))
      .join(badDocs, Seq("doc_id"), "left_anti")

    // ---- companies dim: hash key on edinet_code, upsert-by-key -------
    val companies = goodCompany.select(
      wh.surrogateKey(col("edinet_code")).as("company_id"),
      col("edinet_code"), col("security_code"), col("industry_code"),
      col("company_name"), now.as("created_at"), now.as("updated_at"))
      .dropDuplicates("company_id")
    wh.upsert("companies", companies, Seq("company_id"))

    // ---- items dim: global dedup across docs, first-wins; anti-join
    // insert-if-absent replaces the reference's N+1 existence probes (J5).
    // Quarantined docs are excluded BEFORE candidate extraction — the
    // reference aborts the whole document and inserts nothing from it.
    val items = Extract.itemCandidates(
      staged.join(badDocs, Seq("doc_id"), "left_anti")).select(
      wh.surrogateKey(col("element_id")).as("item_id"),
      col("element_id"), col("item_name"), col("category"), col("unit_type"),
      now.as("created_at"), now.as("updated_at"))
      .dropDuplicates("item_id")
    if (wh.exists("financial_items")) {
      val existing = wh.read("financial_items").select("item_id")
      wh.append("financial_items", items.join(existing, Seq("item_id"), "left_anti"))
    } else wh.create("financial_items", items)

    // ---- reports dim: key = hash(edinet_code, fiscal_year, quarter) --
    // Two docs mapping to the SAME (company, fiscal_year, quarter) —
    // e.g. an amended filing in the same batch — collide on report_id.
    // Keep the LATEST filing (filing_date desc, doc_id desc tiebreak —
    // an amendment supersedes the original) and QUARANTINE the rest
    // (silently dropping a whole filing's facts is invisible data loss).
    val reportsAll = goodReport
      .join(goodCompany.select(col("doc_id"),
        wh.surrogateKey(col("edinet_code")).as("company_id")), "doc_id")
      .select(
        wh.surrogateKey(concat_ws("|", col("company_id"),
          col("fiscal_year"), col("quarter_type"))).as("report_id"),
        col("doc_id"),
        col("company_id"), col("document_type"), col("fiscal_year"),
        col("quarter_type"),
        parseDate(col("fiscal_year_end")).as("fiscal_year_end"),
        parseDate(col("filing_date")).as("filing_date"),
        now.as("created_at"), now.as("updated_at"))
    val repW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("report_id"))
      .orderBy(col("filing_date").desc_nulls_last, col("doc_id").desc)
    // persisted: consumed by the reports upsert, the fact join, and the
    // returned quarantine — without it the pivot+join+window lineage
    // would recompute three times
    val ranked = reportsAll
      .withColumn("_rn", row_number().over(repW))
      .persist()
    val reports = ranked.filter(col("_rn") === 1).drop("_rn")
    val dupReportDocs = ranked.filter(col("_rn") > 1)
      .select(col("doc_id"), lit("duplicate_report").as("reason"))
    wh.upsert("financial_reports", reports.drop("doc_id"), Seq("report_id"))

    // ---- fact: join back the hash keys (a broadcast join replaces the
    // reference's collected item_id_map dict, J4) --------------------
    // fiscal_year is denormalized onto the fact as its PARTITION key —
    // the distributed stand-in for the reference's (report_id, item_id)
    // btree indexes: period filters prune whole directories at the scan
    // (SURVEY.md §4), and one year's re-ingest only rewrites one
    // partition's worth of data through the upsert.
    val fact = Extract.factRows(staged)
      .join(badDocs, Seq("doc_id"), "left_anti")
      .join(reports.select(col("doc_id"), col("report_id"), col("fiscal_year")), "doc_id")
      .withColumn("item_id", wh.surrogateKey(col("element_id")))
      .select(
        wh.surrogateKey(concat_ws("|", col("report_id"), col("item_id"),
          col("context_id"))).as("data_id"),
        col("report_id"), col("item_id"), col("duration_type"),
        col("context_id"), col("period_type"), col("consolidated_type"),
        col("value").cast("decimal(20,0)").as("value"),
        col("value_text"), col("is_numeric"),
        now.as("created_at"), now.as("updated_at"),
        col("fiscal_year"))
      .dropDuplicates("data_id")
    wh.upsert("financial_data", fact, Seq("data_id"), Seq("fiscal_year"))

    // cross-table UoW (reference unitofwork.py:89-143): the four
    // publishes above are each atomic but land one at a time — a crash
    // mid-sequence would leave reports without facts for a `read`
    // caller. In manifest mode, ONE DB-pointer flip now pins the
    // consistent four-table set for `readSnapshot` callers; until it
    // lands they keep the previous ingest's snapshot.
    if (wh.manifest)
      wh.commitDbSnapshot(Seq(
        "companies", "financial_items", "financial_reports", "financial_data"))

    // materialize the (tiny) quarantine before releasing the lineage
    val out = quarantine.unionByName(dupReportDocs).persist()
    out.count()
    ranked.unpersist()
    out
  }
}
