package graft.ops

import graft.core.Clock

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver company-master derivation (SURVEY.md §2.2-§2.4, J1, A1-A3).
  *
  * Reference flow (`medallion/silver/b2s_company_house.py:55-121`):
  * clean overview → aggregate officers / filings → two left joins on the
  * business key → derived age/activity flags.
  *
  * Scale notes: the two summary sides are aggregates over the same key as
  * the join, so Catalyst plans partial (map-side) aggregation before the
  * shuffle; at 100 TB the summaries are orders of magnitude smaller than
  * the fact side and AQE auto-broadcasts them — no manual repartition
  * needed. Key dedupe is a deterministic argmax (greatest payload tuple),
  * never `dropDuplicates(key)` — an arbitrary winner can flip between
  * runs and poison byte-stable outputs downstream.
  */
object Master {

  /** Clean & conform overview rows (`b2s_company_house.py:62-70`):
    * non-null key, trimmed name, typed creation date, Initcap status,
    * dedupe by business key. The reference's `dropDuplicates(key)` keeps
    * an ARBITRARY row per key — a re-ingested company could flip which
    * file's metadata survives between runs. The argmax pins the winner
    * deterministically (greatest payload tuple; for byte-identical
    * re-ingestions that is the latest `file_path`, i.e. the newest
    * ingestion date), as one partial-aggregating shuffle on the key. */
  def cleanOverview(overview: DataFrame): DataFrame = {
    val cleaned = overview
      .filter(col("company_number").isNotNull)
      .withColumn("company_name", trim(col("company_name")))
      .withColumn("date_of_creation", to_date(col("date_of_creation")))
      .withColumn("company_status", initcap(col("company_status")))
    val payload = cleaned.columns.filterNot(_ == "company_number").toSeq
    cleaned.groupBy(col("company_number"))
      .agg(max(struct(payload.map(col): _*)).as("__winner"))
      .select(col("company_number") +: payload.map(c => col(s"__winner.$c").as(c)): _*)
  }

  /** A1 + A2 — officers per company (`b2s_company_house.py:78-85`). */
  def officerSummary(officers: DataFrame): DataFrame =
    officers
      .groupBy("company_number")
      .agg(
        count(lit(1)).as("officer_count"),
        countDistinct(col("officer_role")).as("unique_roles"))

  /** A3 + A1 — filing recency/volume (`b2s_company_house.py:92-100`). */
  def filingSummary(filings: DataFrame): DataFrame =
    filings
      .withColumn("date", to_date(col("date")))
      .groupBy("company_number")
      .agg(
        max(col("date")).as("last_filing_date"),
        count(lit(1)).as("filing_count"))

  /** J1 ×2 + P7/P8 — company master: left joins (USING-style so the key
    * is not duplicated) plus derived columns
    * (`b2s_company_house.py:107-121`). `clock` pins `current_date()` for
    * reproducibility (SURVEY.md §7.4). */
  def companyMaster(
      overviewClean: DataFrame,
      officerSum: DataFrame,
      filingSum: DataFrame,
      clock: Clock): DataFrame =
    overviewClean
      .join(officerSum, Seq("company_number"), "left")
      .join(filingSum, Seq("company_number"), "left")
      .withColumn("company_age",
        year(lit(java.sql.Date.valueOf(clock.today))) - year(col("date_of_creation")))
      .withColumn("is_active",
        when(col("company_status") === "Active", lit(true)).otherwise(lit(false)))
      .withColumn("last_updated_ts", current_timestamp())
      .filter(col("company_age") >= 0)
}
