package graft.schema

import org.apache.spark.sql.types._

/** Explicit-schema registry.
  *
  * The reference enforces hand-written StructTypes at read time rather
  * than inferring (`utils/schema.py:41-45,51-110`, applied at
  * `medallion/bronze/ds2b_company_house.py:60` and
  * `medallion/bronze/ds2b_yfinance.py:57`). Same data shapes here,
  * expressed with the Scala StructType API. Keys match the reference's
  * `SCHEMA_MAP` / `YFINANCE_SCHEMA_MAP` table names so metadata configs
  * stay interchangeable.
  */
object SchemaRegistry {

  // -- Companies House bronze (nested JSON) — utils/schema.py:7-35 --

  val overview: StructType = StructType(Seq(
    StructField("company_name", StringType),
    StructField("company_number", StringType),
    StructField("company_status", StringType),
    StructField("date_of_creation", StringType), // ISO date-as-string; cast downstream
    StructField("jurisdiction", StringType),
    StructField("type", StringType),
    StructField("etag", StringType),
    StructField("has_charges", BooleanType),
    StructField("has_insolvency_history", BooleanType)))

  val officers: StructType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("officer_role", StringType),
      StructField("appointed_on", StringType),
      StructField("nationality", StringType)))))))

  val filingHistory: StructType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("date", StringType),
      StructField("type", StringType),
      StructField("description", StringType),
      StructField("category", StringType)))))))

  // -- Yahoo Finance bronze (flat CSV) — utils/schema.py:51-110 --

  val companyDetails: StructType = StructType(Seq(
    StructField("company_name", StringType),
    StructField("company_number", StringType),
    StructField("ticker", StringType),
    StructField("symbol", StringType),
    StructField("short_name", StringType),
    StructField("long_name", StringType),
    StructField("industry", StringType),
    StructField("sector", StringType),
    StructField("country", StringType),
    StructField("exchange", StringType),
    StructField("market_cap", LongType),
    StructField("website", StringType),
    StructField("ingestion_date", DateType)))

  val fundamentals: StructType = StructType(Seq(
    StructField("company_name", StringType),
    StructField("company_number", StringType),
    StructField("ticker", StringType),
    StructField("quarter_end_date", DateType),
    StructField("total_revenue", DoubleType),
    StructField("gross_profit", DoubleType),
    StructField("operating_income", DoubleType),
    StructField("net_income", DoubleType),
    StructField("ebitda", DoubleType),
    StructField("total_assets", DoubleType),
    StructField("total_liabilities", DoubleType),
    StructField("cash", DoubleType),
    StructField("long_term_debt", DoubleType),
    StructField("operating_cash_flow", DoubleType),
    StructField("capital_expenditure", DoubleType),
    StructField("free_cash_flow", DoubleType),
    StructField("ingestion_date", DateType)))

  val trading: StructType = StructType(Seq(
    StructField("company_number", StringType),
    StructField("ticker", StringType),
    StructField("date", DateType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("adj_close", DoubleType),
    StructField("volume", LongType),
    StructField("ingestion_date", DateType)))

  /** Companies House map — mirrors `utils/schema.py:41-45`. */
  val companiesHouse: Map[String, StructType] = Map(
    "overview" -> overview,
    "officers" -> officers,
    "filing_history" -> filingHistory)

  /** Yahoo Finance map — mirrors `utils/schema.py:51-110`. */
  val yfinance: Map[String, StructType] = Map(
    "company_details" -> companyDetails,
    "fundamentals_data" -> fundamentals,
    "trading_data" -> trading)

  val all: Map[String, StructType] = companiesHouse ++ yfinance
}
