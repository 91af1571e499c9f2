package graft.schema

import org.apache.spark.sql.types.StructType

/** Explicit-schema registry.
  *
  * The reference enforces hand-written StructTypes at read time rather
  * than inferring (`utils/schema.py:41-45,51-110`, applied at
  * `medallion/bronze/ds2b_company_house.py:60` and
  * `medallion/bronze/ds2b_yfinance.py:57`). Same data shapes here, but
  * declared as Spark DDL strings — the most compact schema notation the
  * engine parses natively — rather than nested StructField trees. Keys
  * match the reference's `SCHEMA_MAP` / `YFINANCE_SCHEMA_MAP` table names
  * so metadata configs stay interchangeable.
  *
  * Date-like Companies House fields (`date_of_creation`, filing `date`)
  * land as strings on purpose and are cast downstream with `to_date`,
  * exactly as the reference does (`b2s_company_house.py:68,94`).
  */
object SchemaRegistry {

  private def ddl(s: String): StructType = StructType.fromDDL(s)

  // Companies House bronze: nested JSON payloads.
  val overview: StructType = ddl(
    """company_name string, company_number string, company_status string,
       date_of_creation string, jurisdiction string, type string,
       etag string, has_charges boolean, has_insolvency_history boolean""")

  val officers: StructType = ddl(
    """items array<struct<name: string, officer_role: string,
                          appointed_on: string, nationality: string>>""")

  val filingHistory: StructType = ddl(
    """items array<struct<date: string, type: string,
                          description: string, category: string>>""")

  // Yahoo Finance bronze: flat CSV extracts.
  val companyDetails: StructType = ddl(
    """company_name string, company_number string, ticker string,
       symbol string, short_name string, long_name string, industry string,
       sector string, country string, exchange string, market_cap bigint,
       website string, ingestion_date date""")

  val fundamentals: StructType = ddl(
    """company_name string, company_number string, ticker string,
       quarter_end_date date, total_revenue double, gross_profit double,
       operating_income double, net_income double, ebitda double,
       total_assets double, total_liabilities double, cash double,
       long_term_debt double, operating_cash_flow double,
       capital_expenditure double, free_cash_flow double,
       ingestion_date date""")

  val trading: StructType = ddl(
    """company_number string, ticker string, date date, open double,
       high double, low double, close double, adj_close double,
       volume bigint, ingestion_date date""")

  /** Table-name → schema maps, keyed like the reference's two registries. */
  val companiesHouse: Map[String, StructType] = Map(
    "overview" -> overview,
    "officers" -> officers,
    "filing_history" -> filingHistory)

  val yfinance: Map[String, StructType] = Map(
    "company_details" -> companyDetails,
    "fundamentals_data" -> fundamentals,
    "trading_data" -> trading)

  val all: Map[String, StructType] = companiesHouse ++ yfinance
}
