package graft

import graft.config.Configs
import org.scalatest.funsuite.AnyFunSuite

/** JSON config parsing — the metadata-driven surface mirroring the
  * reference's config vocabulary (SURVEY.md §1.1). */
class ConfigsSpec extends AnyFunSuite {

  test("parseBronze: tables, explode flags, defaults") {
    val c = Configs.parseBronze(
      """{"catalog": "companies", "schema": "bronze",
         "base_path": "/raw/ch", "format": "json",
         "tables": [
           {"name": "overview", "file": "overview.json"},
           {"name": "officers", "file": "officers.json",
            "explode": true, "explode_column": "items"}]}""")
    assert(c.catalog == "companies" && c.basePath == "/raw/ch")
    assert(c.tables.map(_.name) == Seq("overview", "officers"))
    assert(!c.tables.head.explode && c.tables.head.explodeColumn.isEmpty)
    assert(c.tables(1).explode && c.tables(1).explodeColumn.contains("items"))
  }

  test("parseSilver: composite business keys and defaults") {
    val c = Configs.parseSilver(
      """{"catalog": "companies",
         "tables": [
           {"name": "trading_data",
            "business_keys": ["company_number", "date"],
            "tracked_columns": ["open", "close", "volume"]}]}""")
    assert(c.sourceSchema == "bronze" && c.targetSchema == "silver")
    assert(c.tables.head.businessKeys == Seq("company_number", "date"))
    assert(c.tables.head.hashColumn == "row_hash")
  }

  test("parseGold: promote/dims/facts with partitioning") {
    val c = Configs.parseGold(
      """{"catalog": "companies",
         "promote_tables": ["company_master"],
         "dimensions": ["company_details"],
         "facts": [
           {"name": "fact_trading", "source_table": "trading_data",
            "date_column": "date", "partition_by": ["date"]}]}""")
    assert(c.promoteTables == Seq("company_master"))
    assert(c.facts.head.partitionBy == Seq("date"))
    assert(Configs.parseGold("""{"catalog": "x"}""").facts.isEmpty)
  }
}
