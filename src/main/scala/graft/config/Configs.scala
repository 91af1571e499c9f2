package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Case-class mirrors of the reference's metadata-driven JSON configs.
  *
  * The reference drives every layer from JSON config files — bronze table
  * lists with explode flags (`medallion/bronze/config_company_house.json:6-23`),
  * silver SCD business keys / tracked columns
  * (`medallion/silver/config_yfinance.json:6-57`), and gold
  * dimension/fact definitions with partition columns
  * (`medallion/gold/config.json:6-33`). Parsed with Jackson (already on
  * the Spark classpath) — no new dependencies.
  */
object Configs {

  /** One bronze table: source file pattern + optional array-explode. */
  case class BronzeTableConf(
      name: String,
      file: String,
      explode: Boolean = false,
      explodeColumn: Option[String] = None)

  case class BronzeConf(
      catalog: String,
      schema: String,
      basePath: String,
      format: String,
      tables: Seq[BronzeTableConf])

  /** One SCD-managed silver table: composite business key + tracked columns
    * hashed for change detection (`config_yfinance.json:40-57`). */
  case class ScdTableConf(
      name: String,
      businessKeys: Seq[String],
      trackedColumns: Seq[String],
      hashColumn: String = "row_hash")

  case class SilverConf(
      catalog: String,
      sourceSchema: String,
      targetSchema: String,
      tables: Seq[ScdTableConf])

  case class FactConf(
      name: String,
      sourceTable: String,
      dateColumn: String,
      partitionBy: Seq[String])

  case class GoldConf(
      catalog: String,
      sourceSchema: String,
      targetSchema: String,
      promoteTables: Seq[String],
      dimensions: Seq[String],
      facts: Seq[FactConf])

  private val mapper = new ObjectMapper()

  private def str(n: JsonNode, f: String, default: String = null): String =
    if (n.has(f)) n.get(f).asText else default
  private def strSeq(n: JsonNode, f: String): Seq[String] =
    if (n.has(f)) n.get(f).elements().asScala.map(_.asText).toSeq else Nil

  def parseBronze(json: String): BronzeConf = {
    val n = mapper.readTree(json)
    BronzeConf(
      catalog = str(n, "catalog"),
      schema = str(n, "schema"),
      basePath = str(n, "base_path"),
      format = str(n, "format", "json"),
      tables = n.get("tables").elements().asScala.map { t =>
        BronzeTableConf(
          name = str(t, "name"),
          file = str(t, "file"),
          explode = t.has("explode") && t.get("explode").asBoolean,
          explodeColumn = Option(str(t, "explode_column")))
      }.toSeq)
  }

  def parseSilver(json: String): SilverConf = {
    val n = mapper.readTree(json)
    SilverConf(
      catalog = str(n, "catalog"),
      sourceSchema = str(n, "source_schema", "bronze"),
      targetSchema = str(n, "target_schema", "silver"),
      tables = n.get("tables").elements().asScala.map { t =>
        ScdTableConf(
          name = str(t, "name"),
          businessKeys = strSeq(t, "business_keys"),
          trackedColumns = strSeq(t, "tracked_columns"),
          hashColumn = str(t, "hash_column", "row_hash"))
      }.toSeq)
  }

  def parseGold(json: String): GoldConf = {
    val n = mapper.readTree(json)
    GoldConf(
      catalog = str(n, "catalog"),
      sourceSchema = str(n, "source_schema", "silver"),
      targetSchema = str(n, "target_schema", "gold"),
      promoteTables = strSeq(n, "promote_tables"),
      dimensions = strSeq(n, "dimensions"),
      facts =
        if (!n.has("facts")) Nil
        else n.get("facts").elements().asScala.map { f =>
          FactConf(
            name = str(f, "name"),
            sourceTable = str(f, "source_table"),
            dateColumn = str(f, "date_column"),
            partitionBy = strSeq(f, "partition_by"))
        }.toSeq)
  }
}
