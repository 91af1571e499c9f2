package graft.pipeline

import graft.config.Configs._
import graft.core.{Clock, TableCatalog}
import graft.ops._
import graft.scd.{Scd2, ScdColumns}
import graft.schema.SchemaRegistry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Medallion pipeline layers — the reference's five entry points
  * (`main.py:29-40`) rebuilt on the graft operator library, reading and
  * writing through the Parquet-backed [[TableCatalog]] instead of Unity
  * Catalog + Delta.
  */
object Pipeline {

  /** Bronze Companies House: raw JSON → typed bronze tables
    * (`medallion/bronze/ds2b_company_house.py:17-101`). */
  def bronzeCompanyHouse(spark: SparkSession, conf: BronzeConf, cat: TableCatalog): Unit = {
    conf.tables.foreach { t =>
      val glob = s"${conf.basePath}/*/*/${t.file}"
      var df = Ingest.json(spark, SchemaRegistry.companiesHouse(t.name), glob)
      df = Ingest.withPathIdentity(Ingest.withFilePath(df))
      if (t.explode) {
        val arrayCol = t.explodeColumn.getOrElse("items")
        df = Ingest.explodeItems(df, arrayCol, Seq("company_number", "file_path"))
      }
      df = Ingest.withAudit(df)
      cat.overwrite(df, s"${conf.catalog}.${conf.schema}.${t.name}")
    }
  }

  /** Bronze YFinance: raw CSV → typed bronze tables
    * (`medallion/bronze/ds2b_yfinance.py:17-78`). */
  def bronzeYFinance(spark: SparkSession, conf: BronzeConf, cat: TableCatalog): Unit = {
    conf.tables.foreach { t =>
      val glob = s"${conf.basePath}/${t.file}"
      var df = Ingest.csv(spark, SchemaRegistry.yfinance(t.name), glob)
      df = Ingest.withFilePath(df)
      df = Ingest.cleanColumnNames(Ingest.withAudit(df))
      cat.overwrite(df, s"${conf.catalog}.${conf.schema}.${t.name}")
    }
  }

  /** Silver company master (`medallion/silver/b2s_company_house.py:55-136`). */
  def silverCompanyMaster(spark: SparkSession, catalog: String, cat: TableCatalog,
      clock: Clock = Clock.Wall): Unit = {
    val overview = cat.read(spark, s"$catalog.bronze.overview")
    val officers = cat.read(spark, s"$catalog.bronze.officers")
    val filings = cat.read(spark, s"$catalog.bronze.filing_history")
    val master = Master.companyMaster(
      Master.cleanOverview(overview),
      Master.officerSummary(officers),
      Master.filingSummary(filings),
      clock)
    cat.overwrite(master, s"$catalog.silver.company_master", partitionBy = Seq("company_status"))
  }

  /** Silver SCD2 for YFinance tables (`medallion/silver/b2s_yfinance.py:66-190`). */
  def silverScd2(spark: SparkSession, conf: SilverConf, cat: TableCatalog,
      clock: Clock = Clock.Wall): Unit = {
    conf.tables.foreach { t =>
      val src0 = cat.read(spark, s"${conf.catalog}.${conf.sourceSchema}.${t.name}")
      val src = Quality.nonNegativeNumerics(Quality.requireKeys(src0, t.businessKeys))
      val scd = new Scd2(t.businessKeys, t.trackedColumns,
        ScdColumns(hash = t.hashColumn), clock)
      val targetName = s"${conf.catalog}.${conf.targetSchema}.${t.name}"
      val target = if (cat.exists(targetName)) Some(cat.read(spark, targetName)) else None
      cat.overwrite(scd(target, src), targetName)
    }
  }

  /** Gold: promote + dimensions (current snapshot, clustered) + facts
    * with KPIs (`medallion/gold/s2g.py:58-156`). */
  def gold(spark: SparkSession, conf: GoldConf, cat: TableCatalog): Unit = {
    def silverTable(n: String): DataFrame =
      cat.read(spark, s"${conf.catalog}.${conf.sourceSchema}.$n")

    conf.promoteTables.foreach { t =>
      cat.overwrite(Gold.dropTechnical(silverTable(t)), s"${conf.catalog}.${conf.targetSchema}.$t")
    }
    conf.dimensions.foreach { d =>
      val df = Gold.dropTechnical(Gold.currentOnly(silverTable(d)))
      val clustered =
        if (df.columns.contains("company_number")) Gold.clusterBy(df, Seq("company_number"))
        else df
      cat.overwrite(clustered, s"${conf.catalog}.${conf.targetSchema}.dim_$d")
    }
    conf.facts.foreach { f =>
      var df = Gold.dropTechnical(Gold.currentOnly(silverTable(f.sourceTable)))
      if (f.name == "fact_fundamentals")
        df = Gold.fundamentalsKpis(df, orderCols = Seq(f.dateColumn))
      val clustered =
        if (df.columns.contains("company_number")) Gold.clusterBy(df, Seq("company_number"))
        else df
      cat.overwrite(clustered, s"${conf.catalog}.${conf.targetSchema}.${f.name}",
        partitionBy = f.partitionBy)
    }
  }

  /** Sequential fail-fast orchestration (`main.py:29-40`): any layer
    * exception aborts the remainder. */
  def run(spark: SparkSession,
      bronzeCh: BronzeConf, bronzeYf: BronzeConf,
      silverYf: SilverConf, goldConf: GoldConf,
      cat: TableCatalog, clock: Clock = Clock.Wall): Unit = {
    bronzeCompanyHouse(spark, bronzeCh, cat)
    bronzeYFinance(spark, bronzeYf, cat)
    silverCompanyMaster(spark, bronzeCh.catalog, cat, clock)
    silverScd2(spark, silverYf, cat, clock)
    gold(spark, goldConf, cat)
  }
}
