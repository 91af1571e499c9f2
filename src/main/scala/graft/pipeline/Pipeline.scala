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
    val b = silverCompanyMasterBatch(catalog, clock)
    cat.overwrite(b.build(n => cat.read(spark, n)), b.name, b.partitionBy)
  }

  private def silverCompanyMasterBatch(catalog: String, clock: Clock) =
    TableCatalog.ChainedBatch(s"$catalog.silver.company_master", read => {
      Master.companyMaster(
        Master.cleanOverview(read(s"$catalog.bronze.overview")),
        Master.officerSummary(read(s"$catalog.bronze.officers")),
        Master.filingSummary(read(s"$catalog.bronze.filing_history")),
        clock)
    }, partitionBy = Seq("company_status"))

  /** Silver SCD2 for YFinance tables (`medallion/silver/b2s_yfinance.py:66-190`). */
  def silverScd2(spark: SparkSession, conf: SilverConf, cat: TableCatalog,
      clock: Clock = Clock.Wall): Unit =
    silverScd2Batches(spark, conf, cat, clock).foreach { b =>
      cat.overwrite(b.build(n => cat.read(spark, n)), b.name, b.partitionBy)
    }

  private def silverScd2Batches(spark: SparkSession, conf: SilverConf,
      cat: TableCatalog, clock: Clock): Seq[TableCatalog.ChainedBatch] =
    conf.tables.map { t =>
      val targetName = s"${conf.catalog}.${conf.targetSchema}.${t.name}"
      TableCatalog.ChainedBatch(targetName, read => {
        val src0 = read(s"${conf.catalog}.${conf.sourceSchema}.${t.name}")
        val src = Quality.nonNegativeNumerics(Quality.requireKeys(src0, t.businessKeys))
        val scd = new Scd2(t.businessKeys, t.trackedColumns,
          ScdColumns(hash = t.hashColumn), clock)
        // merge base = pre-transaction state (the live catalog, never a
        // same-transaction staging — SCD2 folds onto published history)
        val target = if (cat.exists(targetName)) Some(cat.read(spark, targetName)) else None
        scd(target, src)
      })
    }

  /** Gold: promote + dimensions (current snapshot, clustered) + facts
    * with KPIs (`medallion/gold/s2g.py:58-156`). */
  def gold(spark: SparkSession, conf: GoldConf, cat: TableCatalog): Unit =
    goldBatches(conf).foreach { b =>
      cat.overwrite(b.build(n => cat.read(spark, n)), b.name, b.partitionBy)
    }

  private def goldBatches(conf: GoldConf): Seq[TableCatalog.ChainedBatch] = {
    def silverName(n: String) = s"${conf.catalog}.${conf.sourceSchema}.$n"
    def cluster(df: DataFrame): DataFrame =
      if (df.columns.contains("company_number")) Gold.clusterBy(df, Seq("company_number"))
      else df
    val promoted = conf.promoteTables.map { t =>
      TableCatalog.ChainedBatch(s"${conf.catalog}.${conf.targetSchema}.$t",
        read => Gold.dropTechnical(read(silverName(t))))
    }
    val dims = conf.dimensions.map { d =>
      TableCatalog.ChainedBatch(s"${conf.catalog}.${conf.targetSchema}.dim_$d",
        read => cluster(Gold.dropTechnical(Gold.currentOnly(read(silverName(d))))))
    }
    val facts = conf.facts.map { f =>
      TableCatalog.ChainedBatch(s"${conf.catalog}.${conf.targetSchema}.${f.name}",
        read => {
          var df = Gold.dropTechnical(Gold.currentOnly(read(silverName(f.sourceTable))))
          if (f.name == "fact_fundamentals")
            df = Gold.fundamentalsKpis(df, orderCols = Seq(f.dateColumn))
          cluster(df)
        }, partitionBy = f.partitionBy)
    }
    promoted ++ dims ++ facts
  }

  /** Fail-fast orchestration (`main.py:29-40`): bronze lands per-table
    * (raw ingest, no cross-table invariant), then silver AND gold stage
    * in dependency order and publish in ONE multi-table atomic commit
    * ([[TableCatalog.publishAtomicChained]]) — a [[TableCatalog.snapshot]]
    * reader never observes new silver with stale gold, which the
    * reference's sequential Delta writes cannot guarantee. Gold builds
    * from the exact staged silver bytes (no early publish, no double
    * compute); any layer exception aborts with nothing published. */
  def run(spark: SparkSession,
      bronzeCh: BronzeConf, bronzeYf: BronzeConf,
      silverYf: SilverConf, goldConf: GoldConf,
      cat: TableCatalog, clock: Clock = Clock.Wall): Unit = {
    bronzeCompanyHouse(spark, bronzeCh, cat)
    bronzeYFinance(spark, bronzeYf, cat)
    cat.publishAtomicChained(spark,
      silverCompanyMasterBatch(bronzeCh.catalog, clock) +:
        (silverScd2Batches(spark, silverYf, cat, clock) ++ goldBatches(goldConf)))
  }
}
