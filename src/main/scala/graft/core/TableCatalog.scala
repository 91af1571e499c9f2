package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Filesystem-backed table catalog.
  *
  * The reference registers every table in a three-level Unity Catalog
  * namespace `` `catalog`.schema.table `` and persists as Delta
  * (`medallion/bronze/ds2b_company_house.py:91-97`). This runtime has no
  * Delta jars and no metastore, so the catalog is a façade mapping the
  * same three-level names to Parquet directories, with *versioned
  * overwrite* standing in for Delta's ACID rewrite: a new version is
  * written to `<table>/v=<n+1>` and a `_CURRENT` pointer file is swapped
  * atomically, because Spark cannot overwrite a Parquet path it is
  * currently reading (SURVEY.md §7.4 "Delta MERGE without Delta").
  *
  * Single-writer semantics (matching the reference's
  * maxConcurrentRuns=1 orchestration, `aws/ ch_ingest_company_overview_raw.json`).
  */
final class TableCatalog(val root: String) extends Serializable {

  private def tableDir(name: String): Path =
    Paths.get(root, name.replace("`", "").split('.').mkString("/"))

  private def currentPointer(name: String): Path = tableDir(name).resolve("_CURRENT")

  def exists(name: String): Boolean = Files.exists(currentPointer(name))

  def currentPath(name: String): String = {
    val v = Files.readString(currentPointer(name)).trim
    tableDir(name).resolve(v).toString
  }

  def read(spark: SparkSession, name: String): DataFrame =
    spark.read.parquet(currentPath(name))

  /** Write `df` as the next version of `name` and atomically repoint. */
  def overwrite(df: DataFrame, name: String, partitionBy: Seq[String] = Nil): Unit = {
    val dir = tableDir(name)
    Files.createDirectories(dir)
    val nextV = "v%06d".format(nextVersion(dir))
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dir.resolve(nextV).toString)
    val tmp = dir.resolve("_CURRENT.tmp")
    Files.writeString(tmp, nextV)
    Files.move(tmp, currentPointer(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    pruneOldVersions(dir, keep = 2)
  }

  /** Append = read current ∪ new → write next version (no in-place append
    * on an immutable Parquet version dir). */
  def append(df: DataFrame, name: String): Unit = {
    val spark = df.sparkSession
    val merged =
      if (exists(name)) read(spark, name).unionByName(df, allowMissingColumns = true)
      else df
    overwrite(merged, name)
  }

  private def nextVersion(dir: Path): Int = {
    val existing = Option(dir.toFile.list()).getOrElse(Array.empty[String])
      .filter(_.startsWith("v"))
      .flatMap(s => scala.util.Try(s.drop(1).toInt).toOption)
    if (existing.isEmpty) 1 else existing.max + 1
  }

  private def pruneOldVersions(dir: Path, keep: Int): Unit = {
    val versions = Option(dir.toFile.list()).getOrElse(Array.empty[String])
      .filter(_.startsWith("v")).sorted
    versions.dropRight(keep).foreach { v =>
      val p = dir.resolve(v)
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    }
  }
}
