package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, StructType}

/** Query result cache — Snowflake/Databricks-style result reuse,
  * rebuilt on the engine's versioned-Parquet layout.
  *
  * A query's fingerprint is the sha-256 of (a) its OPTIMIZED
  * canonicalized plan (exprId-normalized, so re-building the same query
  * from fresh reads fingerprints identically; optimized, so what is
  * hashed is what would actually execute, MV rewrites included) and
  * (b) the identity of every input file — path, length, modification
  * time. Results land in `<root>/<fp>/data` as parquet with the schema
  * pinned in a sidecar, published by staging-dir rename so readers
  * never observe a half-written result.
  *
  * Invalidation is structural, not TTL: the engine's catalog never
  * mutates a file in place — every write is a new version directory —
  * so any data change moves the scanned paths and the fingerprint with
  * them. Raw out-of-catalog dirs are covered by the length/mtime
  * signature. At 100 TB the payoff is the usual one: the second
  * dashboard refresh reads O(result) instead of re-scanning O(fact),
  * and the fingerprint check itself is a driver-side O(#files) stat.
  *
  * The signature walk costs one filesystem stat per input file — for a
  * table of ~10⁵ files this is driver-side milliseconds against a
  * namenode/listing cache, far below the scan it saves; it is NOT free
  * for pathological million-file tables (compact first).
  */
final class ResultCache(val root: String) {

  private def sha(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Stable content identity of `df`'s computation + inputs. */
  def fingerprint(df: DataFrame): String = {
    val qe = df.queryExecution
    val sig = new StringBuilder(qe.optimizedPlan.canonicalized.toString)
    // canonical toString can elide long file lists — append leaf roots
    // explicitly so two tables with the same schema never collide
    qe.optimizedPlan.collectLeaves().foreach {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.foreach(p => sig.append('\n').append(p))
        case other => sig.append('\n').append(other.toString)
      }
      case other => sig.append('\n').append(other.nodeName)
    }
    val hconf = df.sparkSession.sessionState.newHadoopConf()
    df.inputFiles.sorted.foreach { f =>
      val p = new Path(f)
      val st = p.getFileSystem(hconf).getFileStatus(p)
      sig.append('\n').append(f)
        .append('|').append(st.getLen)
        .append('|').append(st.getModificationTime)
    }
    sha(sig.toString)
  }

  /** Serve `df`'s result from the cache, computing and publishing it on
    * the first call. Correctness contract: a hit is byte-identical to
    * re-running the query, because the fingerprint pins both the plan
    * and every input file identity. */
  def cached(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val fp = fingerprint(df)
    val dir = new Path(root, fp)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())

    def readHit(): DataFrame = {
      val metaIn = fs.open(new Path(dir, "schema.json"))
      val schema = try {
        val bytes = new Array[Byte](fs.getFileStatus(new Path(dir, "schema.json")).getLen.toInt)
        metaIn.readFully(bytes)
        DataType.fromJson(new String(bytes, StandardCharsets.UTF_8))
          .asInstanceOf[StructType]
      } finally metaIn.close()
      // explicit schema: a cached EMPTY result has no part files to
      // infer from, and pinned types survive the parquet round-trip
      spark.read.schema(schema).parquet(new Path(dir, "data").toString)
    }

    if (fs.exists(dir)) return readHit()
    val stage = new Path(root,
      s"_stage-$fp-${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.mode("overwrite").parquet(new Path(stage, "data").toString)
    val out = fs.create(new Path(stage, "schema.json"), true)
    try out.write(df.schema.json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.mkdirs(new Path(root))
    if (!fs.rename(stage, dir)) {
      // lost a publish race (or publish failed): discard our attempt and
      // serve whichever result won — same fingerprint, same bytes
      fs.delete(stage, true)
      require(fs.exists(dir), s"result-cache publish failed for $fp under $root")
    }
    readHit()
  }

  /** Drop abandoned staging dirs (a writer killed mid-publish leaves
    * one; they are never read, this just frees the bytes). */
  def vacuumStaging(spark: org.apache.spark.sql.SparkSession): Int = {
    val r = new Path(root)
    val fs = r.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(r)) return 0
    val stale = fs.listStatus(r).filter(_.getPath.getName.startsWith("_stage-"))
    stale.foreach(s => fs.delete(s.getPath, true))
    stale.length
  }
}
