package graft

import java.nio.file.{Files, Paths}

import graft.core.TableCatalog
import org.apache.spark.sql.functions._

/** Column-masking policies and the export-manifest handoff: masks must
  * redact at read time without touching data (and fail loudly when
  * misconfigured); a manifest must pin ONE version's exact files,
  * survive later writes, and refuse to export un-purged erasures. */
class CatalogGovernanceSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(tag: String): TableCatalog = {
    val root = Files.createTempDirectory(Paths.get("target"), s"gov-$tag-")
    new TableCatalog(root.toString)
  }

  private def people = Seq(
    (1L, "alice@example.com", "4111222233334444", 30L),
    (2L, "bob@test.org", "550012349876", 40L)).toDF("id", "email", "card", "age")

  test("mask policies: sha256 pseudonym, last4, nullify; data untouched") {
    val cat = freshCat("mask")
    cat.overwrite(people, "gov.people")
    cat.setProperty("gov.people", "mask.email", "sha256")
    cat.setProperty("gov.people", "mask.card", "last4")
    cat.setProperty("gov.people", "mask.age", "nullify")
    val m = cat.readMasked(spark, "gov.people").orderBy("id").collect()
    // sha256 is a deterministic pseudonym — equality on it still works
    assert(m(0).getString(1) ===
      sha256Hex("alice@example.com") )
    assert(m(0).getString(2) === "************4444")
    assert(m(1).getString(2) === "********9876")
    assert(m(0).isNullAt(3) && m(1).isNullAt(3))
    // physical data untouched; unmasked read unaffected
    val raw = cat.read(spark, "gov.people").orderBy("id").collect()
    assert(raw(0).getString(1) === "alice@example.com")
    assert(raw(0).getLong(3) === 30L)
  }

  private def sha256Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("mask policies: short values pass last4 unmasked; bad config fails loudly") {
    val cat = freshCat("maskedge")
    cat.overwrite(Seq((1L, "abc")).toDF("id", "code"), "gov.t")
    cat.setProperty("gov.t", "mask.code", "last4")
    assert(cat.readMasked(spark, "gov.t").collect()(0).getString(1) === "abc")
    cat.setProperty("gov.t", "mask.code", "rot13")
    intercept[IllegalArgumentException](cat.readMasked(spark, "gov.t"))
    val cat2 = freshCat("maskmiss")
    cat2.overwrite(Seq((1L, "x")).toDF("id", "v"), "gov.u")
    cat2.setProperty("gov.u", "mask.nope", "sha256")
    intercept[IllegalArgumentException](cat2.readMasked(spark, "gov.u"))
  }

  test("row-level security: principal-resolved filters compose with masks") {
    val cat = freshCat("rls")
    val rows = Seq(
      (1L, "acme", "alice@example.com", 100L),
      (2L, "acme", "a2@example.com", 70L),
      (3L, "globex", "bob@test.org", 50L)).toDF("id", "tenant", "email", "amount")
    cat.overwrite(rows, "gov.sales")
    // shared per-tenant policy via ${principal}; an auditor override
    cat.setProperty("gov.sales", "rls.default", "tenant = '${principal}'")
    cat.setProperty("gov.sales", "rls.auditor", "amount >= 0")
    assert(cat.readAs(spark, "gov.sales", "acme")
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(cat.readAs(spark, "gov.sales", "globex")
      .select("id").collect().map(_.getLong(0)).toSet == Set(3L))
    assert(cat.readAs(spark, "gov.sales", "auditor").count() === 3)
    // masks still apply on top, and the row filter sees the PRE-mask
    // value (filter-then-mask): tenant itself can be masked while the
    // policy filters on it
    cat.setProperty("gov.sales", "mask.email", "sha256")
    cat.setProperty("gov.sales", "mask.tenant", "sha256")
    val m = cat.readAs(spark, "gov.sales", "acme").orderBy("id").collect()
    assert(m.length == 2)
    assert(m(0).getAs[String]("email") === sha256Hex("alice@example.com"))
    assert(m(0).getAs[String]("tenant") === sha256Hex("acme"))
    // policy over a missing column fails loudly, never silently over-shares
    cat.setProperty("gov.sales", "rls.default", "no_such_col = 1")
    intercept[IllegalArgumentException] {
      cat.readAs(spark, "gov.sales", "acme").collect()
    }
    // no policy at all -> unfiltered governed read
    val cat2 = freshCat("rls2")
    cat2.overwrite(rows, "gov.sales")
    assert(cat2.readAs(spark, "gov.sales", "anyone").count() === 3)
  }

  test("row-level security: a hostile principal is data, not SQL") {
    val cat = freshCat("rlsinj")
    val rows = Seq(
      (1L, "acme", 100L), (2L, "acme", 70L), (3L, "globex", 50L))
      .toDF("id", "tenant", "amount")
    cat.overwrite(rows, "gov.sales")
    cat.setProperty("gov.sales", "rls.default", "tenant = '${principal}'")
    // classic injection: would rewrite the predicate to TRUE if the
    // principal were spliced into the SQL text
    assert(cat.readAs(spark, "gov.sales", "x' OR '1'='1").count() === 0)
    assert(cat.readAs(spark, "gov.sales", "acme' OR tenant = 'globex")
      .count() === 0)
    // a principal that IS a legitimate tenant still resolves normally
    assert(cat.readAs(spark, "gov.sales", "globex").count() === 1)
    // unquoted placeholder form: still literal-substituted, not spliced
    cat.setProperty("gov.sales", "rls.default", "tenant = ${principal}")
    assert(cat.readAs(spark, "gov.sales", "1 OR 1=1").count() === 0)
    assert(cat.readAs(spark, "gov.sales", "acme").count() === 2)
    // composed-literal form keeps substring substitution
    cat.setProperty("gov.sales", "rls.default",
      "tenant = concat('ac', '${principal}')")
    assert(cat.readAs(spark, "gov.sales", "me").count() === 2)
  }

  test("export manifest: pins the version's files; read survives later writes") {
    val cat = freshCat("manifest")
    val v1 = spark.range(0, 100).select(col("id"),
      (col("id") % 3).cast("string").as("p"))
    cat.overwrite(v1, "gov.fact", partitionBy = Seq("p"))
    val mf = cat.exportManifest(spark, "gov.fact")
    assert(Files.isRegularFile(mf))
    // manifest read = current read, including partition-column recovery
    val viaManifest = cat.readManifest(spark, mf)
    assert(viaManifest.columns.sorted.toSeq === Seq("id", "p"))
    assert(viaManifest.agg(sum("id")).collect()(0).getLong(0) === 4950L)
    assert(viaManifest.filter(col("p") === "1").count() === 33L)
    // a later overwrite must NOT change what the manifest reads
    cat.overwrite(spark.range(0, 5).select(col("id"),
      lit("9").as("p")), "gov.fact", partitionBy = Seq("p"))
    assert(cat.readManifest(spark, mf).count() === 100L)
    assert(cat.read(spark, "gov.fact").count() === 5L)
  }

  test("export manifest: excludes sidecars and refuses pending deletion vectors") {
    val cat = freshCat("manifestdv")
    cat.overwrite(spark.range(0, 50).select(col("id"), col("id").as("k")),
      "gov.keys")
    cat.analyze(spark, "gov.keys", Seq("k")) // writes a _stats sidecar
    val mf = cat.exportManifest(spark, "gov.keys")
    val body = Files.readString(mf)
    assert(!body.contains("_stats") && !body.contains("_SUCCESS"), body)
    // logical GDPR purge → export must refuse until the physical rewrite
    cat.purgeKeys(spark, "gov.keys", "k", Seq(7L))
    intercept[IllegalArgumentException](cat.exportManifest(spark, "gov.keys"))
    cat.purgeRewrite(spark, "gov.keys")
    val mf2 = cat.exportManifest(spark, "gov.keys")
    assert(cat.readManifest(spark, mf2).count() === 49L)
  }

  test("TIMESTAMP AS OF resolves the latest version committed at or before") {
    val cat = freshCat("asof")
    cat.overwrite(Seq((1L, "old")).toDF("k", "v"), "gov.tt")
    cat.overwrite(Seq((1L, "new"), (2L, "x")).toDF("k", "v"), "gov.tt")
    // pin deterministic commit times on the two retained versions
    val dir = Paths.get(cat.root, "gov", "tt")
    Files.writeString(dir.resolve("v000001").resolve("_commit_ts"), "1000")
    Files.writeString(dir.resolve("v000002").resolve("_commit_ts"), "2000")
    assert(cat.commitTs("gov.tt", "v000001") === 1000L)
    // between the commits → v1; at/after the second → v2
    assert(cat.readAsOf(spark, "gov.tt", 1500L).collect()
      .map(_.getString(1)).toSeq === Seq("old"))
    assert(cat.readAsOf(spark, "gov.tt", 2000L).count() === 2L)
    assert(cat.readAsOf(spark, "gov.tt", 999999999999999L).count() === 2L)
    // before every retained version → loud failure, never newer data
    intercept[IllegalArgumentException](cat.readAsOf(spark, "gov.tt", 999L))
    // rollback must NOT re-date the old version
    cat.rollback("gov.tt", "v000001")
    assert(cat.commitTs("gov.tt", "v000001") === 1000L)
  }

  test("subject-access export: pruned pull across tables; erased → empty") {
    val cat = freshCat("subject")
    // clustered layout so the bloom sidecar can actually prune files
    cat.overwrite(spark.range(0, 4000)
      .select(col("id").as("uid"), (col("id") % 7).as("v"))
      .repartitionByRange(4, col("uid")).sortWithinPartitions("uid"),
      "gov.orders2")
    cat.overwrite(Seq((42L, "a@x"), (7L, "b@y")).toDF("uid", "email"),
      "gov.users")
    cat.analyzeBloom(spark, "gov.orders2", "uid")
    val rep = cat.subjectRows(spark,
      Seq("gov.orders2" -> "uid", "gov.users" -> "uid"), 42L)
    val got = rep.collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.count(_._1 == "gov.orders2") === 1)
    assert(got.count(_._1 == "gov.users") === 1)
    assert(got.exists(_._2.contains("a@x")))
    // bloom pruning engaged: only files admitting uid=42 are touched
    assert(cat.bloomPrunedFiles(spark, "gov.orders2", "uid", Seq(42L)).size < 4)
    // erasure wins over access: purged subject yields zero rows
    cat.purgeKeys(spark, "gov.users", "uid", Seq(42L))
    val after = cat.subjectRows(spark,
      Seq("gov.users" -> "uid"), 42L).count()
    assert(after === 0L)
  }

  test("manifest read fails loudly when a pinned file drifts") {
    val cat = freshCat("drift")
    cat.overwrite(spark.range(0, 10).toDF("id"), "gov.d")
    val mf = cat.exportManifest(spark, "gov.d")
    // corrupt one pinned file by appending a byte
    val root = Paths.get(cat.currentPath("gov.d"))
    val f = Files.list(root).filter(p =>
      p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    Files.write(f, Array[Byte](0), java.nio.file.StandardOpenOption.APPEND)
    intercept[IllegalArgumentException](cat.readManifest(spark, mf))
  }

  test("generated column: computed when absent — on create, append, and evolution") {
    val cat = freshCat("gen")
    cat.setGeneratedColumn(spark, "gov.g", "age_band", "age div 10")
    cat.overwrite(people.select("id", "age"), "gov.g")
    val r0 = cat.read(spark, "gov.g").orderBy("id").collect()
    assert(r0.map(_.getAs[Long]("age_band")).toSeq == Seq(3L, 4L))
    // append WITHOUT the generated column: computed, fast path preserved
    cat.append(Seq((3L, 55L)).toDF("id", "age"), "gov.g")
    val r1 = cat.read(spark, "gov.g").orderBy("id").collect()
    assert(r1.length == 3 && r1(2).getAs[Long]("age_band") == 5L)
    // append carried previous files by hardlink (O(batch), not rewrite)
    val files = Paths.get(cat.currentPath("gov.g")).toFile.listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files > 1, "hardlink carry expected, found a rewrite")
  }

  test("generated column: supplied values validated; mismatching batch rejected whole") {
    val cat = freshCat("genval")
    cat.setGeneratedColumn(spark, "gov.gv", "age_band", "age div 10")
    cat.overwrite(people.select("id", "age"), "gov.gv")
    // correct supplied values pass
    cat.append(Seq((3L, 55L, 5L)).toDF("id", "age", "age_band"), "gov.gv")
    assert(cat.read(spark, "gov.gv").count() == 3)
    // wrong supplied value: batch rejected, table untouched
    val e = intercept[IllegalStateException](
      cat.append(Seq((4L, 60L, 99L)).toDF("id", "age", "age_band"), "gov.gv"))
    assert(e.getMessage.contains("_generated_age_band"))
    assert(cat.read(spark, "gov.gv").count() == 3)
  }

  test("generated column declaration parse-checks the expression") {
    val cat = freshCat("genparse")
    intercept[Exception](
      cat.setGeneratedColumn(spark, "gov.s", "bad", "age divv 10"))
  }

  test("generated column declared AFTER data exists judges new batches only") {
    val cat = freshCat("genlate")
    cat.overwrite(people.select("id", "age"), "gov.gl")
    // declare once rows already exist; historical rows are never re-judged
    cat.setGeneratedColumn(spark, "gov.gl", "age_band", "age div 10")
    // evolution append (extra column → union-rewrite path): must succeed —
    // the pre-fix behavior re-ran the formula check over ALL rows and a
    // late-declared column permanently blocked every evolution append
    cat.append(Seq((3L, 55L, "x")).toDF("id", "age", "note"), "gov.gl")
    val r = cat.read(spark, "gov.gl").orderBy("id").collect()
    assert(r.length == 3)
    // the new batch got the computed column; old rows are null-padded
    assert(r(2).getAs[Long]("age_band") == 5L)
    // a DIVERGING supplied value in the batch is still rejected on the
    // evolution path (batch-scoped check, not dropped with the fix)
    val e = intercept[IllegalStateException](cat.append(
      Seq((4L, 60L, "y", 99L)).toDF("id", "age", "note2", "age_band"),
      "gov.gl"))
    assert(e.getMessage.contains("_generated_age_band"))
    assert(cat.read(spark, "gov.gl").count() == 3)
  }

  test("generated column redefinition is rejected; drop + re-declare works") {
    val cat = freshCat("genredef")
    cat.setGeneratedColumn(spark, "gov.gr", "age_band", "age div 10")
    // idempotent re-declaration of the SAME formula is fine
    cat.setGeneratedColumn(spark, "gov.gr", "age_band", "age div 10")
    val e = intercept[IllegalArgumentException](
      cat.setGeneratedColumn(spark, "gov.gr", "age_band", "age div 20"))
    assert(e.getMessage.contains("already defined"))
    cat.dropGeneratedColumn("gov.gr", "age_band")
    cat.setGeneratedColumn(spark, "gov.gr", "age_band", "age div 20")
    cat.overwrite(people.select("id", "age"), "gov.gr")
    assert(cat.read(spark, "gov.gr").orderBy("id").collect()
      .map(_.getAs[Long]("age_band")).toSeq == Seq(1L, 2L))
  }
}
