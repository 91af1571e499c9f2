package graft.sources

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.SparkException

import java.nio.file.Files

/** Malformed-record semantics on the CSV/JSON scan path. The reference
  * reads PERMISSIVE (its Glue CSVs are machine-written but the mode is
  * explicit); a complete engine also pins what the other two modes do,
  * because at corpus scale a crawler WILL hand the scan broken rows and
  * the difference between null-padding, dropping, and failing is a
  * pipeline-design decision, not a default to stumble into. */
class MalformedSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("v", DoubleType),
    StructField("_corrupt_record", StringType)))

  private def csvDir: String = {
    val dir = Files.createTempDirectory("graft-malformed")
    Files.writeString(dir.resolve("part.csv"),
      "id,v\n1,1.5\nnot_an_int,2.5\n3,3.5\n")
    dir.toString
  }

  test("PERMISSIVE null-pads bad cells and captures the raw row") {
    val df = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(csvDir)
    val rows = df.sort("v").collect()
    assert(rows.length == 3)
    val bad = rows.filter(r => !r.isNullAt(2))
    assert(bad.length == 1 && bad.head.isNullAt(0) &&
      bad.head.getString(2) == "not_an_int,2.5")
    // good rows parse fully, corrupt column stays null
    assert(rows.count(r => r.isNullAt(2)) == 2)
  }

  test("DROPMALFORMED silently drops the broken row") {
    val df = spark.read
      .schema(StructType(schema.fields.dropRight(1)))
      .option("header", "true").option("mode", "DROPMALFORMED")
      .csv(csvDir)
    // note: a bare count() would report 3 — CSV count pushdown skips
    // field parsing, so malformed rows are only dropped when columns are
    // actually materialized. Assert on materialized rows.
    val rows = df.collect()
    assert(rows.length == 2, rows.mkString(";"))
    assert(rows.map(_.getInt(0)).sum == 4)
  }

  test("mergeSchema unifies drifted parquet schemas; plain read keeps one") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-drift")
    Seq((1, "a")).toDF("id", "v1").write.parquet(dir.resolve("b1").toString)
    Seq((2, 9.5)).toDF("id", "v2").write.parquet(dir.resolve("b2").toString)
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(dir.resolve("b1").toString, dir.resolve("b2").toString)
    assert(merged.columns.sorted.toSeq == Seq("id", "v1", "v2"))
    val rows = merged.sort("id").collect()
    assert(rows(0).getAs[String]("v1") == "a" && rows(0).isNullAt(rows(0).fieldIndex("v2")))
    assert(rows(1).getAs[Double]("v2") == 9.5 && rows(1).isNullAt(rows(1).fieldIndex("v1")))
    // without mergeSchema, one file's footer wins — drifted columns are
    // silently absent, which is why the catalog's append path falls back
    // to a null-padded rewrite on schema drift instead of hardlinking
    val plain = spark.read.parquet(dir.resolve("b1").toString, dir.resolve("b2").toString)
    assert(plain.columns.length == 2)
  }

  test("FAILFAST raises on the broken row") {
    val df = spark.read
      .schema(StructType(schema.fields.dropRight(1)))
      .option("header", "true").option("mode", "FAILFAST")
      .csv(csvDir)
    val e = intercept[SparkException] { df.collect() }
    assert(e.getMessage.contains("MALFORMED_RECORD_IN_PARSING") ||
      e.getCause != null, e.getMessage)
  }
}
