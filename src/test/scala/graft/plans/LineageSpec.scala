package graft.plans

import graft.SparkSpec
import graft.queries.Parity

import org.apache.spark.sql.functions._

/** Column lineage over the analyzed plan ([[Lineage.columnLineage]]):
  * value-flow only — join keys and filters must not taint outputs —
  * resolved through aliases, aggregates, generators, unions, and SQL
  * CTEs. */
class LineageSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def li = Parity.table(spark, sf, "lineitem")
  private def ord = Parity.table(spark, sf, "orders")

  test("join + aggregate: measures map to their leaf columns only") {
    val q = ord.join(li, col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderstatus") =!= "X")
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        countDistinct(col("o_custkey")).as("customers"))
    val lin = Lineage.columnLineage(q)
    assert(lin("revenue") == Set(
      "lineitem.parquet" -> "l_extendedprice",
      "lineitem.parquet" -> "l_discount"))
    assert(lin("customers") == Set("orders.parquet" -> "o_custkey"))
    // grouping key passes through; the join key and filter column do
    // not leak into any output that doesn't read them
    assert(lin("o_orderpriority") == Set("orders.parquet" -> "o_orderpriority"))
    assert(!lin.values.flatten.exists(_._2 == "o_orderstatus"))
  }

  test("derived columns, generators, and unions union their inputs") {
    val docs = Parity.table(spark, sf, "documents")
    val gen = docs
      .withColumn("tag", concat_ws(":", col("lang"), col("source")))
      .select(col("doc_id"), col("tag"),
        posexplode(split(col("text"), " ")))
    val lg = Lineage.columnLineage(gen)
    assert(lg("tag") == Set(
      "documents.parquet" -> "lang", "documents.parquet" -> "source"))
    assert(lg("col") == Set("documents.parquet" -> "text"))
    assert(lg("pos") == Set("documents.parquet" -> "text"))

    val u = li.select(col("l_orderkey").as("k"))
      .unionAll(ord.select(col("o_orderkey").as("k")))
    assert(Lineage.columnLineage(u)("k") == Set(
      "lineitem.parquet" -> "l_orderkey", "orders.parquet" -> "o_orderkey"))
  }

  test("SQL CTEs resolve positionally through CTERelationRef") {
    li.createOrReplaceTempView("lineage_li")
    val q = spark.sql(
      """WITH base AS (
           SELECT l_orderkey AS k, l_quantity * 2 AS qq FROM lineage_li),
         agg AS (SELECT k, SUM(qq) AS total FROM base GROUP BY k)
         SELECT k, total FROM agg""")
    val lin = Lineage.columnLineage(q)
    assert(lin("k") == Set("lineitem.parquet" -> "l_orderkey"))
    assert(lin("total") == Set("lineitem.parquet" -> "l_quantity"))
  }
}
