package graft.functions

import graft.SparkSpec

class DateSpineSpec extends SparkSpec {

  test("graft_dates TVF: inclusive daily spine, leap-day exact, distributed") {
    GraftExtensions.register(spark)
    val r = spark.sql(
        "SELECT d FROM graft_dates('2024-02-27', '2024-03-02')")
      .collect().map(_.getDate(0).toString).sorted
    assert(r.toSeq == Seq("2024-02-27", "2024-02-28", "2024-02-29",
      "2024-03-01", "2024-03-02"))
    // a century spine is a distributed Range scan, not driver data
    val century = spark.sql(
      "SELECT count(*) AS n, min(d) AS lo, max(d) AS hi " +
        "FROM graft_dates('2000-01-01', '2099-12-31')").head()
    assert(century.getLong(0) == 36525L)
    assert(century.getDate(1).toString == "2000-01-01")
    assert(century.getDate(2).toString == "2099-12-31")
    // scaffold join: spine left-joined to activity keeps empty days
    spark.sql("SELECT DATE '2024-01-01' AS day, 5 AS n")
      .createOrReplaceTempView("one_day")
    val joined = spark.sql(
      """SELECT s.d, coalesce(o.n, 0) AS n
         FROM graft_dates('2024-01-01', '2024-01-03') s
         LEFT JOIN one_day o ON s.d = o.day""")
      .collect().map(x => x.getDate(0).toString -> x.getInt(1)).toMap
    assert(joined == Map("2024-01-01" -> 5, "2024-01-02" -> 0,
      "2024-01-03" -> 0))
    // loud failures: reversed range and non-literal args
    intercept[Exception](
      spark.sql("SELECT * FROM graft_dates('2024-01-02', '2024-01-01')")
        .collect())
    intercept[Exception](
      spark.sql("SELECT * FROM graft_dates('not-a-date', '2024-01-01')")
        .collect())
  }
}
