package graft

import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL-registered functions mirror the DataFrame API exactly") {
    GraftFunctions.register(spark)
    Seq(("1962-00-00", "a ; b;c", "12")).toDF("d", "m", "n")
      .createOrReplaceTempView("fx")
    val r = spark.sql(
      """SELECT graft_date_ymd(d) AS ymd, graft_lenient_int(n) AS n,
        |  array_join(graft_semi_split(m), '|') AS parts,
        |  graft_hash60('abc') AS h,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS cs
        |FROM fx""".stripMargin).collect()(0)
    assert(r.getInt(0) == 19620000)
    assert(r.getInt(1) == 12)
    assert(r.getString(2) == "a|b|c")
    assert(r.getLong(3) == 648541476951500027L) // md5('abc') first 15 hex
    assert(r.getDouble(4) == 11.0)
    assert(r.getDouble(5) == 1.0)
  }

  test("flagship entry() answers on sf0.001 with rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("odate_ymd"))
  }
}
