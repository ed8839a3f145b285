package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.GraftFunctions

/** The SQL surface of the fused parse expression. */
class SqlFunctionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("tsh_gather_candidates is callable from SQL") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("TSH 2,35 mUI/L (0,27 - 4,20)", "rien ici")
      .toDF("raw").createOrReplaceTempView("sql_docs")
    val rows = spark.sql(
      """SELECT c.value, c.unit, c.ref_min, c.ref_max
        |FROM sql_docs LATERAL VIEW explode(tsh_gather_candidates(raw)) t AS c
        |""".stripMargin)
      .as[(Double, String, Double, Double)].collect().toSeq
    assert(rows == Seq((2.35, "mUI/L", 0.27, 4.2)))
  }
}
