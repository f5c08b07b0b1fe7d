package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExtensions

/** Custom expressions registered as SQL functions via SparkSessionExtensions. */
class ExtensionsSpec extends AnyFunSuite {

  test("reverse_host/strip_www/registered_domain/surt/url_host usable from SQL") {
    // register on the shared session — `spark.sql.extensions` only applies
    // at session construction, which the shared test session predates
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    try {
      val row = spark.sql(
        """SELECT reverse_host('www.example.com') AS r,
          |       strip_www('www.example.com') AS s,
          |       registered_domain('a.b.example.co.uk') AS d,
          |       registered_domain('co.uk') AS dnull,
          |       surt('https://www.Example.COM/a?b=2&a=1') AS k,
          |       url_host('https://User@Host.ORG:8080/x') AS h""".stripMargin).first()
      assert(row.getString(0) == "com.example.www")
      assert(row.getString(1) == "example.com")
      assert(row.getString(2) == "example.co.uk")
      assert(row.isNullAt(3))
      assert(row.getString(4) == "com,example,www)/a?a=1&b=2")
      assert(row.getString(5) == "host.org")
    } finally ()
  }
}
