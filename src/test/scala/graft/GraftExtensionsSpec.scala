package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  test("extensions register the native function for new sessions") {
    // force TestSpark's context to exist first, then build a sibling
    // session with the extensions applied
    val ctx = spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master(ctx.master)
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val v = s2.sql(
        "SELECT sorted_long_intersect_count(array(1L,2L,3L), array(2L,3L,9L)) v")
        .head().getLong(0)
      assert(v == 2L)
      val d = s2.sql(
        "SELECT float_vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) d")
        .head().getDouble(0)
      assert(d == 11.0)
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
