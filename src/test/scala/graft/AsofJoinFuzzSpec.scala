package graft

import scala.util.Random

/** Randomized check of the q42 as-of formulation (union + running
  * last-non-null window) against a naive per-request reference scan —
  * exercises ties (request at exactly a metric's timestamp), users with
  * no metrics, and duplicate metric timestamps, on data the DuckDB
  * oracle's fixed corpus may not contain. */
class AsofJoinFuzzSpec extends SparkSpec {

  test("window as-of == naive latest-at-or-before scan on random data") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._

    val rnd = new Random(42)
    // small timestamp domain forces collisions and exact-tie cases
    val metrics = Seq.fill(300)((rnd.nextInt(8).toLong,
      rnd.nextInt(50).toLong, math.round(rnd.nextDouble() * 100) / 1.0))
    val requests = Seq.tabulate(200)(i => (i.toLong,
      rnd.nextInt(10).toLong, rnd.nextInt(60).toLong))

    // naive reference: per request, max-t metric at or before, then max
    // value among same-(user,t) metrics (q42's pre-dedup rule)
    val byKey = metrics.groupBy(m => (m._1, m._2))
      .map { case (k, ms) => k -> ms.map(_._3).max }
    val expected = requests.map { case (rid, u, t) =>
      val cand = byKey.filter { case ((mu, mt), _) => mu == u && mt <= t }
      rid -> (if (cand.isEmpty) None
              else Some(cand.maxBy(_._1._2)._2))
    }.toMap

    // the q42 shape
    val m = metrics.toDF("user_id", "t_us", "value")
      .groupBy($"user_id", $"t_us").agg(max($"value").as("mval"))
      .select($"user_id", $"t_us", $"mval", lit(0).as("is_req"),
        lit(null).cast("long").as("event_id"))
    val r = requests.toDF("event_id", "user_id", "t_us")
      .select($"user_id", $"t_us", lit(null).cast("double").as("mval"),
        lit(1).as("is_req"), $"event_id")
    val w = Window.partitionBy($"user_id")
      .orderBy($"t_us".asc, $"is_req".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = m.unionByName(r)
      .withColumn("asof_value", last($"mval", ignoreNulls = true).over(w))
      .filter($"is_req" === 1)
      .select($"event_id", $"asof_value")
      .collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) None else Some(row.getDouble(1))))
      .toMap

    assert(got.size == requests.size)
    for ((rid, exp) <- expected)
      assert(got(rid) == exp, s"request $rid: got ${got(rid)}, want $exp")
  }
}
