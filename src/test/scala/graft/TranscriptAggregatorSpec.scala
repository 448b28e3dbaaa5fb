package graft

import graft.functions.TranscriptAggregator

class TranscriptAggregatorSpec extends SparkSpec {

  test("typed aggregator assembles ordered transcripts under any partitioning") {
    import spark.implicits._
    val segments = Seq(
      ("s1", 200L, "world", 0.8),
      ("s1", 0L, "hello", 0.6),
      ("s1", 400L, "again", 1.4), // clamps to 1.0
      ("s2", 0L, "solo", -0.5)) // clamps to 0.0
    for (parts <- Seq(1, 3, 7)) {
      val ds = segments.toDS().repartition(parts)
        .map(t => (t._1, (t._2, t._3, t._4)))
      val out = ds.groupByKey(_._1).mapValues(_._2)
        .agg(TranscriptAggregator.toColumn)
        .collect().toMap
      assert(out("s1")._1 == "hello world again", s"parts=$parts")
      assert(math.abs(out("s1")._2 - (0.6 + 0.8 + 1.0) / 3) < 1e-12)
      assert(out("s2") == (("solo", 0.0)))
    }
  }
}
