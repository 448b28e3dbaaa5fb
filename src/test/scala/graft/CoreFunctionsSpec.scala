package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.CoreFunctions._

/** Property-style assertions mirroring the reference's unit tests
  * (SURVEY.md §5: clamp domains, demotion floor 0, bucket boundaries,
  * blend truncation, degradation thresholds). */
class CoreFunctionsSpec extends SparkSpec {

  private def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  test("clamp bounds both sides") {
    assert(eval1(clamp(lit(5.0), lit(0.0), lit(1.0))) == 1.0)
    assert(eval1(clamp(lit(-5.0), lit(0.0), lit(1.0))) == 0.0)
    assert(eval1(clamp(lit(0.25), lit(0.0), lit(1.0))) == 0.25)
  }

  test("confidence from logprob matches reference clamp(1+p, 0, 1)") {
    assert(eval1(confidenceFromLogprob(lit(-0.3))) == 0.7)
    assert(eval1(confidenceFromLogprob(lit(-2.0))) == 0.0)
    assert(eval1(confidenceFromLogprob(lit(0.5))) == 1.0)
  }

  test("priority demotion floors at 0") {
    assert(eval1(demote(lit(3))) == 2)
    assert(eval1(demote(lit(0))) == 0)
  }

  test("backoff is retry squared") {
    assert(eval1(backoffSeconds(lit(3))) == 9)
  }

  test("length buckets use inclusive upper bounds with catch-all") {
    val bounds = Seq(5120L, 10240L, 20480L, 40960L)
    assert(eval1(lengthBucket(lit(5120L), bounds)) == 0)
    assert(eval1(lengthBucket(lit(5121L), bounds)) == 1)
    assert(eval1(lengthBucket(lit(999999L), bounds)) == 4)
  }

  test("blendTarget truncates like the reference's int()") {
    // 4*0.4 + 6*0.3 + 5*0.3 = 4.9 -> 4 (not 5)
    assert(eval1(blendTarget(lit(4.0), lit(6.0), lit(5.0), 1, 10)) == 4.0)
    // clamp to max
    assert(eval1(blendTarget(lit(50.0), lit(50.0), lit(50.0), 1, 10)) == 10.0)
  }

  test("degradation levels at reference thresholds") {
    assert(eval1(degradationLevel(lit(0.69))) == 0)
    assert(eval1(degradationLevel(lit(0.7))) == 1)
    assert(eval1(degradationLevel(lit(0.8))) == 2)
    assert(eval1(degradationLevel(lit(0.95))) == 3)
  }

  test("hash32 matches the DuckDB-computable value") {
    // DuckDB: CAST(('0x' || substr(md5('tok'),1,8)) AS BIGINT) = 1622020974
    assert(eval1(hash32(lit("tok"))) == 1622020974L)
  }

  test("bbox from quad points") {
    val xs = Seq(lit(3.0), lit(1.0), lit(2.0), lit(5.0))
    assert(eval1(bboxX(xs)) == 1.0)
    assert(eval1(bboxW(xs)) == 4.0)
  }
}
