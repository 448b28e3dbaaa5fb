package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** Negative case for the no-BNLJ plan gate: a broadcast NON-scalar build
  * side (a real big×big nested loop) must FAIL the scalar-subtree walk —
  * this is the shape the gate exists to reject (see the round-5 advice:
  * a dangerous BNLJ must not hide behind a benign scalar one). */
class GuardNegSpec extends SparkSpec {
  test("neg: big broadcast build side is NOT provably scalar") {
    val a = spark.range(100).toDF("x")
    val b = spark.range(100).toDF("y")
    val bad = a.join(broadcast(b), col("x") < col("y"))
    val bnlj = PlanGuards.flatten(bad.queryExecution.executedPlan).collect {
      case j: BroadcastNestedLoopJoinExec => j
    }
    assert(bnlj.nonEmpty, "fixture must actually plan a BNLJ")
    bnlj.foreach { j =>
      assert(!PlanGuards.scalarSubtree(PlanGuards.buildSide(j)),
        "a range-scan build side must fail the scalar walk")
    }
  }
}
