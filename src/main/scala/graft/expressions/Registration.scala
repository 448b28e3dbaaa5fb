package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session-scoped, truly idempotent temp-function registration.
  *
  * `createOrReplaceTempFunction` logs a "replaced a previously registered
  * function" WARN on every call after the first; queries register their
  * expressions at build time, so an unguarded call per query build spams
  * the log (and on a shared cluster, the driver's event log). Checking
  * `functionExists` first keeps registration a no-op after the first call
  * in a session.
  */
object Registration {
  def once(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) {
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
