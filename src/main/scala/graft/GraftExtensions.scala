package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expr.{SimHash64, VectorDot, VectorNormSq}

/** Catalyst extension entry point (SURVEY §7.3): exposes graft's native
  * expressions to SQL as `vector_dot` / `vector_norm_sq` / `sim_hash64`.
  *
  * Cluster use: `--conf spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`. For an
  * already-running session, [[GraftExtensions.register]] installs the same
  * functions into its registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (args: Seq[Expression]) => VectorDot(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("vector_norm_sq"),
      new ExpressionInfo(classOf[VectorNormSq].getName, "vector_norm_sq"),
      (args: Seq[Expression]) => VectorNormSq(args.head)))
    e.injectFunction((FunctionIdentifier("sim_hash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "sim_hash64"),
      (args: Seq[Expression]) => SimHash64(args.head)))
  }
}

object GraftExtensions {
  /** Register the graft SQL functions on an existing session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vector_dot",
      (args: Seq[Expression]) => VectorDot(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vector_norm_sq",
      (args: Seq[Expression]) => VectorNormSq(args.head), "scala_udf")
    reg.createOrReplaceTempFunction("sim_hash64",
      (args: Seq[Expression]) => SimHash64(args.head), "scala_udf")
  }
}
