package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's custom Catalyst expressions as SQL functions.
  *
  * Two entry points:
  *  - config: `.config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")`
  *    applies at session build (the standard extension-library path);
  *  - [[GraftFunctions.register]] injects into an already-running session
  *    (tests, notebooks).
  *
  * After either, `SELECT cosine_sim(a.embedding, b.embedding)` works in
  * SQL text, keeping the codegen'd primitive loop.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftFunctions.cosineSimDescriptor)
}

object GraftFunctions {
  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "cosine_sim expects exactly 2 array<float> arguments")
      CosineSimilarity(exprs.head, exprs(1))
    })

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = cosineSimDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
