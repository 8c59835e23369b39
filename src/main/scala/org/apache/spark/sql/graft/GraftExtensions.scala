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
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => SkylineStrategy)
    ext.injectOptimizerRule(_ => RangeBinJoinRule)
    ext.injectOptimizerRule(_ => MatViewRewriteRule)
  }
}

object GraftFunctions {
  private type Descriptor = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val cosineSimDescriptor: Descriptor = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "cosine_sim expects exactly 2 array<float> arguments")
      CosineSimilarity(exprs.head, exprs(1))
    })

  /** Scalar helpers as concrete Catalyst trees (builders must return
    * resolved nodes — the Column bridge would hand the registry an
    * unresolved ColumnNodeExpression). Semantics mirror graft.functions.Fns. */
  import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, ConcatWs, Literal, Lower, Md5, RegExpReplace}
  import org.apache.spark.sql.types.StringType

  private def descriptor(name: String)(builder: Seq[Expression] => Expression): Descriptor =
    (FunctionIdentifier(name),
      new ExpressionInfo(graft.functions.Fns.getClass.getName, name),
      builder)

  val topkDescriptor: Descriptor = (
    FunctionIdentifier("topk_agg"),
    new ExpressionInfo(classOf[TopKAgg].getName, "topk_agg"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3, "topk_agg expects (score DOUBLE, payload BIGINT, k literal INT)")
      val k = exprs(2) match {
        case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"topk_agg k must be an integer literal, got $other")
      }
      TopKAgg(exprs.head, exprs(1), k).toAggregateExpression()
    })

  val all: Seq[Descriptor] = Seq(
    cosineSimDescriptor,
    topkDescriptor,
    descriptor("surrogate_key") { exprs =>
      Md5(Cast(ConcatWs(Literal("-") +: exprs.map(e =>
        Coalesce(Seq(Cast(e, StringType), Literal(""))))), org.apache.spark.sql.types.BinaryType))
    },
    descriptor("norm_name") { exprs =>
      Lower(RegExpReplace(exprs.head, Literal("[^a-zA-Z0-9]"), Literal("")))
    },
    descriptor("comma_decimal") { exprs =>
      // DOUBLE, mirroring Fns.commaDecimal (round-3 output-type policy:
      // DECIMAL is banned from oracle-facing outputs)
      Cast(RegExpReplace(exprs.head, Literal(","), Literal(".")), org.apache.spark.sql.types.DoubleType)
    })

  /** Register into an existing session: SQL functions + the Skyline
    * planner strategy (so SkylineNode plans without the config path). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    SkylinePlan.install(spark)
    if (!spark.experimental.extraOptimizations.contains(RangeBinJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeBinJoinRule
    if (!spark.experimental.extraOptimizations.contains(MatViewRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MatViewRewriteRule
  }
}
