package graft.extract

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL surface for the engine's native expression(s): registers
  * `tsh_gather_candidates(text)` so pure-SQL users get the fused parse
  * core too:
  *
  *   spark.sql("SELECT tsh_gather_candidates(raw_text) FROM docs")
  *
  * Load via `--conf spark.sql.extensions=graft.extract.GraftExtensions`
  * (cluster) or call [[GraftFunctions.register]] on an existing session.
  * No custom Rule/Strategy is needed anywhere in this engine (SURVEY.md
  * §4 conclusion): the planner's built-ins cover every operator; the
  * only extension is this scalar expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.tshGatherCandidates)
  }
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  val tshGatherCandidates: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("tsh_gather_candidates"),
    new ExpressionInfo(classOf[TshGatherCandidates].getName,
      "tsh_gather_candidates"),
    (args: Seq[Expression]) => TshGatherCandidates(args.head))

  /** Imperative registration on an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tsh_gather_candidates", args => TshGatherCandidates(args.head),
      "built-in")
}
