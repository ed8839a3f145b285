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
    ext.injectFunction(GraftFunctions.shingleHashes)
    ext.injectFunction(GraftFunctions.minhashSignature)
  }
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Coalesce, Expression, ExpressionInfo, Literal}

  /** SQL-path builder, kept in lockstep with the DataFrame path
    * (TshGatherCandidates.gather): a null input must behave like the
    * reference's `_normalize_text(None) -> ''` (empty candidate array,
    * tsh.py:39-40), so the child is coalesced with ''. Arity is
    * validated here — `args.head` alone would silently drop extras and
    * throw an opaque error on zero args.
    */
  private def build(args: Seq[Expression]): Expression = {
    if (args.length != 1)
      throw new IllegalArgumentException(
        s"tsh_gather_candidates expects exactly 1 argument, got ${args.length}")
    TshGatherCandidates(Coalesce(Seq(args.head, Literal(""))))
  }

  val tshGatherCandidates: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("tsh_gather_candidates"),
    new ExpressionInfo(classOf[TshGatherCandidates].getName,
      "tsh_gather_candidates"),
    build(_))

  /** Second argument of the sketch functions must be a literal int
    * (it sizes the output array at plan time).
    */
  private def litInt(args: Seq[Expression], fn: String): Int = args(1) match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: second argument must be an integer literal, got $other")
  }

  private def buildShingles(args: Seq[Expression]): Expression = {
    if (args.length != 2)
      throw new IllegalArgumentException(
        s"shingle_hashes expects (tokens, n), got ${args.length} arguments")
    graft.analysis.ShingleHashes(args.head, litInt(args, "shingle_hashes"))
  }

  private def buildMinhash(args: Seq[Expression]): Expression = {
    if (args.length != 2)
      throw new IllegalArgumentException(
        s"minhash_signature expects (hashes, m), got ${args.length} arguments")
    graft.analysis.MinhashSignature(args.head, litInt(args, "minhash_signature"))
  }

  val shingleHashes: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_hashes"),
    new ExpressionInfo(classOf[graft.analysis.ShingleHashes].getName,
      "shingle_hashes"),
    buildShingles(_))

  val minhashSignature: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(classOf[graft.analysis.MinhashSignature].getName,
      "minhash_signature"),
    buildMinhash(_))

  /** Imperative registration on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("tsh_gather_candidates", build, "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes", buildShingles, "built-in")
    reg.createOrReplaceTempFunction("minhash_signature", buildMinhash, "built-in")
  }
}
