package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's native expressions, so
  * `spark.sql("SELECT graft_cosine_sim(a, b) ...")` works like any builtin.
  *
  * Two deployment routes:
  *  - [[GraftFunctions.registerAll]] on an existing session (tests, REPL);
  *  - `--conf spark.sql.extensions=graft.GraftExtensions` at session build
  *    (cluster deployment) via [[graft.GraftExtensions]].
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)),
    (FunctionIdentifier("graft_cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))),
    (FunctionIdentifier("graft_minhash64"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash64"),
      (exprs: Seq[Expression]) => MinHashSignature(exprs.head, 64))
  )

  def registerAll(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
