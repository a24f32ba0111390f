package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the similarity/dedup hot paths.
  *
  * The compositional forms (`aggregate(zip_with(...))`) are semantically
  * right but allocate an intermediate array per row-pair and, worse, a
  * lambda that captures a derived array expression re-evaluates that
  * expression once per output element. On the LSH candidate-pair join that
  * turned an O(pairs·dim) kernel into O(pairs·dim²)-ish work. These
  * expressions do one tight primitive pass per row instead — the measured
  * effect on the sf0.1 bench was d03 dropping from ~275s to sub-second
  * signature computation.
  */

/** One-pass cosine similarity over two array<float>/array<double> columns.
  * Accumulates dot and both norms in double in a single loop; returns 0.0
  * for zero-norm inputs (matching VectorFunctions.cosine). Participates in
  * whole-stage codegen via [[doGenCode]] — this kernel is the inner loop of
  * every similarity query, and a CodegenFallback here would collapse the
  * whole containing stage to the interpreted path. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(dt: DataType): Option[DataType] = dt match {
      case ArrayType(e @ (FloatType | DoubleType), _) => Some(e)
      case _ => None
    }
    if (elem(left.dataType).isDefined && elem(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    java.lang.Double.valueOf(if (denom == 0.0) 0.0 else dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      // element accessors are resolved at codegen time from the child types
      val getX = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $getX;
         |  double $y = $getY;
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** MinHash signature in a single pass: for each of `numHashes` hash
  * functions, the min over the input array<bigint> of a splitmix64-style
  * mix of (hash, i). Output: array<bigint> of length `numHashes`.
  * Deterministic across JVMs (pure integer arithmetic, no RNG state). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"minhash requires array<bigint>, got $dt")
  }

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData].toLongArray()
    new GenericArrayData(MinHashSignature.compute(hashes, numHashes))
  }

  /** Codegen delegates to the same static kernel the interpreted path uses
    * (one tight primitive loop, no per-element boxing) — the point is to
    * keep the containing stage inside whole-stage codegen, which a
    * CodegenFallback child would abort for every operator in the stage. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinHashSignature$$.MODULE$$.compute(
         |    $arr.toLongArray(), $numHashes));
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object MinHashSignature {
  /** splitmix64 finalizer — well-mixed, cheap, JVM-stable. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def compute(hashes: Array[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < hashes.length) {
      val h = hashes(j)
      var i = 0
      while (i < k) {
        val v = mix(h ^ (i * 0xC2B2AE3D27D4EB4FL))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }
}

/** Column-level entry points (registered per session, like SimHash64). */
object VectorExpressions {
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    org.apache.spark.sql.functions.call_function("graft_cosine_sim", a, b)
  }

  def minhash(spark: SparkSession, tokenHashes: Column, numHashes: Int = 64): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      s"graft_minhash_$numHashes",
      exprs => MinHashSignature(exprs.head, numHashes), "scala_udf")
    org.apache.spark.sql.functions.call_function(s"graft_minhash_$numHashes", tokenHashes)
  }
}
