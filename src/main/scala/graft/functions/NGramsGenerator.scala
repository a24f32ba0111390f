package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst `Generator`: `graft_ngrams(text, n)` explodes a document
  * into its word n-grams as `(pos, gram)` rows — the table-generating rung
  * of the extension-point matrix (next to the scalar `Expression`s, the
  * `TypedImperativeAggregate`s, the optimizer `Rule`, and the
  * `SparkStrategy`). Registered in the FunctionRegistry it composes in SQL
  * exactly like the builtins: `SELECT doc_id, graft_ngrams(text, 3) AS
  * (pos, gram) FROM documents` plans ONE `Generate` node over the scan —
  * per-partition streaming fan-out with no shuffle, no UDF wrapper, and no
  * intermediate token array materialized per row (the builtin-composition
  * alternative, `posexplode(transform(sequence(...), ...))`, allocates the
  * full gram array per document before exploding it; at 100 TB of web text
  * that array is the document's size times n for no reason).
  *
  * `eval`-mode generator (`CodegenFallback`), the same execution tier as
  * Spark's own `JsonTuple`: `GenerateExec` calls `eval` per input row and
  * streams the returned iterator. Tokenization is single-space split with
  * empties dropped — bit-compatible with the t-family oracle idiom
  * `list_filter(string_split(text, ' '), t -> len(t) > 0)`, so a DuckDB
  * oracle can re-derive the grams independently (t35 gate).
  *
  * Positions are 1-based (first gram = pos 1), matching SQL list indexing
  * so the oracle's `list_slice(tk, pos, pos + n - 1)` reads back the same
  * gram.
  */
case class NGramsGenerator(text: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_ngrams requires a string document, got ${text.dataType}")
    else if (n.dataType != IntegerType || !n.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_ngrams requires a foldable integer n (a literal gram size)")
    else TypeCheckResult.TypeCheckSuccess
  }

  // n is foldable (enforced above): evaluate once, not per row
  private lazy val gramSize: Int = {
    val v = n.eval(null)
    require(v != null && v.asInstanceOf[Int] >= 1,
      s"graft_ngrams n must be >= 1, got $v")
    v.asInstanceOf[Int]
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) Nil
    else {
      val toks = t.asInstanceOf[UTF8String].toString
        .split(' ').filter(_.nonEmpty)
      val last = toks.length - gramSize
      if (last < 0) Nil
      else (0 to last).iterator.map { i =>
        InternalRow(i + 1, UTF8String.fromString(
          toks.slice(i, i + gramSize).mkString(" ")))
      }
    }
  }

  override def prettyName: String = "graft_ngrams"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGramsGenerator =
    copy(text = newChildren(0), n = newChildren(1))
}
