package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_hist(value, binWidth)` — a MERGEABLE fixed-grid histogram as a
  * native Catalyst aggregate function, the engine's
  * `TypedImperativeAggregate` rung (an aggregate whose intermediate state
  * is an arbitrary JVM object carried in a binary buffer — the extension
  * point for sketches no fixed-width buffer layout can hold; Spark's own
  * percentile/HLL/Bloom aggregates are built on it).
  *
  * Semantics: each non-null input lands in bin `floorDiv(value, binWidth)`;
  * the result is the `array<struct<bin,n>>` of occupied bins sorted by bin
  * — a bit-exact, engine-independent function of the input multiset, so a
  * SQL GROUP-BY oracle can hash-match it (unlike an approximate sketch).
  *
  * Scale shape: partial aggregation applies — each partition folds its
  * rows into a local map (update), the maps serialize to flat
  * `(size, k/v pairs)` byte buffers and MERGE pairwise on the reduce side
  * — so the shuffle carries one O(bins) buffer per partition per group,
  * never the rows. This is t29's "mergeable histogram" contract pushed
  * into the engine's own aggregation framework: the same plan machinery
  * (ObjectHashAggregate, map-side combine, spill-to-sort fallback) that
  * runs `percentile_approx` runs this.
  */
case class HistogramAgg(
    child: Expression,
    binWidth: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Long]] {

  require(binWidth > 0, s"graft_hist binWidth must be positive, got $binWidth")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bin", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_hist"

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Long, Long],
                      input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bin = Math.floorDiv(v.asInstanceOf[Long], binWidth)
      buf.update(bin, buf.getOrElse(bin, 0L) + 1L)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Long, Long],
                     other: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    other.foreach { case (bin, n) =>
      buf.update(bin, buf.getOrElse(bin, 0L) + n)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Long, Long]): Any = {
    val sorted = buf.toArray.sortBy(_._1)
    new GenericArrayData(sorted.map { case (bin, n) =>
      new GenericInternalRow(Array[Any](bin, n))
    })
  }

  /** Flat little-endian-free layout: entry count, then (bin, n) pairs.
    * Deterministic content (order does not matter — merge is commutative)
    * and O(bins) bytes: this buffer IS what the shuffle carries. */
  override def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (bin, n) => bb.putLong(bin); bb.putLong(n) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val size = bb.getInt
    val m = mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < size) {
      val bin = bb.getLong
      val n = bb.getLong
      m.update(bin, n)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistogramAgg =
    copy(child = newChildren.head)
}
