package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_topk(value, id, k)` — per-group top-k as a BOUNDED mergeable
  * aggregate: each partition keeps at most k (value, id) pairs (value
  * DESC, id ASC tiebreak), buffers merge pairwise, the final state IS the
  * answer in rank order.
  *
  * This exists because the standard top-n-per-group formulation —
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC)` + filter (q17) —
  * must SHUFFLE AND SORT EVERY ROW before the filter drops all but k of
  * them: at 100 TB the exchange carries the corpus. Here the map side
  * reduces each partition to a k-element buffer first, so the shuffle
  * carries O(k · partitions · groups-per-partition) — the same
  * partial-vs-full asymmetry `TakeOrderedAndProject` exploits globally
  * (q17's LIMIT path), now available PER GROUP and composable inside any
  * aggregation. The q129 spec pins strictly fewer shuffled records than
  * the window twin on identical input, plus value equality.
  *
  * Deterministic by construction: total order (value DESC, id ASC), no
  * heap-order dependence in the serialized buffer (kept sorted), integer
  * values on the cents grid — hash-matched against a DuckDB window
  * oracle.
  */
case class TopKAgg(
    value: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] {

  require(k > 0 && k <= 1024, s"graft_topk k must be in [1, 1024], got $k")

  override def children: Seq[Expression] = Seq(value, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKAgg.Buffer =
    new TopKAgg.Buffer(k)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null)
      buf.offer(v.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    other.foreach((v, i) => buf.offer(v, i))
    buf
  }

  override def eval(buf: TopKAgg.Buffer): Any =
    new GenericArrayData(buf.sorted.map { case (v, i) =>
      new GenericInternalRow(Array[Any](v, i))
    })

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = {
    val entries = buf.sorted
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (v, i) => bb.putLong(v); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.Buffer(k)
    var j = 0
    while (j < n) { buf.offer(bb.getLong, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(value = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** Bounded top-k set under (v DESC, id ASC): a sorted insertion array —
    * k is small by contract, so insertion beats heap constant factors and
    * keeps the buffer canonically ordered for serialize/eval (no
    * heap-layout nondeterminism in the bytes). */
  final class Buffer(k: Int) {
    private val vs = new Array[Long](k)
    private val ids = new Array[Long](k)
    private var n = 0

    private def beats(v1: Long, i1: Long, v2: Long, i2: Long): Boolean =
      v1 > v2 || (v1 == v2 && i1 < i2)

    def offer(v: Long, i: Long): Unit = {
      if (n == k && !beats(v, i, vs(n - 1), ids(n - 1))) return
      // find insertion point (linear — k is small)
      var p = if (n == k) n - 1 else n
      while (p > 0 && beats(v, i, vs(p - 1), ids(p - 1))) p -= 1
      val last = if (n == k) n - 1 else n
      var q = last
      while (q > p) { vs(q) = vs(q - 1); ids(q) = ids(q - 1); q -= 1 }
      vs(p) = v; ids(p) = i
      if (n < k) n += 1
    }

    def foreach(f: (Long, Long) => Unit): Unit = {
      var j = 0
      while (j < n) { f(vs(j), ids(j)); j += 1 }
    }

    /** Entries in rank order (v DESC, id ASC) — the array IS sorted. */
    def sorted: Array[(Long, Long)] =
      Array.tabulate(n)(j => (vs(j), ids(j)))
  }
}
