package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_probe(bloomBytes, xxhash64(key))` — tests a PER-ROW Bloom
  * filter column against a hash, the probe a distributed bloom-manifest
  * scan needs (e24): manifest rows — each file's serialized filter — stay
  * on executors and join against a broadcast probe-hash table, so only
  * matching file PATHS ever travel to the driver. Spark's own
  * `BloomFilterMightContain` can't express this: it requires the filter
  * side to be a constant/scalar-subquery (the runtime-filter shape, one
  * filter probed by many rows); here it's the transpose — many filters,
  * few probes.
  *
  * Eval-mode with a last-deserialization cache keyed by CONTENT (length
  * + Arrays.equals, checked after a cheap reference test): under the
  * manifest ⋈ broadcast-probes loop each file's filter is probed by all
  * hashes consecutively, so the cache reduces to one deserialization per
  * (file, partition). Reference identity alone was not enough —
  * UnsafeRow.getBinary returns a fresh copy per eval, so an
  * identity-keyed cache never hit under the documented plan (r14
  * ADVICE); the content compare costs one memcmp over the filter bytes,
  * far below the deserialization it saves. Not codegen'd — deliberately:
  * this runs at MANIFEST grain (one row per data file), never per data
  * row, so interpreter overhead is planner-metadata-sized.
  */
case class BloomMightContainAny(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override def checkInputDataTypes() = {
    require(left.dataType == BinaryType && right.dataType == LongType,
      s"graft_bloom_probe requires (binary, bigint), got " +
        s"(${left.dataType}, ${right.dataType})")
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedFilter: BloomFilter = _

  override def nullSafeEval(bloomBytes: Any, hash: Any): Any = {
    val bytes = bloomBytes.asInstanceOf[Array[Byte]]
    if (!((bytes eq cachedBytes) ||
        (cachedBytes != null && java.util.Arrays.equals(bytes, cachedBytes)))) {
      cachedFilter = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    java.lang.Boolean.valueOf(
      cachedFilter.mightContainLong(hash.asInstanceOf[Long]))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainAny =
    copy(left = newLeft, right = newRight)
}
