package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Misra-Gries heavy-hitter sketch as a typed [[Aggregator]] (the one UDAF
  * in the library — everything else is built-in expressions, SURVEY.md
  * §2.7). Tracks at most `k` counters; any token with true frequency
  * > n/(k+1) is GUARANTEED to survive in the summary, regardless of
  * partition or merge order (each decrement round removes k+1 occurrence
  * credits, so at most n/(k+1) rounds can touch any one token). The summary alone is merge-order-dependent, so the
  * heavy-hitters operator (TextOps t09) uses it only as a candidate set
  * and re-counts candidates exactly — making the final output
  * deterministic and oracle-checkable while the full-corpus pass stays
  * O(k) memory per partition.
  *
  * Mirrors the reference's north-star text analytics (SURVEY.md §2.6);
  * sketch per Misra & Gries 1982 via the standard decrement formulation.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[String]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, Long], token: String): mutable.Map[String, Long] = {
    if (buf.contains(token)) buf(token) += 1L
    else if (buf.size < k) buf(token) = 1L
    else {
      // decrement all counters; drop the ones that reach zero
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { t =>
        val c = buf(t) - 1L
        if (c == 0L) dead += t else buf(t) = c
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (t, c) => a(t) = a.getOrElse(t, 0L) + c }
    if (a.size > k) {
      // canonical summary merge (Agarwal et al.): subtract the (k+1)-th
      // largest counter from every counter, drop the non-positive — keeps
      // <= k entries and preserves the freq > n/(k+1) survival guarantee
      val cut = a.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      val kept = a.toSeq.map { case (t, c) => t -> (c - cut) }.filter(_._2 > 0L)
      a.clear()
      kept.foreach { case (t, c) => a(t) = c }
    }
    a
  }

  /** Candidate tokens only (sorted for a stable column value) — callers
    * re-count exactly, so the sketch's approximate counters never leak. */
  override def finish(buf: mutable.Map[String, Long]): Seq[String] =
    buf.keysIterator.toSeq.sorted

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
