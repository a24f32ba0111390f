package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Per-user cumulative totals on Spark 4's `transformWithState` — the
  * arbitrary-state API that supersedes `flatMapGroupsWithState` (which
  * g08's trip operator gates): typed named state primitives
  * (Value/List/MapState) on the RocksDB state store, explicit TTL,
  * timers. This operator keeps ONE `ValueState[UserTotals]` per user and
  * emits the running (event count, cents) totals once per micro-batch
  * the user appears in — the per-entity lifetime accumulator every
  * billing / engagement pipeline maintains.
  *
  * Determinism contract (what makes the gate oracle-able): the update is
  * commutative integer arithmetic (counts + pre-scaled cents), so the
  * nondeterministic row order WITHIN a micro-batch cannot change the
  * emitted totals, and one row per (user, batch) means output content is
  * a pure function of the batch split.
  *
  * Scale shape: state is per-key O(1) (two longs), partitioned by the
  * grouping key across the cluster and snapshotted/restored by the
  * RocksDB store per micro-batch — the unbounded-key case (user churn)
  * is what [[TTLConfig]] exists for; the gate keeps NONE because the
  * fixture window is bounded. */
case class UserEvent(user_id: Long, cents: Long)
case class UserTotals(n: Long, cents: Long)
case class UserCumulative(user_id: Long, n_events: Long, sum_cents: Long)

class CumulativeTotalsProcessor
    extends StatefulProcessor[Long, UserEvent, UserCumulative] {

  @transient private var totals: ValueState[UserTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[UserTotals]("totals",
      Encoders.product[UserTotals], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[UserEvent],
      timerValues: TimerValues): Iterator[UserCumulative] = {
    val prev = if (totals.exists()) totals.get() else UserTotals(0L, 0L)
    var n = prev.n
    var c = prev.cents
    rows.foreach { e => n += 1; c += e.cents }
    totals.update(UserTotals(n, c))
    Iterator.single(UserCumulative(key, n, c))
  }
}

/** The TTL twin of [[CumulativeTotalsProcessor]] — the unbounded-key-churn
  * configuration its Scaladoc points at: the per-user state carries
  * `TTLConfig(ttl)`, so a user idle longer than the TTL is EVICTED and
  * their totals restart from zero on return, instead of per-key state
  * accumulating forever (the only way per-entity state survives 100 TB/day
  * of churning users). TTL is processing-time by API contract; q84 makes
  * eviction deterministic by choosing ttl ≪ the inter-batch gap (a
  * micro-batch's planning alone exceeds 1 ms), so batch-2 reads always see
  * batch-1 state expired — the gate's oracle is per-batch-independent
  * totals, distinguishable from q74's carried state by construction. */
/** q100's input/state/output shapes: the cumulative totals of
  * [[CumulativeTotalsProcessor]] widened with a per-type distinct count so
  * the second state variable (a `MapState[event_type, count]`) is
  * observable in the oracle-checked output, not decorative. */
case class TypedEvent(user_id: Long, cents: Long, event_type: String)
case class BootstrapState(user_id: Long, n: Long, cents: Long,
                          type_counts: Map[String, Long])
case class TypedCumulative(user_id: Long, n_events: Long, sum_cents: Long,
                           n_types: Long)

/** The INITIAL-STATE bootstrap variant of [[CumulativeTotalsProcessor]] —
  * the standard batch→streaming migration path: a user's history arrives
  * once as batch-computed state (`handleInitialState`, called per key on
  * the FIRST micro-batch before any input rows), and the stream carries
  * only new events from there. Two state variables: the q74 `ValueState`
  * totals, plus a `MapState[event_type, count]` whose key set surfaces as
  * `n_types` in every emission — so a bootstrap that dropped or
  * double-applied the map state moves the output hash, same as the
  * totals.
  *
  * Scale shape: initial state distributes as a `KeyValueGroupedDataset`
  * co-partitioned with the stream by the grouping key — the bootstrap is
  * a one-time shuffled join into the state store, never a driver-side
  * load; per-key state stays O(event types) afterwards. */
class BootstrappedTotalsProcessor
    extends StatefulProcessorWithInitialState[
      Long, TypedEvent, TypedCumulative, BootstrapState] {

  @transient private var totals: ValueState[UserTotals] = _
  @transient private var typeCounts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    totals = getHandle.getValueState[UserTotals]("totals",
      Encoders.product[UserTotals], TTLConfig.NONE)
    typeCounts = getHandle.getMapState[String, Long]("typeCounts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInitialState(key: Long, st: BootstrapState,
                                  timerValues: TimerValues): Unit = {
    totals.update(UserTotals(st.n, st.cents))
    st.type_counts.foreach { case (t, c) => typeCounts.updateValue(t, c) }
  }

  override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
      timerValues: TimerValues): Iterator[TypedCumulative] = {
    val prev = if (totals.exists()) totals.get() else UserTotals(0L, 0L)
    var n = prev.n
    var c = prev.cents
    rows.foreach { e =>
      n += 1; c += e.cents
      val cur =
        if (typeCounts.containsKey(e.event_type))
          typeCounts.getValue(e.event_type)
        else 0L
      typeCounts.updateValue(e.event_type, cur + 1L)
    }
    totals.update(UserTotals(n, c))
    Iterator.single(TypedCumulative(key, n, c, typeCounts.keys().size.toLong))
  }
}

class TtlTotalsProcessor(ttlMs: Long)
    extends StatefulProcessor[Long, UserEvent, UserCumulative] {

  @transient private var totals: ValueState[UserTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[UserTotals]("totals",
      Encoders.product[UserTotals],
      new TTLConfig(java.time.Duration.ofMillis(ttlMs)))

  override def handleInputRows(key: Long, rows: Iterator[UserEvent],
      timerValues: TimerValues): Iterator[UserCumulative] = {
    // exists() is TTL-aware: expired state reads as absent, so the resume
    // path and the evicted path are the same code
    val prev = if (totals.exists()) totals.get() else UserTotals(0L, 0L)
    var n = prev.n
    var c = prev.cents
    rows.foreach { e => n += 1; c += e.cents }
    totals.update(UserTotals(n, c))
    Iterator.single(UserCumulative(key, n, c))
  }
}

/** q107's shapes: each event carries its deterministic order key
  * (event time + id) so "the last N" is well-defined regardless of
  * row order within a micro-batch. */
case class RecentEvent(user_id: Long, ts_us: Long, event_id: Long,
                       cents: Long)
case class RecentWindow(user_id: Long, n_recent: Long,
                        sum_cents_recent: Long, last_event_id: Long)

/** The `ListState` leg of `transformWithState` — the one typed state
  * variable q74 (ValueState), q100 (MapState), q84 (TTL) and q89
  * (timers) leave untouched: a BOUNDED per-user buffer of the most
  * recent `maxN` events, the "recent telemetry per device" shape behind
  * the reference's freshness discipline (`task.ts:231` keeps only the
  * newest DeviceStatusInfo per device; this generalizes to newest-N).
  * Each micro-batch appends the user's arrivals, trims to the newest N
  * by (event time, id) — a total order, so intra-batch row order cannot
  * change the result — and emits the running window metric (size, cents
  * sum, newest id).
  *
  * Why ListState and not a ValueState[Array[...]]: appends are O(new
  * rows) against the state store (RocksDB merge), only an overflow trim
  * rewrites the list — per-key cost is bounded by N + batch arrivals,
  * never by history length. Per-key state is ≤ N fixed-width rows, so
  * total state is keys × N — flat in stream length, the property that
  * lets a recent-events buffer survive 100 TB/day. */
class RecentEventsProcessor(maxN: Int)
    extends StatefulProcessor[Long, RecentEvent, RecentWindow] {

  @transient private var recent: ListState[RecentEvent] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getListState[RecentEvent]("recent",
      Encoders.product[RecentEvent], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[RecentEvent],
      timerValues: TimerValues): Iterator[RecentWindow] = {
    val incoming = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
    recent.appendList(incoming)
    // list order is append order; the re-sort (≤ maxN + batch elements)
    // makes the newest-N contract explicit rather than implicit in
    // batch-split monotonicity
    val all = recent.get().toArray.sortBy(e => (e.ts_us, e.event_id))
    val kept =
      if (all.length > maxN) {
        val k = all.takeRight(maxN)
        recent.put(k) // overflow trim — the one full-list rewrite
        k
      } else all
    Iterator.single(RecentWindow(key, kept.length.toLong,
      kept.map(_.cents).sum, kept.last.event_id))
  }
}

/** q108's evolved state shapes: v2 adds an OPTIONAL field to the
  * [[UserTotals]] state (Option ⇒ an Avro union-with-null — the
  * evolvable encoding; a required field could not be read from v1
  * state). */
case class UserTotalsV2(n: Long, cents: Long, maxCents: Option[Long])
case class UserCumulativeV2(user_id: Long, n_events: Long, sum_cents: Long,
                            // Option ⇒ nullable in the sink parquet, so the
                            // run-1 files (written before the column existed)
                            // stay readable under the merged schema
                            max_cents_run2: Option[Long])

/** The STATE-SCHEMA-EVOLUTION leg of the restart story — q90 proves a
  * restart recovers v1 state; this processor is the UPGRADED deployment
  * resuming on the same checkpoint: the state type grew a field
  * (`maxCents`), and under Avro state encoding
  * (`spark.sql.streaming.stateStore.encodingFormat=avro`) the store
  * reads v1 rows with the new field absent (None) and writes v2 rows —
  * no state migration job, no replay. That is the only operable upgrade
  * path at 100 TB of keyed state: a rewrite-the-state migration is a
  * full-store scan per deploy. The carried v1 counters keep
  * accumulating (the q74 contract); the new field starts fresh, and its
  * absent-state default (-1) is observable in the output so a silent
  * field drop or misdecode moves the gate hash. */
class EvolvedTotalsProcessor
    extends StatefulProcessor[Long, UserEvent, UserCumulativeV2] {

  @transient private var totals: ValueState[UserTotalsV2] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[UserTotalsV2]("totals",
      Encoders.product[UserTotalsV2], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[UserEvent],
      timerValues: TimerValues): Iterator[UserCumulativeV2] = {
    val prev = if (totals.exists()) totals.get() else UserTotalsV2(0L, 0L, None)
    var n = prev.n
    var c = prev.cents
    var mx = prev.maxCents.getOrElse(-1L)
    rows.foreach { e => n += 1; c += e.cents; mx = math.max(mx, e.cents) }
    totals.update(UserTotalsV2(n, c, Some(mx)))
    Iterator.single(UserCumulativeV2(key, n, c, Some(mx)))
  }
}

/** q119's shapes: per-event-type cents feed a MERGEABLE histogram
  * sketch; each batch the processor emits the type's running quantile
  * cutoffs derived from the whole carried histogram. */
case class TypedCents(event_type: String, cents: Long)
case class QuantileEmit(event_type: String, n_total: Long, p50_bin: Long,
                        p90_bin: Long)

/** Streaming QUANTILE-SKETCH maintenance — t29's bit-exact mergeable
  * histogram (power-of-2 bin width, integer counts) carried as
  * `MapState[bin, count]` on `transformWithState`: the production way to
  * serve "current p50/p90 score cutoff per source" over an unbounded
  * stream without ever storing or sorting events. The update is a
  * commutative integer merge (bin-count sums), so within-batch row order
  * can't move the emission, and the cutoff rule (smallest bin whose
  * ascending cumulative count reaches ⌈q·n⌉, tested as `k·cum >= m·n`
  * in integers) is bit-exact cross-engine — the same discipline that
  * makes t29 oracle-able, here proven to survive a state-store batch
  * boundary.
  *
  * Scale shape: state per key is O(bins) (score domain / bin width —
  * metadata, not events), partitioned by the grouping key; emission cost
  * is one sorted pass over the key's own bins per batch. */
class QuantileSketchProcessor
    extends StatefulProcessor[String, TypedCents, QuantileEmit] {

  @transient private var bins: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    bins = getHandle.getMapState[Long, Long]("bins",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[TypedCents],
      timerValues: TimerValues): Iterator[QuantileEmit] = {
    rows.foreach { e =>
      val b = Math.floorDiv(e.cents, 64L)
      val cur = if (bins.containsKey(b)) bins.getValue(b) else 0L
      bins.updateValue(b, cur + 1L)
    }
    val hist = bins.keys().map(b => (b, bins.getValue(b))).toArray
      .sortBy(_._1)
    val n = hist.map(_._2).sum
    var cum = 0L
    var p50 = -1L
    var p90 = -1L
    hist.foreach { case (b, c) =>
      cum += c
      if (p50 < 0 && 2L * cum >= n) p50 = b
      if (p90 < 0 && 10L * cum >= 9L * n) p90 = b
    }
    Iterator.single(QuantileEmit(key, n, p50, p90))
  }
}
