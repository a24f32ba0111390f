package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Event-time TIMERS on Spark 4's `transformWithState` — the one
  * arbitrary-state feature q74 (carried state) and q84 (TTL eviction)
  * leave untouched: output produced when a per-key EVENT-TIME TIMER fires
  * (the watermark passes a registered expiry), not when new data arrives.
  * This is the session-timeout / abandonment shape every engagement
  * pipeline needs: "emit the closed session once the user has been idle
  * for the gap", driven by time, not by the user's next action.
  *
  * The processor keeps one open session per user plus a list of sessions
  * already closed by a LATER event (an intra-arrival gap) that still
  * await their emission time. `handleInputRows` NEVER emits — it only
  * folds events into state and registers a timer at `last + gap`;
  * `handleExpiredTimer` is the single emission point.
  *
  * Timer discipline (what makes this correct without ever deleting a
  * timer): a session extended by new events leaves its old timer
  * registered — when that stale timer fires, the guard
  * `last + gap <= expiry` fails and the fire is a no-op. A parked
  * (gap-closed) session registers its EXACT end as a timer at parking
  * time, so it emits as soon as the watermark passes that end —
  * independent of the open session's future (a key that never goes idle
  * must not hold its closed sessions hostage). Each emits exactly once
  * because emission removes it from the pending list, and stale timers
  * firing over the shared list re-check the guard against what remains.
  * Emission is therefore a pure function of the
  * event data (which timer DELIVERS a session may vary; what is emitted
  * cannot), which is what lets the output hash-match q57's batch oracle.
  *
  * Scale shape: state is per-key O(open + parked-within-one-watermark)
  * — parked sessions drain as the watermark advances, so state is
  * bounded by the gap, not the corpus. Timers live in the state store
  * beside the values, partitioned by the grouping key. */
case class SessEvent(user_id: Long, tsm: java.sql.Timestamp)
case class OpenSession(start_ms: Long, last_ms: Long, n: Long)
case class UserSession(user_id: Long, session_start_ms: Long,
                       session_end_ms: Long, n_events: Long)

class SessionTimeoutProcessor(gapMs: Long)
    extends StatefulProcessor[Long, SessEvent, UserSession] {

  @transient private var open: ValueState[OpenSession] = _
  @transient private var pending: ListState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    open = getHandle.getValueState[OpenSession]("open",
      Encoders.product[OpenSession], TTLConfig.NONE)
    pending = getHandle.getListState[OpenSession]("pending",
      Encoders.product[OpenSession], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[SessEvent],
      timerValues: TimerValues): Iterator[UserSession] = {
    // sort the batch's events: the iterator order is partition-arbitrary,
    // the session fold is order-sensitive. Bounded by one key's events in
    // one micro-batch.
    val ordered = rows.map(_.tsm.getTime).toArray.sorted
    var cur = if (open.exists()) open.get() else null
    // a session restored from state already has a timer at last+gap from
    // the batch that last touched it (the end-of-batch registration
    // invariant below); only a session modified THIS batch needs a fresh
    // one — re-registering an existing (key, expiry) is a warn in the
    // timer store, and at corpus scale a warn per (user, batch) is a log
    // flood
    var dirty = false
    ordered.foreach { t =>
      if (cur == null) { cur = OpenSession(t, t, 1L); dirty = true }
      else if (t - cur.last_ms >= gapMs) {
        // a LATER event closed this session; emission still waits for a
        // timer — park it WITH its own exact timer: without one, a key
        // that never goes idle (open session forever extending) would
        // hold its closed sessions hostage on the open session's timer
        pending.appendValue(cur)
        if (dirty) getHandle.registerTimer(cur.last_ms + gapMs)
        cur = OpenSession(t, t, 1L)
        dirty = true
      } else {
        cur = OpenSession(cur.start_ms, math.max(cur.last_ms, t), cur.n + 1L)
        dirty = true
      }
    }
    if (cur != null) {
      open.update(cur)
      if (dirty) getHandle.registerTimer(cur.last_ms + gapMs)
    }
    Iterator.empty // emission is timer-driven only
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[UserSession] = {
    val expiry = expiredTimerInfo.getExpiryTimeInMs
    val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
    if (pending.exists()) {
      val (done, keep) = pending.get().toArray
        .partition(sess => sess.last_ms + gapMs <= expiry)
      done.foreach(sess =>
        out += UserSession(key, sess.start_ms, sess.last_ms + gapMs, sess.n))
      if (done.nonEmpty) {
        pending.clear()
        if (keep.nonEmpty) pending.put(keep)
      }
    }
    if (open.exists()) {
      val cur = open.get()
      // only the session's OWN (latest) timer passes this guard; stale
      // timers from pre-extension registrations fall through as no-ops
      if (cur.last_ms + gapMs <= expiry) {
        out += UserSession(key, cur.start_ms, cur.last_ms + gapMs, cur.n)
        open.clear()
      }
    }
    out.iterator
  }
}
