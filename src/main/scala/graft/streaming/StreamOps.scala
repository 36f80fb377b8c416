package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface.
  *
  * The reference is batch-only (SURVEY.md §2.9) — its README merely
  * suggests daily/weekly orchestration. This module is the engine's
  * incremental counterpart: the same Column-expression operators
  * (profilers, scorers, text ops are all pure row-wise/aggregation
  * expressions) applied to an unbounded source with event-time
  * semantics. Three shapes cover the reference's scoring flows:
  *
  *  - [[windowedStats]] — watermarked sliding-window aggregates
  *    (profiling over a moving horizon);
  *  - [[foreachBatchScorer]] — per-micro-batch application of ANY batch
  *    transform (e.g. a broadcast IsolationForest/LinearAE scorer):
  *    incremental scoring with zero operator changes;
  *  - [[runningMaxPerKey]] — custom keyed state via mapGroupsWithState
  *    (per-series cumulative extremes, the stateful primitive the
  *    sliding-sequence operators need in streaming form);
  *  - [[streamingPsi]] — continuous drift monitoring: PSI per
  *    event-time window against a frozen training baseline.
  *
  * Scale: watermarks bound state; per-key state is O(distinct keys);
  * foreachBatch inherits the batch operators' shuffle/broadcast shapes.
  */
object StreamOps {

  /** Watermarked sliding-window stats per key: count / sum / mean of
    * `valueCol` over `windowDur` windows sliding every `slideDur`.
    * Late rows beyond `watermarkDelay` are dropped (deterministic
    * completeness contract instead of unbounded state).
    */
  def windowedStats(stream: DataFrame, tsCol: String, keyCol: String,
                    valueCol: String, windowDur: String, slideDur: String,
                    watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur, slideDur), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as("value_sum"),
        avg(col(valueCol)).as("value_mean"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol), col("n"), col("value_sum"), col("value_mean"))

  /** Watermarked windowed DISTINCT cardinality via HyperLogLog++
    * (`approx_count_distinct`): the sliding unique-actives metric
    * (DAU/WAU) in streaming form. Exact COUNT(DISTINCT) is not
    * streamable — it would buffer every key per window; HLL's
    * fixed-size mergeable register state is precisely what makes the
    * metric incremental, and the sketch is deterministic for fixed
    * data, so stream and batch agree bit-for-bit on the same slice
    * (StreamingSpec pins the parity).
    */
  def streamingWindowedDistinct(stream: DataFrame, tsCol: String,
                                keyCol: String, windowDur: String,
                                watermarkDelay: String,
                                rsd: Double = 0.05): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur))
      .agg(approx_count_distinct(col(keyCol), rsd).as("approx_distinct"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("approx_distinct"), col("n_events"))

  /** Watermarked windowed AMS F₂ sketch — the streaming form of the
    * q274 batch estimator (self-join size / repeat rate of the keyed
    * stream per window). Each of the 16 ±1 counters is a plain
    * associative SUM, which is exactly why AMS streams: the state per
    * window is 16 longs regardless of volume, merges across
    * micro-batches by addition, and is bit-deterministic for fixed
    * data (StreamingSpec pins exact stream/batch parity — integers,
    * not approximate agreement). Signs use the quadratic-residue
    * parity of (h + j·1000003)² mod P (the q264/q274 measured-full-rank
    * formula). `hashCol` must already carry the item hash (one hash
    * per row, not one per counter — the HOF re-hash trap).
    */
  def streamingAmsF2(stream: DataFrame, tsCol: String, hashCol: String,
                     windowDur: String, watermarkDelay: String): DataFrame = {
    val P = 1000000007L
    val sums = (1 to 16).map { j =>
      // pre-reduce the item hash into [0, P) before squaring (the batch
      // q317 estimator's rule): a full-range 64-bit hash would make t*t
      // wrap Long and void the quadratic-residue balance of the ±1
      // signs. t ≤ P + 16·1000003 < 2^31, so t*t stays well inside Long.
      val t = pmod(col(hashCol), lit(P)) + lit(j * 1000003L)
      sum(when((t * t) % P % 2 === 0, 1L).otherwise(-1L)).as(s"s$j")
    } :+ count(lit(1)).as("n_events")
    val sq = (1 to 16).map(j => col(s"s$j") * col(s"s$j")).reduce(_ + _)
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur))
      .agg(sums.head, sums.tail: _*)
      .select(Seq(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n_events"),
        (sq.cast("double") / lit(16.0)).as("f2_est")) ++
        (1 to 16).map(j => col(s"s$j")): _*)
  }

  /** Threshold alert stream: rows whose score exceeds thr (the P9
    * anomaly-flag predicate, streaming form — pure stateless filter).
    */
  def thresholdAlerts(stream: DataFrame, scoreCol: String, thr: Double): DataFrame =
    stream.where(col(scoreCol) > thr)

  /** Apply an arbitrary *batch* transform to every micro-batch and hand
    * the result to `sink`. This is how the fitted anomaly models score
    * incrementally: `batchTransform = df => model.transform(df, ...)`.
    */
  def foreachBatchScorer(stream: DataFrame,
                         batchTransform: DataFrame => DataFrame,
                         sink: (DataFrame, Long) => Unit,
                         checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(batchTransform(batch), id)
      }
      .start()

  /** Streaming exact deduplication: drop rows whose key was already
    * seen, with state bounded by the event-time watermark
    * (`dropDuplicatesWithinWatermark`) — the incremental form of
    * [[graft.dedup.Dedup.dropExactDups]] for continuously-ingested
    * corpora. Keys older than the watermark are evicted from state, so
    * memory is O(keys per watermark window), not O(stream).
    */
  def streamingDedup(stream: DataFrame, keyCols: Seq[String], tsCol: String,
                     watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream–static enrichment join: each micro-batch joins against a
    * (small) static dimension — broadcast per batch, no stream-side
    * state. The streaming form of the engine's dim joins (q31).
    */
  def enrich(stream: DataFrame, dim: DataFrame,
             joinCols: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), joinCols)

  /** Streaming drift monitor: PSI per event-time window against a
    * frozen training-time baseline
    * ([[graft.drift.Drift.fitPsiBaseline]]) — the incremental form of
    * [[graft.drift.Drift.psi]], i.e. continuous "is serving data
    * drifting from training data" monitoring.
    *
    * Structure chosen for streaming constraints: ONE watermarked
    * tumbling-window aggregation computes per-window bin counts as
    * cols × bins CONDITIONAL counts (wide form — a second stateful
    * aggregation for totals/proportions would be illegal in append
    * mode), then psi per column is a STATELESS projection over those
    * count columns with the baseline proportions riding in as literals
    * (no stream-side join, no extra state). Output: one
    * (window_start, window_end, feature, psi) row per column per
    * closed window; a column with no valid values in a window emits
    * null psi (same convention as batch). State is O(open windows ×
    * cols × bins) — watermark-bounded, scale-free in the row count.
    */
  def streamingPsi(stream: DataFrame, tsCol: String,
                   base: graft.drift.Drift.PsiBaseline,
                   windowDur: String, watermarkDelay: String,
                   eps: Double = 1e-6): DataFrame = {
    import graft.drift.Drift
    val aggs = base.cols.zipWithIndex.flatMap { case (c, ci) =>
      val bin = Drift.binIndex(col(c).cast("double"), base.edges(c))
      (0 to base.edges(c).size).map(b =>
        count(when(bin === b, 1)).as(s"__n_${ci}_$b"))
    }
    val win = stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur))
      .agg(aggs.head, aggs.tail: _*)
    val psiCols = base.cols.zipWithIndex.map { case (c, ci) =>
      val nb = (0 to base.edges(c).size).map(b => col(s"__n_${ci}_$b"))
      val total = nb.reduce(_ + _)
      val terms = nb.zipWithIndex.map { case (n, b) =>
        val pc = greatest(n.cast("double") / total.cast("double"), lit(eps))
        val pb = lit(base.props(c)(b))
        (pc - pb) * log(pc / pb)
      }
      when(total > 0, round(terms.reduce(_ + _), 6)).as(s"__psi_$ci")
    }
    val wide = win.select(
      Seq(col("window.start").as("window_start"),
        col("window.end").as("window_end")) ++ psiCols: _*)
    // long form via a stateless explode (NOT a self-union of the
    // aggregation, which would double the state store)
    val pairs = explode(array(base.cols.zipWithIndex.map { case (c, ci) =>
      struct(lit(c).as("feature"), col(s"__psi_$ci").as("psi"))
    }: _*))
    wide.select(col("window_start"), col("window_end"), pairs.as("fp"))
      .select(col("window_start"), col("window_end"),
        col("fp.feature").as("feature"), col("fp.psi").as("psi"))
  }

  /** Exactly-once-style sink wrapper for [[foreachBatchScorer]]-shaped
    * pipelines: `foreachBatch` is AT-LEAST-ONCE (a crash between sink
    * write and checkpoint commit replays the batch), so any sink with
    * side effects must be idempotent per (queryKey, batchId). This
    * wrapper makes an arbitrary sink idempotent with a processed-batch
    * ledger: a replayed batchId is skipped instead of re-applied. The
    * ledger here is in-memory per queryKey (the unit-testable core);
    * production swaps `markIfNew` for a transactional INSERT into a
    * commit table next to the data (the standard lakehouse pattern).
    */
  final class IdempotentSink(queryKey: String,
                             sink: (DataFrame, Long) => Unit)
      extends ((DataFrame, Long) => Unit) with Serializable {
    // the ledger is marked AFTER the sink succeeds, never before: a
    // sink that throws must stay unmarked so the replay retries it —
    // marking first would turn a transient sink failure into silent
    // permanent data loss. foreachBatch invokes serially per query, so
    // check-then-mark needs no cross-batch atomicity.
    def apply(batch: DataFrame, batchId: Long): Unit =
      if (!IdempotentSink.processed(queryKey, batchId)) {
        sink(batch, batchId)
        IdempotentSink.mark(queryKey, batchId)
      }
  }

  object IdempotentSink {
    // batchIds are monotonically increasing per query, so the ledger is
    // a single high-watermark Long per queryKey (max committed batchId)
    // rather than a Set — O(1) memory over an unbounded run, and the
    // same shape as the transactional commit-table pattern the class
    // doc describes (SELECT max(batch_id) ... / INSERT).
    private val watermark = scala.collection.mutable.Map.empty[String, Long]
    def processed(queryKey: String, batchId: Long): Boolean =
      watermark.synchronized { watermark.get(queryKey).exists(batchId <= _) }
    def mark(queryKey: String, batchId: Long): Unit = watermark.synchronized {
      watermark.update(queryKey, math.max(watermark.getOrElse(queryKey, Long.MinValue), batchId))
    }
    /** Test/reset hook. */
    def clear(queryKey: String): Unit =
      watermark.synchronized { watermark.remove(queryKey); () }
  }

  /** Open-session state for [[streamingSessionize]]: millis bounds +
    * running aggregates of the session being built per key.
    */
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)

  /** Streaming gap-based sessionization — the incremental form of
    * [[graft.seq.Sessionizer]]: events with the same key belong to one
    * session while consecutive event times are within `gapMs`; a
    * session CLOSES (and is emitted, append-mode) either when a
    * later event of the same key arrives past the gap, or when the
    * event-time watermark passes `last + gapMs` (EventTimeTimeout —
    * no more in-gap events can exist, by the watermark contract).
    * Emits (key, session_start, session_end, n_events, value_sum).
    *
    * State is one [[SessionState]] per ACTIVE key — watermark-bounded:
    * idle keys time out, emit, and are removed. Events are processed
    * in event-time order within each micro-batch; cross-batch
    * disorder beyond the watermark delay is dropped upstream by the
    * watermark itself (the same completeness contract as
    * [[windowedStats]]).
    */
  def streamingSessionize(stream: DataFrame, tsCol: String, keyCol: String,
                          valueCol: String, gapMs: Long,
                          watermarkDelay: String): DataFrame = {
    import stream.sparkSession.implicits._
    require(gapMs > 0, s"streamingSessionize needs a positive gap: $gapMs")
    // project/cast FIRST, watermark the projected column: a cast after
    // withWatermark mints a new attribute without the event-time tag
    // and EventTimeTimeout then rejects the plan
    val typed = stream
      .select(col(keyCol).cast("string").as("k"),
        col(tsCol).cast("timestamp").as("ts"),
        col(valueCol).cast("double").as("v"))
      .withWatermark("ts", watermarkDelay)
      .as[(String, java.sql.Timestamp, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState,
        (String, java.sql.Timestamp, java.sql.Timestamp, Long, Double)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator((key, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.sum))
          } else {
            val events = rows.map(r => (r._2.getTime, r._3)).toArray.sortBy(_._1)
            val closed = scala.collection.mutable.ArrayBuffer
              .empty[(String, java.sql.Timestamp, java.sql.Timestamp, Long, Double)]
            def emit(s: SessionState): Unit =
              closed += ((key, new java.sql.Timestamp(s.start),
                new java.sql.Timestamp(s.last), s.n, s.sum))
            var cur = state.getOption
            // stale events (more than a gap BEFORE the open session —
            // older sessions this operator can no longer grow) are
            // gap-merged among THEMSELVES before emission, matching the
            // batch Sessionizer: adjacent stale events within gapMs
            // form one session, not n single-event sessions. A stale
            // chain can never reach the open session (each member is
            // > gapMs before its start by definition), so the merge
            // stays local to this accumulator.
            var stale = Option.empty[SessionState]
            events.foreach { case (t, v) =>
              cur match {
                // in-gap on EITHER side: a within-watermark late event
                // extends the session backwards (start = min), not just
                // forwards — the signed `t - last` alone would silently
                // swallow arbitrarily-early events into the wrong session
                case Some(s) if t >= s.start - gapMs && t - s.last <= gapMs =>
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1, s.sum + v))
                case Some(s) if t < s.start - gapMs =>
                  stale match {
                    case Some(st) if t - st.last <= gapMs =>
                      stale = Some(SessionState(st.start, math.max(st.last, t),
                        st.n + 1, st.sum + v))
                    case other =>
                      other.foreach(emit)
                      stale = Some(SessionState(t, t, 1L, v))
                  }
                case Some(s) =>
                  emit(s)
                  cur = Some(SessionState(t, t, 1L, v))
                case None =>
                  cur = Some(SessionState(t, t, 1L, v))
              }
            }
            stale.foreach(emit)
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.iterator
          }
      }
      .toDF("key", "session_start", "session_end", "n_events", "value_sum")
  }

  /** Watermarked stream-stream inner join — the last §2.9 shape: two
    * unbounded sources equi-joined on a key with an event-time
    * interval constraint (right.ts ∈ [left.ts − before, left.ts +
    * after]). BOTH sides carry watermarks and the time-range predicate
    * bounds BOTH buffers: Spark derives, from watermark + range, how
    * long each side's rows can still find partners, and evicts state
    * past that horizon — without the range constraint the buffers grow
    * forever, which is why this wrapper makes it non-optional.
    * Left columns are prefixed `l_`, right `r_`, to keep the joined
    * schema collision-free.
    *
    * Scale: state is O(in-horizon rows per side), hash-partitioned by
    * key; the join itself is the same shuffled equi-join as batch.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       keyCol: String, tsCol: String,
                       leftWatermark: String, rightWatermark: String,
                       before: String, after: String): DataFrame = {
    val l = left.columns.foldLeft(left)((df, c) => df.withColumnRenamed(c, s"l_$c"))
      .withWatermark(s"l_$tsCol", leftWatermark)
    val r = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
      .withWatermark(s"r_$tsCol", rightWatermark)
    l.join(r, expr(
      s"""l_$keyCol = r_$keyCol AND
         | r_$tsCol >= l_$tsCol - interval $before AND
         | r_$tsCol <= l_$tsCol + interval $after""".stripMargin
        .replaceAll("\n", " ")))
  }

  /** Streaming NEAR-DUP candidate alerts — the incremental form of the
    * MinHash-LSH banded dedup ([[graft.dedup.MinHashLSH]]): each
    * arriving document's 16×4 band keys are checked against per-bucket
    * keyed state holding the bucket's FIRST owner; any later arrival
    * in an occupied bucket emits (band, bucket, first_id, dup_id).
    * The alert stream IS the banded candidate stream — downstream
    * consumers dedup/verify exactly as the batch path does after
    * `candidatePairs` (the StreamingSpec parity assertion). State is
    * one long per non-empty bucket — fixed-size and key-partitioned,
    * the same scale envelope as the batch band table; arrivals are
    * id-ordered within a batch so replays are deterministic.
    */
  def streamingNearDupAlerts(stream: DataFrame, idCol: String,
                             textCol: String, n: Int = 3, k: Int = 16,
                             bands: Int = 4): DataFrame = {
    import stream.sparkSession.implicits._
    graft.dedup.MinHashLSH.bandKeys(stream, idCol, textCol, n, k, bands)
      .select(col("band_idx").cast("int").as("band_idx"),
        col("band_key").cast("long").as("band_key"),
        col("id").cast("long").as("id"))
      .as[(Int, Long, Long)]
      .groupByKey { case (bi, bkey, _) => (bi, bkey) }
      .flatMapGroupsWithState[Long, (Int, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((bi, bkey), rows, state) =>
          val ids = rows.map(_._3).toSeq.sorted
          var first = state.getOption.getOrElse(Long.MaxValue)
          val alerts =
            scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long)]()
          ids.foreach { id =>
            if (first == Long.MaxValue) first = id
            else if (id != first) alerts += ((bi, bkey, first, id))
          }
          state.update(first)
          alerts.iterator
      }
      .toDF("band_idx", "band_key", "first_id", "dup_id")
  }

  /** Streaming twin of `seq.Rolling.ewmaByKey`: per-key EWMA carried as
    * explicit (ewma, n) state across micro-batches. Each batch's new
    * rows are sorted by (ts, value) and folded `s ← s·(1−α) + v·α` onto
    * the carried state — BIT-IDENTICAL to the batch fold when events
    * arrive time-ordered across batches (the StreamingSpec parity
    * assertion). Out-of-order arrivals WITHIN a batch are handled by
    * the sort; across batches they would need the watermarked-buffer
    * pattern of [[streamingSessionize]] — EWMA is order-defined, so a
    * late event cannot be folded exactly without replaying the fold;
    * callers needing exactness under cross-batch disorder should
    * window-buffer upstream. Emits (key, n, ewma) per key per batch.
    *
    * State is two doubles per key — O(distinct keys), no timeout by
    * default (a monitoring EWMA is long-lived by design).
    */
  def streamingEwma(stream: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    import stream.sparkSession.implicits._
    stream
      .select(col(keyCol).cast("long").as("k"), col(tsCol).cast("long").as("t"),
        col(valueCol).cast("double").as("v"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Double)],
         state: GroupState[(Double, Long)]) =>
          val ordered = rows.toSeq.sortBy(r => (r._2, r._3)).map(_._3)
          val (s0, n0) =
            if (state.exists) (state.get._1, state.get._2)
            else (ordered.head, 1L)
          val start = if (state.exists) ordered else ordered.tail
          val s = start.foldLeft(s0)((s, v) => s * (1.0 - alpha) + v * alpha)
          val n = n0 + start.size
          state.update((s, n))
          (key, n, s)
      }
      .toDF("key", "n", "ewma")
  }

  /** Streaming heavy hitters: sharded Misra–Gries over an unbounded
    * stream. Items hash into `buckets` shards (every occurrence of a
    * value lands in the SAME shard, so each shard's summary covers its
    * values completely); each shard keeps a capacity-bounded MG
    * counter map as mapGroupsWithState state — O(buckets × capacity)
    * total, independent of stream length — and emits its tracked
    * (item, count_lb, n_shard) rows each micro-batch. The incremental
    * twin of [[graft.core.HeavyHitters]]: MG's guarantee carries over
    * per shard — a tracked counter underestimates the true count by at
    * most n_shard/capacity, and any item with true shard frequency
    * above n_shard/capacity is still tracked — so the union of shard
    * summaries is a superset of the exact heavy hitters at any
    * threshold ≥ 1/capacity of a shard (StreamingSpec pins both
    * properties against the batch-exact operator).
    */
  final case class MgSummary(counters: Map[String, Long], n: Long)

  def streamingHeavyHitters(stream: DataFrame, itemCol: String,
                            buckets: Int = 32,
                            capacity: Int = 64): DataFrame = {
    require(buckets >= 1 && capacity >= 2,
      s"need buckets >= 1, capacity >= 2: $buckets, $capacity")
    import stream.sparkSession.implicits._
    stream.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
      .as[String]
      .groupByKey(item => math.floorMod(item.hashCode, buckets))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[String], state: GroupState[MgSummary]) =>
          val counters = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          var n = 0L
          if (state.exists) {
            state.get.counters.toSeq.sortBy(_._1)
              .foreach { case (k, v) => counters.update(k, v) }
            n = state.get.n
          }
          rows.foreach { v =>
            n += 1
            counters.get(v) match {
              case Some(c) => counters.update(v, c + 1)
              case None if counters.size < capacity => counters.update(v, 1L)
              case None =>
                val dead = scala.collection.mutable.ArrayBuffer.empty[String]
                counters.foreach { case (key, c) =>
                  if (c == 1L) dead += key else counters.update(key, c - 1)
                }
                dead.foreach(counters.remove)
            }
          }
          state.update(MgSummary(counters.toMap, n))
          val nOut = n
          counters.iterator.map { case (item, c) =>
            (shard, item, c, nOut)
          }.toSeq.iterator
      }
      .toDF("shard", "item", "count_lb", "n_shard")
  }

  /** Keyed running maximum via explicit state (mapGroupsWithState):
    * emits (key, running_max_so_far) once per key per micro-batch.
    */
  def runningMaxPerKey(stream: DataFrame, keyCol: String,
                       valueCol: String): DataFrame = {
    import stream.sparkSession.implicits._
    stream
      .select(col(keyCol).cast("string").as("k"), col(valueCol).cast("double").as("v"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[Double]) =>
          val localMax = rows.map(_._2).foldLeft(Double.NegativeInfinity)(math.max)
          val newMax = if (state.exists) math.max(state.get, localMax) else localMax
          state.update(newMax)
          (key, newMax)
      }
      .toDF("key", "running_max")
  }
}
