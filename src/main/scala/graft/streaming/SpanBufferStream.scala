package graft.streaming

import graft.model.{Span, SpanBuffer}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming trace assembly — the Spark Structured Streaming analogue of
  * the reference indexer's span accumulation loop
  * (indexer/processors/SpanIndexProcessor.scala +
  * store/impl/SpanBufferMemoryStore.scala): spans buffer per traceId and
  * the buffer seals when the trace has been quiet for `gapSeconds`
  * (event time, watermark-driven — the reference uses wall-clock
  * accumulate windows) or when it reaches `maxSpans` (the reference's
  * eviction cap).
  *
  * Scale: state is partitioned by traceId across executors (the
  * reference shards by Kafka partition); per-trace state is bounded by
  * `maxSpans`, and the watermark bounds total state retention.
  *
  * Source wiring: any streaming Dataset[Span] works — MemoryStream in
  * tests, files, or Kafka in production:
  * {{{
  *   spark.readStream.format("kafka")
  *     .option("kafka.bootstrap.servers", bootstrap)
  *     .option("subscribe", "proto-spans")         // reference topic name
  *     .load().select(deserializeSpan($"value"))   // indexer/serde/SpanDeserializer.scala
  * }}}
  * (the kafka connector jar is not in this offline image, so that path
  * is documentation, not tested code).
  */
object SpanBufferStream {

  /** Accumulation state for one in-flight trace. */
  case class BufferState(spans: Seq[Span], lastEventUs: Long)

  /** spans (streaming, with event-time watermark applied here) →
    * sealed SpanBuffers. */
  def assemble(spans: Dataset[Span], gapSeconds: Long, maxSpans: Int): Dataset[SpanBuffer] = {
    val s = spans.sparkSession
    import s.implicits._
    val gapMs = gapSeconds * 1000L

    // the watermark column must flow INTO the stateful operator, so the
    // span rides alongside it as a struct
    val withTime = spans
      .select(struct(spans.columns.map(col).toIndexedSeq: _*).as("_1"),
        timestamp_micros(col("startUs")).as("_2"))
      .withWatermark("_2", s"$gapSeconds seconds")
      .as[(Span, java.sql.Timestamp)]

    withTime
      .groupByKey(_._1.traceId)
      .flatMapGroupsWithState[BufferState, SpanBuffer](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (traceId: String, incoming: Iterator[(Span, java.sql.Timestamp)], state: GroupState[BufferState]) =>
          if (state.hasTimedOut) {
            // quiet for >= gap: seal and emit (SpanBufferMemoryStore
            // getAndRemoveSpanBuffersOlderThan semantics)
            val sealed_ = state.get
            state.remove()
            Iterator.single(SpanBuffer(traceId, sealed_.spans))
          } else {
            val fresh = incoming.map(_._1).toSeq
            val prev = state.getOption.map(_.spans).getOrElse(Seq.empty)
            val all = prev ++ fresh
            val lastUs = (state.getOption.map(_.lastEventUs).getOrElse(0L) +: fresh.map(_.startUs)).max
            if (all.size >= maxSpans) {
              // cap hit: early-seal, like the reference's eldest-entry
              // eviction under memory pressure
              state.remove()
              Iterator.single(SpanBuffer(traceId, all))
            } else {
              state.update(BufferState(all, lastUs))
              // late spans can arrive with the watermark already past
              // this trace's quiet deadline — clamp so the seal fires on
              // the very next batch instead of throwing
              state.setTimeoutTimestamp(
                math.max(lastUs / 1000L + gapMs, state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            }
          }
      }
  }

  /** Native session-window trace assembly — the same accumulate-and-
    * seal semantics as [[assemble]] expressed with `session_window`
    * instead of a user state function: spans of a trace group into a
    * session that extends while spans keep arriving within
    * `gapSeconds` of the last one; the session closes (and emits) when
    * the watermark passes its end. Where [[assemble]] keeps whatever
    * arrived in one open buffer until the trace goes quiet,
    * session_window ALSO splits on in-trace quiet gaps in the same
    * batch — on a timeline whose traces are each dense (no internal
    * gap >= gapSeconds) the two seal identical buffers
    * (SpanBufferStreamSpec proves it). Upsides of the native form: no
    * state-function code to maintain, mergeable sessions handled by
    * the engine, and the planner can right-size the single shuffle.
    *
    * Emits (trace_id, session_start_us, span_count) summaries. */
  def assembleSessions(spans: Dataset[Span], gapSeconds: Long): DataFrame =
    spans
      .withColumn("event_time", timestamp_micros(col("startUs")))
      .withWatermark("event_time", s"$gapSeconds seconds")
      .groupBy(col("traceId"), session_window(col("event_time"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("span_count"))
      .select(
        col("traceId").as("trace_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("span_count"))

  /** Streaming trace-index documents: windowed per-(service, operation)
    * rollups with watermark-bounded state — the streaming analogue of
    * the indexer's ES docs (IndexDocumentGenerator), emitted per time
    * window instead of per trace. Distinct-duration cardinality uses
    * HyperLogLog (approx_count_distinct) because exact distincts are
    * unbounded state in a stream — same trade the reference makes by
    * truncating long durations to second granularity. */
  def indexDocsStream(spans: Dataset[Span], windowSeconds: Long, gapSeconds: Long): DataFrame =
    spans
      .withColumn("event_time", timestamp_micros(col("startUs")))
      .withWatermark("event_time", s"$gapSeconds seconds")
      .groupBy(
        window(col("event_time"), s"$windowSeconds seconds"),
        col("service"), col("operation"))
      .agg(
        count(lit(1)).as("span_count"),
        min("startUs").as("min_start_us"),
        approx_count_distinct("durationUs").as("approx_distinct_durations"))

  /** Streaming latency percentiles per (window, service) — the
    * haystack-trends-style rollup as a stream. percentile_approx's
    * t-digest sketch is mergeable with bounded memory, so state per
    * open window is O(services × sketch), never O(spans); the
    * watermark closes windows and evicts their state. The streaming
    * counterpart of the batch `trace_latency_quantiles` pair. */
  def latencyQuantilesStream(spans: Dataset[Span], windowSeconds: Long, gapSeconds: Long): DataFrame =
    spans
      .withColumn("event_time", timestamp_micros(col("startUs")))
      .withWatermark("event_time", s"$gapSeconds seconds")
      .groupBy(window(col("event_time"), s"$windowSeconds seconds"), col("service"))
      .agg(
        expr("percentile_approx(durationUs, array(0.5, 0.95, 0.99), 1000)").as("pcts"),
        count(lit(1)).as("n_spans"))
      .select(col("window"), col("service"),
        col("pcts").getItem(0).as("p50"),
        col("pcts").getItem(1).as("p95"),
        col("pcts").getItem(2).as("p99"),
        col("n_spans"))

  /** Streaming exact de-duplication: at-least-once sources (the
    * reference consumes Kafka with retries) deliver duplicate spans;
    * watermarked dropDuplicates keeps (traceId, spanId) state only
    * until the watermark passes — bounded state, exactly-once output.
    * The streaming counterpart of DeDuplicateSpanTransformer (A17). */
  def dedupSpans(spans: Dataset[Span], gapSeconds: Long): Dataset[Span] = {
    val s = spans.sparkSession
    import s.implicits._
    spans
      .withColumn("event_time", timestamp_micros(col("startUs")))
      .withWatermark("event_time", s"$gapSeconds seconds")
      .dropDuplicates("traceId", "spanId", "event_time")
      .drop("event_time").as[Span]
  }

  /** One buffered touch/conversion event of an in-flight journey. */
  case class AttrEvent(service: String, startUs: Long, spanId: Long)

  /** Per-channel credit accumulator (closed journeys only). */
  case class AttrAcc(first: Long, last: Long, linear: Long, touches: Long)

  /** Compact running summary of the one open (not yet purchase-closed)
    * journey: first/last channel plus per-channel touch counts — all
    * the attribution rule ever reads, so the open journey costs
    * O(distinct channels) state no matter how many touches it has. */
  case class OpenJourney(
      first: String, last: String, counts: Map[String, Long], size: Long)

  /** Accumulation state for one user's attribution journeys: credits of
    * journeys already CLOSED under the watermark live in the compact
    * per-channel map, the open journey's finalized (below-watermark)
    * prefix lives in the compact [[OpenJourney]] summary, and only
    * events still inside the watermark window (arrival-order not yet
    * final) buffer in the tail — state is O(channels + watermark-window
    * events), bounded even for a user who touches forever without a
    * quiet period or a purchase. */
  case class AttrState(
      acc: Map[String, AttrAcc], open: Option[OpenJourney],
      tail: Seq[AttrEvent], lastEventUs: Long)

  /** Multi-touch attribution as a stream (batch C124 made incremental):
    * per-user events accumulate in state; when the watermark passes the
    * user's last event + gap (the same seal rule as [[assemble]]) the
    * user's journeys replay and the credits emit — one row per channel:
    * (channel, first_touch, last_touch, linear_ppm, touches). Credits
    * are exact integers (linear = 1e6 div k per touch), so any
    * downstream per-channel sum is batch-partitioning-independent; the
    * oracle is the batch attribution SQL restricted to sealed users. */
  def attributionCredits(
      spans: Dataset[Span],
      gapSeconds: Long): Dataset[(String, Long, Long, Long, Long)] = {
    val s = spans.sparkSession
    import s.implicits._
    val gapMs = gapSeconds * 1000L
    val withTime = spans
      .select(struct(spans.columns.map(col).toIndexedSeq: _*).as("_1"),
        timestamp_micros(col("startUs")).as("_2"))
      .withWatermark("_2", s"$gapSeconds seconds")
      .as[(Span, java.sql.Timestamp)]
    withTime
      .groupByKey(_._1.traceId)
      .flatMapGroupsWithState[AttrState, (String, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, incoming: Iterator[(Span, java.sql.Timestamp)], state: GroupState[AttrState]) =>
          if (state.hasTimedOut) {
            // all buffered events are under the watermark at timeout —
            // fold everything (trailing open touches stay uncredited,
            // the batch C124 closed-journeys-only rule)
            val st = state.get
            val (acc, _, _) =
              foldJourneys(st.acc, st.open, st.tail, Long.MaxValue)
            state.remove()
            acc.toSeq.sortBy(_._1).iterator
              .map { case (ch, a) => (ch, a.first, a.last, a.linear, a.touches) }
          } else {
            val fresh = incoming
              .map(t => AttrEvent(t._1.service, t._1.startUs, t._1.spanId.toLong))
              // non-touch, non-purchase services never influence credits
              // — drop them before they ever reach state
              .filter(e => touchServices(e.service) || e.service == "purchase")
              .toSeq
            val prev = state.getOption
              .getOrElse(AttrState(Map.empty, None, Seq.empty, 0L))
            // events STRICTLY below the watermark are final in sort
            // position (a late row may still carry the watermark
            // timestamp itself, and with a smaller spanId it would sort
            // before a same-timestamp purchase) — fold the final prefix
            // into the compact accumulators now and keep only the
            // still-mutable window tail in state
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (acc, open, tail) =
              foldJourneys(prev.acc, prev.open, prev.tail ++ fresh, wmUs)
            val lastUs = (prev.lastEventUs +: fresh.map(_.startUs)).max
            state.update(AttrState(acc, open, tail, lastUs))
            state.setTimeoutTimestamp(
              math.max(lastUs / 1000L + gapMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  private val touchServices = Set("view", "click", "signup")

  /** Replay journeys over the (re-sorted) unfolded events (the exact
    * batch C124 rule: touches between consecutive purchases, only
    * closed journeys credited), folding everything STRICTLY below
    * `sealedUs`: closed journeys into the per-channel credit
    * accumulator, open-journey touches into the compact
    * [[OpenJourney]] summary. Because events sort by (startUs, spanId)
    * and every future arrival carries startUs >= sealedUs, the
    * below-seal prefix of the sorted sequence is final — so the fold
    * may consume it and return only the at-or-above-seal suffix as the
    * tail, and re-walking that tail on the next fold equals the full
    * replay under any within-watermark arrival order. */
  private[graft] def foldJourneys(
      acc0: Map[String, AttrAcc], open0: Option[OpenJourney],
      evs: Seq[AttrEvent], sealedUs: Long)
    : (Map[String, AttrAcc], Option[OpenJourney], Seq[AttrEvent]) = {
    var acc = acc0
    def add(ch: String)(f: AttrAcc => AttrAcc): Unit =
      acc = acc.updated(ch, f(acc.getOrElse(ch, AttrAcc(0L, 0L, 0L, 0L))))
    val (below, tail) =
      evs.sortBy(x => (x.startUs, x.spanId)).span(_.startUs < sealedUs)
    var open = open0
    for (e <- below) {
      if (e.service == "purchase") {
        open.foreach { oj =>
          add(oj.first)(a => a.copy(first = a.first + 1))
          add(oj.last)(a => a.copy(last = a.last + 1))
          val share = 1000000L / oj.size
          oj.counts.foreach { case (ch, n) =>
            add(ch)(a => a.copy(
              linear = a.linear + share * n, touches = a.touches + n))
          }
        }
        open = None
      } else if (touchServices(e.service)) {
        val oj = open.getOrElse(OpenJourney(e.service, e.service, Map.empty, 0L))
        open = Some(OpenJourney(oj.first, e.service,
          oj.counts.updated(e.service, oj.counts.getOrElse(e.service, 0L) + 1L),
          oj.size + 1))
      }
    }
    (acc, open, tail)
  }

  /** Sealed buffers → flat processed spans, applying the reference read
    * pipeline at ingest time (a capability the reference defers to the
    * reader; doing it once at indexing amortizes it at 100 TB scale). */
  def processedSpans(buffers: Dataset[SpanBuffer]): Dataset[Span] = {
    val s = buffers.sparkSession
    import s.implicits._
    buffers.flatMap(b => graft.trace.TraceTransforms.defaultPipeline(b.spans))
  }
}
