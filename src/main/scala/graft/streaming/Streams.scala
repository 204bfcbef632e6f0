package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.model.Doc
import graft.ops.TextOps

/** Structured Streaming surface of the engine.
  *
  * The reference's only streaming construct is the micro-batched async
  * CSV sink: a channel of capacity 128 flushed every 2 seconds
  * (CsvRecordService, apna/main.go:110-146, ST1 at :142-143). Its
  * Spark-native analogue is a `writeStream` with
  * `Trigger.ProcessingTime("2 seconds")` — plus the watermarked
  * event-time aggregations and custom keyed state the reference lacks
  * but a production ingest pipeline needs.
  *
  * All sources are file streams (parquet), matching the engine's
  * snapshot layout: a crawl round's committed `docs` directory can be
  * tailed as a stream by downstream consumers.
  */
object Streams {

  import org.apache.spark.sql.Encoders

  val docSchema: StructType = Encoders.product[Doc].schema

  /** Tail a docs directory as a stream, enrich each doc with text
    * metrics, and micro-batch it to parquet every 2 seconds — the K1
    * sink re-expressed (channel cap -> maxFilesPerTrigger backpressure,
    * 2 s timer -> ProcessingTime trigger).
    */
  def docsToParquet(spark: SparkSession, srcDir: String, outDir: String,
                    checkpointDir: String,
                    trigger: Trigger = Trigger.ProcessingTime("2 seconds")): StreamingQuery = {
    val docs = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 128) // channel-capacity analogue
      .parquet(srcDir)
    val enriched = docs
      .withColumn("full_text",
        array_join(transform(filter(col("spans"), s => s.getField("kind") === "text"),
                             s => s.getField("text")), "\n"))
      .withColumn("n_tokens", TextOps.token_count(col("full_text")))
      .withColumn("n_media",
        size(filter(col("spans"), s => s.getField("kind").isin("image", "video"))))
      .drop("full_text")
    enriched.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .start()
  }

  /** Watermarked event-time windowed counts over an events stream
    * (engine capability beyond the reference: late data handled by the
    * watermark instead of being silently appended).
    */
  def windowedEventCounts(events: DataFrame,
                          windowLen: String = "5 minutes",
                          slide: String = "5 minutes",
                          watermark: String = "10 minutes"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
              col("n"), col("total_value"))

  final case class FetchEvent(host: String, ts: java.sql.Timestamp, status: Int)
  final case class HostSession(host: String, n_fetches: Long, n_ok: Long,
                               first_ts: java.sql.Timestamp,
                               last_ts: java.sql.Timestamp)

  /** Event-time session windows per host via flatMapGroupsWithState: a
    * host's fetch burst closes after `gapSeconds` of event-time silence,
    * emitting one session row — the streaming form of per-host crawl
    * activity reporting. Append-mode, exactly-once per checkpoint.
    *
    * Sessionization: each batch's events (plus the open intervals held
    * in state) merge into an interval chain — neighbors within the gap
    * coalesce — and an interval is emitted ONLY once the watermark has
    * passed its close point (`last_ts + gap`), so an on-time out-of-order
    * event arriving in a later batch can still merge into or bridge open
    * intervals; nothing closes prematurely. State is the list of not-yet
    * -sealable intervals (bounded: intervals are > gap apart within the
    * watermark horizon). Known limit of aggregate state (counts +
    * bounds, not events): a merged span can never be split retroactively.
    */
  def hostSessions(spark: SparkSession, events: Dataset[FetchEvent],
                   gapSeconds: Int): Dataset[HostSession] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (host: String, it: Iterator[FetchEvent],
         state: GroupState[Seq[HostSession]]) =>
          def single(e: FetchEvent) =
            HostSession(host, 1L, if (e.status == 200) 1L else 0L, e.ts, e.ts)
          def merge(a: HostSession, b: HostSession) =
            HostSession(host, a.n_fetches + b.n_fetches, a.n_ok + b.n_ok,
                        if (a.first_ts.before(b.first_ts)) a.first_ts else b.first_ts,
                        if (a.last_ts.after(b.last_ts)) a.last_ts else b.last_ts)
          val prior = state.getOption.getOrElse(Nil).toVector
          val intervals = (prior ++ it.map(single))
            .sortBy(s => (s.first_ts.getTime, s.last_ts.getTime))
          val chain = intervals.foldLeft(Vector.empty[HostSession]) { (acc, s) =>
            acc.lastOption match {
              case Some(p) if s.first_ts.getTime - p.last_ts.getTime <= gapMs =>
                acc.init :+ merge(p, s)
              case _ => acc :+ s
            }
          }
          val wm = state.getCurrentWatermarkMs()
          // STRICT <: the watermark admits events at ts == wm, and an
          // event there still merges into a session whose
          // last_ts + gap == wm (the merge rule is <= gap). Sealing at
          // equality would emit two HostSession rows for one logical
          // session depending on batch arrival timing — the sequential
          // (schedule-free) semantics the replay oracle pins never
          // split there.
          val (closed, open) = chain.partition(_.last_ts.getTime + gapMs < wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            // wake at the EARLIEST open close point; > wm by construction
            state.setTimeoutTimestamp(open.map(_.last_ts.getTime).min + gapMs)
          }
          closed.iterator
      }
  }

  /** Streaming exact dedup of an ingest stream: the FIRST row per
    * normalized content key passes; any duplicate arriving within the
    * watermark horizon of that first occurrence is dropped. The
    * online form of [[graft.ops.Dedup.dropExactDups]] — a crawl's docs
    * stream dedups as it lands instead of in a batch pass.
    *
    * Spark-first: built-in `dropDuplicatesWithinWatermark` keys the
    * dedup state and expires it at the watermark, so state is bounded
    * by the horizon (an unbounded-state `dropDuplicates` would grow by
    * one entry per distinct key forever — the wrong shape at 10^10
    * docs). The horizon is the contract: a duplicate arriving later
    * than `watermark` after its original is treated as new — exact
    * global dedup stays the batch operator's job (or the crawl's
    * tiered seen set, which this deliberately mirrors: approx-fast
    * tier online, exact reconciliation offline).
    */
  def dedupStream(rows: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "10 minutes"): DataFrame =
    rows
      .withColumn("content_key", TextOps.content_key(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_key")
      // internal key must not leak into the caller's schema (state
      // keying is unaffected by the post-dedup projection)
      .drop("content_key")

  /** Streaming ingest driving incremental near-dup maintenance: each
    * micro-batch of (id, text) docs is checked against the persisted
    * LSH index via [[graft.ops.IncrementalLsh.roundPairs]] inside
    * `foreachBatch`, verified pairs land in `outDir` tagged with the
    * emitting micro-batch, and the index gains the batch's postings —
    * the online form of the round-based maintenance the crawl runs
    * offline.
    *
    * Exactness rides IncrementalLsh's contract: the union of all
    * micro-batches' outputs equals the batch
    * [[graft.ops.Dedup.minhashNearDups]] over the final corpus (caps
    * disengaged), each pair emitted exactly once, in its later
    * member's batch. foreachBatch is AT-LEAST-ONCE (a crash between
    * the batch body and the checkpoint commit replays the batch), so
    * BOTH effects are made idempotent per batch id: the index slot is
    * pinned to the batch id (`roundPairs(slot = batchId)` — a replay
    * re-reads exactly rounds 0..k-1 and OVERWRITES slot k, never
    * appends a duplicate beside its own earlier attempt), and pairs
    * land in `outDir/r<batchId>` with overwrite semantics (a replay
    * rewrites the same directory, never double-appends). Read results
    * back with `spark.read.parquet(s"$outDir/r*")`.
    *
    * Scale: per micro-batch cost is O(batch + touched buckets), the
    * property that makes near-dup maintenance viable as a continuous
    * service rather than a periodic full-corpus job.
    */
  def incrementalNearDupSink(spark: SparkSession, src: DataFrame,
                             indexDir: String, outDir: String,
                             checkpointDir: String,
                             idCol: String = "id", textCol: String = "text",
                             shingleN: Int = 3, numHashes: Int = 32,
                             rowsPerBand: Int = 4, threshold: Double = 0.8,
                             maxBucket: Int = 1024,
                             trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    src.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.ops.IncrementalLsh
          .roundPairs(spark, indexDir, batch.toDF(), idCol, textCol,
                      shingleN, numHashes, rowsPerBand, threshold, maxBucket,
                      // toIntExact: an out-of-range batch id must fail loud,
                      // never wrap into a colliding slot number
                      slot = Some(Math.toIntExact(batchId)))
          .withColumn("emit_round", lit(batchId).cast("int"))
          .write.mode("overwrite").parquet(s"$outDir/r$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Vector-side analogue of [[incrementalNearDupSink]]: each
    * micro-batch of (id, vec) embeddings probes the persisted
    * hyperplane band index via
    * [[graft.ops.IncrementalAnn.roundPairs]], with the same
    * exactness (union == batch cosineNearDups) and replay-idempotency
    * contracts as [[incrementalNearDupSink]]: index slot pinned to the
    * batch id, per-batch output directory overwritten on replay. Read
    * results back with `spark.read.parquet(s"$outDir/r*")`.
    */
  def incrementalAnnSink(spark: SparkSession, src: DataFrame,
                         indexDir: String, outDir: String,
                         checkpointDir: String, idCol: String,
                         vecCol: String, threshold: Double,
                         trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    src.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.ops.IncrementalAnn
          .roundPairs(spark, indexDir, batch.toDF(), idCol, vecCol, threshold,
                      slot = Some(Math.toIntExact(batchId)))
          .withColumn("emit_round", lit(batchId).cast("int"))
          .write.mode("overwrite").parquet(s"$outDir/r$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Streaming maintenance of the deterministic log-bucket quantile
    * sketch ([[graft.ops.QuantileSketch]]): each micro-batch's
    * (group, value) rows fold into a per-batch partial sketch written
    * to slot `r<batchId>` (overwrite — an at-least-once replay
    * rewrites its own slot, never double-counts), and the live sketch
    * is the count-sum over all slots ([[readQuantileSketch]]).
    * Because sketch merge is ADDITION, the stream-final sketch equals
    * the one batch sketch over the union of all batches EXACTLY — so
    * the online quantiles carry q102's bit-exact oracle (q103).
    *
    * Scale: per micro-batch cost is one map-side bucket projection +
    * a groups × buckets aggregate of the batch alone; the read-side
    * merge touches only sketch rows, never raw values.
    */
  def quantileSketchSink(spark: SparkSession, src: DataFrame,
                         sketchDir: String, checkpointDir: String,
                         groupCol: String, valueCol: String,
                         subBits: Int = 4,
                         trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    src.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // toIntExact: an out-of-range batch id must fail loud, never
        // wrap into a colliding slot number
        val slot = Math.toIntExact(batchId)
        graft.ops.QuantileSketch
          .histSketch(batch.toDF(), groupCol, valueCol, subBits)
          .write.mode("overwrite").parquet(s"$sketchDir/r$slot")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The live merged sketch over every committed slot of
    * [[quantileSketchSink]] — feed to
    * [[graft.ops.QuantileSketch.histQuantiles]]. Explicit schema from
    * the caller (group type is theirs): a slot whose batch held zero
    * in-domain rows must read as the valid empty round it is, not
    * fail schema inference.
    */
  def readQuantileSketch(spark: SparkSession, sketchDir: String,
                         groupCol: String,
                         groupType: org.apache.spark.sql.types.DataType)
      : DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField(groupCol, groupType), StructField("bucket", LongType),
      StructField("cnt", LongType)))
    val slots = graft.ops.RoundSlots.roundIdxs(sketchDir).toSeq.sorted
    if (slots.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema)
      .parquet(slots.map(k => s"$sketchDir/r$k"): _*)
      .groupBy(groupCol, "bucket")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
  }

  final case class HostProgress(host: String, pages: Long, spans: Long,
                                last_round: Int)

  /** Custom keyed state: per-host crawl progress maintained with
    * mapGroupsWithState — the stateful-stream analogue of the
    * reference's global page counters (e.g. totalPage,
    * apna/main.go:166-169), kept exactly-once per checkpoint.
    */
  def hostProgress(docs: Dataset[Doc]): Dataset[HostProgress] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.host)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (host: String, it: Iterator[Doc], state: GroupState[HostProgress]) =>
          val prev = state.getOption.getOrElse(HostProgress(host, 0L, 0L, 0))
          var pages = prev.pages
          var spans = prev.spans
          var lastRound = prev.last_round
          it.foreach { d =>
            pages += 1
            spans += d.spans.size
            lastRound = math.max(lastRound, d.round)
          }
          val next = HostProgress(host, pages, spans, lastRound)
          state.update(next)
          next
      }
  }
}
