package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.ops.{Features, FeatureStore}

/** Structured Streaming jobs (SURVEY §2.11 T1–T11) — the reference's Kafka
  * consumer loop (`src/streaming/kafka_consumer.py`) re-expressed as
  * declarative streaming queries with watermarks and checkpoints.
  *
  * Design decisions vs the reference (documented divergences, SURVEY §7.4):
  *  - T9: the reference has NO late-data story (arrival order, offset=latest);
  *    we adopt `withWatermark(ts, 10 minutes)` as the default policy.
  *  - T6: the reference pushes per-event 1-row "feature frames" into a mock
  *    store and never aggregates them; the true semantics is the windowed
  *    aggregation (T3/T4), which is what the streaming query computes.
  *  - exactly-once: checkpointed sinks replace the consumer group's
  *    auto-commit (`kafka_consumer.py:58-59`).
  */
object StreamingJobs {

  /** Event-stream schema (ref `kafka_consumer.py:197-228`; matches the
    * driver testdata events table). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** T1/S5: Kafka source → JSON-decoded event frame. Requires the
    * spark-sql-kafka connector on the cluster classpath (not shipped in this
    * test environment — exercised via [[fileEvents]] locally; the plan shape
    * downstream is identical). */
  def kafkaEvents(spark: SparkSession, bootstrapServers: String,
                  topics: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics)
      .option("startingOffsets", "latest")
      .load()
      .select(from_json(col("value").cast("string"), eventSchema).as("e"))
      .select("e.*")

  /** File-based event stream (tests + replay): same schema, same downstream
    * plan as the Kafka source. */
  def fileEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(path)

  /** A12: observable stream counters (messages processed / clicks / errors —
    * ref `kafka_consumer.py:33-36,101-107`) surfaced per micro-batch via
    * `df.observe`, readable from a `StreamingQueryListener`. */
  def withCounters(events: DataFrame): DataFrame =
    events.observe("graft_stream",
      count(lit(1)).as("messages_processed"),
      sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
      sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"))

  /** T2: event-type dispatch — one filtered branch per handled type
    * (ref `kafka_consumer.py:38-46,80-107`). */
  def dispatch(events: DataFrame, types: Seq[String]): Map[String, DataFrame] =
    types.map(t => t -> events.filter(col("event_type") === t)).toMap

  /** T3/T4 (+T11 counters): watermarked tumbling-window activity features
    * per key — clicks, views, events, value sum, CTR
    * (ref `feature_engineering.py:176-228`; views
    * `feature_definitions.py:213-252`). Identical aggregate expressions to
    * the batch form (`Features.windowedActivity`) so batch/stream parity is
    * testable row-for-row. */
  def windowedFeatures(events: DataFrame, keyCol: String,
                       windowLen: String = "5 minutes",
                       watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col(keyCol))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
        count(lit(1)).as("events"),
        sum(col("value")).as("sum_value"),
        avg(col("value")).as("avg_value"))
      .withColumn("ctr", Features.safeDiv(col("clicks"), col("views")))
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** T3 exact-trailing semantics in streaming: arbitrary stateful
    * processing via `flatMapGroupsWithState` keeping a bounded per-key
    * event buffer — each event emits counts over that key's events in
    * `[ts − windowSeconds, ts]`, matching the batch RANGE-frame form
    * (`Features.trailingActivity`) for in-order data. Buffer is pruned to
    * the window width on every batch, so state is O(events-per-window).
    * Events arriving across batches out of order see the buffer as-of
    * arrival (the reference processes in arrival order too — T9).
    *
    * `idleStateTimeout`: opt-in processing-time TTL for idle keys — a key
    * silent that long has its buffer dropped (the buffer only describes a
    * window in the past, so expiry is lossless for future events). Set it
    * on unbounded key spaces, where NoTimeout state grows O(distinct keys
    * ever seen). Opt-in rather than default because once processing-time
    * timers exist the engine schedules timer-check batches FOREVER — the
    * query never self-terminates (`Trigger.AvailableNow` included) and
    * `processAllAvailable` never latches; that trade belongs to long-lived
    * production queries, not batch drains. */
  def trailingActivityStream(events: DataFrame, windowSeconds: Long,
                             idleStateTimeout: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
      col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("ts_s"), col("event_type"))
      .as[(Long, Long, Long, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, String)], (Long, Long, Long, Long, Long)](
        OutputMode.Append,
        if (idleStateTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, String)],
         state: GroupState[List[(Long, String)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var buf = state.getOption.getOrElse(Nil)
            val incoming = it.toList.sortBy(e => (e._3, e._2))
            val out = incoming.map { case (_, id, ts, tp) =>
              buf = (ts, tp) :: buf
              val win = buf.filter(e => e._1 >= ts - windowSeconds && e._1 <= ts)
              (user, id,
                win.count(_._2 == "click").toLong,
                win.count(_._2 == "view").toLong,
                win.size.toLong)
            }
            val maxTs = incoming.lastOption.map(_._3).getOrElse(Long.MinValue)
            state.update(buf.filter(_._1 >= maxTs - windowSeconds))
            idleStateTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
      .toDF("user_id", "event_id", "clicks_5min", "views_5min", "events_5min")
  }

  /** T6/S6/T10 (small-store fallback): per-batch upsert that rewrites the
    * WHOLE store from current + incoming — O(store size) per micro-batch,
    * fine for request-scoped or demo-sized stores only. The scale path is
    * [[upsertOnlineStorePartitioned]], which rewrites only the hash
    * buckets a batch touches. Checkpointing makes the upsert
    * effectively-once. */
  def upsertOnlineStore(features: DataFrame, keyCols: Seq[String],
                        tsCol: String, tiebreakCol: String, storePath: String,
                        checkpointPath: String): StreamingQuery =
    features.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // Only a genuinely absent store falls back to empty; any other read
        // failure (FS hiccup, corrupt footer) propagates and fails the
        // micro-batch — a catch-all here would silently overwrite the store
        // with just the incoming batch, destroying prior keys.
        val existing =
          if (pathExists(spark, storePath)) spark.read.parquet(storePath)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
        val merged = FeatureStore.latestPerKey(
          existing.unionByName(batch, allowMissingColumns = true),
          keyCols, tsCol, tiebreakCol)
        merged.write.mode("overwrite").parquet(storePath + ".tmp")
        spark.read.parquet(storePath + ".tmp")
          .write.mode("overwrite").parquet(storePath)
      }
      .start()

  /** T6 at 100 TB: hash-bucket-partitioned online-store upsert. The store
    * is a parquet table partitioned by
    * `__bucket = pmod(xxhash64(key...), numBuckets)`; each micro-batch
    * merges latest-per-key ONLY for the buckets its keys touch and
    * dynamically overwrites just those partition directories. Per-batch
    * work is O(size of touched buckets), not O(store): a batch touching k
    * distinct keys reads and rewrites at most min(k, numBuckets) of the
    * numBuckets partitions. Size numBuckets so one bucket ≈ a few HDFS
    * blocks (store_size / numBuckets ~ 128–512 MB). The untouched-bucket
    * files are never opened — asserted byte-for-byte in StreamingSpec.
    * (Production alternative with file-level ACID merge: Delta/Iceberg
    * MERGE INTO; this is the dependency-free parquet equivalent of the
    * same pruned-rewrite plan.) */
  def upsertOnlineStorePartitioned(features: DataFrame, keyCols: Seq[String],
                                   tsCol: String, tiebreakCol: String,
                                   storePath: String, checkpointPath: String,
                                   numBuckets: Int = 64): StreamingQuery =
    features.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBucketedBatch(batch, keyCols, tsCol, tiebreakCol, storePath,
          numBuckets)
      }
      .start()

  /** The per-micro-batch bucketed merge (exposed for batch upsert jobs and
    * tests). The `touched` collect is bounded by numBuckets — a driver-side
    * action on purpose, it IS the partition-pruning decision. */
  def upsertBucketedBatch(batch: DataFrame, keyCols: Seq[String],
                          tsCol: String, tiebreakCol: String,
                          storePath: String, numBuckets: Int): Unit = {
    val spark = batch.sparkSession
    val incoming = batch.withColumn("__bucket",
      pmod(xxhash64(keyCols.map(col): _*), lit(numBuckets)).cast("int"))
    val touched = incoming.select(col("__bucket")).distinct()
      .collect().map(_.getInt(0))
    // Explicit existence check, NOT a catch-all: a transient read failure on
    // an existing store must fail the micro-batch (checkpoint retries it),
    // never silently rewrite touched buckets from the batch alone.
    val existing =
      if (pathExists(spark, storePath))
        spark.read.parquet(storePath)
          .filter(col("__bucket").isin(touched.map(Integer.valueOf): _*))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        incoming.schema)
    val merged = FeatureStore.latestPerKey(
      existing.unionByName(incoming, allowMissingColumns = true),
      keyCols, tsCol, tiebreakCol)
    stageAndSwapBuckets(spark, merged, storePath)
  }

  /** Stage the merged touched buckets, then dynamic-overwrite ONLY those
    * bucket partitions into the store (Spark rejects overwriting a path
    * the plan reads from); untouched bucket directories are neither read
    * nor rewritten. Both steps are O(touched buckets). Shared by every
    * bucketed foreachBatch merge ([[upsertBucketedBatch]],
    * [[incrementalDedupBatch]]) so the crash-window proof covers all of
    * them. */
  private def stageAndSwapBuckets(spark: SparkSession, merged: DataFrame,
                                  storePath: String): Unit = {
    val stage = storePath + ".stage"
    // repartition by __bucket so each touched bucket is written as ONE
    // file: without it, every writer task holding rows of a bucket opens
    // its own file, and since the merge shuffle's AQE-coalesced task
    // count grows with store size, file count crept toward
    // numBuckets x tasks (IncDedupLongRun measured 64 buckets -> 462
    // files and 13-row parquet files inflating the store ~2x at
    // numBuckets=1024). One extra exchange of the touched data — the
    // same magnitude the merge shuffle already paid — buys a store whose
    // file count is ≤ numBuckets FOREVER, with bucket-sized row groups.
    merged.repartition(col("__bucket"))
      .write.mode("overwrite").partitionBy("__bucket").parquet(stage)
    // Failure-injection point for the exactly-once proof (StreamingSpec):
    // "once" aborts the micro-batch AFTER the staging write but BEFORE the
    // store swap — the worst crash window (work done, store untouched,
    // checkpoint uncommitted). The streaming engine retries the batch from
    // the checkpoint; the retry re-merges from the UNMODIFIED store, so
    // recovery must equal the no-failure run.
    val abortKey = "spark.graft.upsert.abortAfterStage"
    if (spark.conf.getOption(abortKey).contains("once")) {
      spark.conf.set(abortKey, "done")
      throw new IllegalStateException("injected post-stage abort (test)")
    }
    spark.read.parquet(stage)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket")
      .parquet(storePath)
  }

  /** Streaming incremental exact dedup — the ingest-time form of
    * `Dedup.exactDedup`: documents arrive in micro-batches and the store
    * accumulates the FIRST-seen row per normalized-content key, so a doc
    * that duplicates anything already ingested (or an earlier row of its
    * own batch) never enters the corpus. The store IS the deduped corpus:
    * hash-bucketed parquet keyed on the md5 content key, merged per batch
    * with the same touched-buckets-only staged swap as the feature-store
    * upsert — per-batch work is O(batch + touched buckets), never a
    * corpus rescan, and the crash-recovery/replay-idempotence proofs
    * carry over ([[stageAndSwapBuckets]]). First-writer-wins keeps the
    * merge idempotent under at-least-once delivery: replaying a batch
    * re-derives the same (seen-batch, id) minimum.
    *
    * Complements the watermark-horizon `dedupStream` form: that one holds
    * O(rate × watermark) in-memory state and forgets old content; this
    * one is FULL-HISTORY — dedup identity lives in the partitioned store,
    * not executor state, so the horizon is unbounded and restart-safe.
    * Same content key as batch `Dedup.exactDupGroups`, so the three forms
    * (batch, horizon-stream, incremental-store) agree on identity. */
  def incrementalDedupStream(docs: DataFrame, idCol: String,
                             textCol: String, storePath: String,
                             checkpointPath: String,
                             numBuckets: Int = 64): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        incrementalDedupBatch(batch, idCol, textCol, storePath, batchId,
          numBuckets)
      }
      .start()

  /** The per-micro-batch first-wins merge (exposed for batch backfills and
    * tests). The `touched` collect is bounded by numBuckets — it IS the
    * partition-pruning decision, same contract as [[upsertBucketedBatch]]. */
  def incrementalDedupBatch(batch: DataFrame, idCol: String, textCol: String,
                            storePath: String, batchId: Long,
                            numBuckets: Int): Unit = {
    val spark = batch.sparkSession
    val incoming = batch
      .withColumn("__key", md5(graft.ops.Dedup.normalizeText(col(textCol))))
      .withColumn("__seen_batch", lit(batchId))
      .withColumn("__bucket",
        pmod(xxhash64(col("__key")), lit(numBuckets)).cast("int"))
    val touched = incoming.select(col("__bucket")).distinct()
      .collect().map(_.getInt(0))
    val existing =
      if (pathExists(spark, storePath))
        spark.read.parquet(storePath)
          .filter(col("__bucket").isin(touched.map(Integer.valueOf): _*))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        incoming.schema)
    // First writer wins: min (seen_batch, id) per content key. A replayed
    // batch carries its ORIGINAL batchId from the checkpoint, so the
    // minimum — and the store — is unchanged on retry.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__key"))
      .orderBy(col("__seen_batch").asc, col(idCol).asc)
    val merged = existing.unionByName(incoming, allowMissingColumns = true)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    stageAndSwapBuckets(spark, merged, storePath)
  }

  /** The deduped corpus accumulated by [[incrementalDedupStream]], with
    * the merge's bookkeeping columns dropped. */
  def dedupedCorpus(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(storePath)
      .drop("__key", "__seen_batch", "__bucket")

  /** Passage-granularity incremental dedup — [[incrementalDedupBatch]]'s
    * first-writer-wins merge keyed on PASSAGE content (the Lee-et-al
    * substring signal the doc-level store can't see): each micro-batch's
    * documents are segmented into non-overlapping `size`-token passages
    * ([[graft.ops.TextAnalysis.segmentPassages]] — the d_passage_dedup
    * segmenter) and a passage loses to any content-equal passage first
    * observed at a smaller (batch, id, passage_idx). The store
    * accumulates exactly the WINNING passages, which IS the rewritten
    * corpus: a document's clean text is its winning passages in order
    * ([[passageCleanCorpus]]). Same bucketed store, same staged-swap
    * crash machinery, same O(batch + touched buckets) per-batch cost and
    * replay idempotence (a replayed batch re-offers rows with its
    * original batchId, so every min is unchanged). */
  def incrementalPassageDedupBatch(batch: DataFrame, idCol: String,
                                   textCol: String, storePath: String,
                                   batchId: Long, numBuckets: Int,
                                   size: Int = 16): Unit = {
    val spark = batch.sparkSession
    val incoming = graft.ops.TextAnalysis
      .segmentPassages(batch, idCol, textCol, size)
      .withColumn("__key", md5(col("__passage")))
      .withColumn("__seen_batch", lit(batchId))
      .withColumn("__bucket",
        pmod(xxhash64(col("__key")), lit(numBuckets)).cast("int"))
    val touched = incoming.select(col("__bucket")).distinct()
      .collect().map(_.getInt(0))
    val existing =
      if (pathExists(spark, storePath))
        spark.read.parquet(storePath)
          .filter(col("__bucket").isin(touched.map(Integer.valueOf): _*))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        incoming.schema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__key"))
      .orderBy(col("__seen_batch").asc, col(idCol).asc,
        col("passage_idx").asc)
    val merged = existing.unionByName(incoming, allowMissingColumns = true)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    stageAndSwapBuckets(spark, merged, storePath)
  }

  /** Streaming form of [[incrementalPassageDedupBatch]] — the same
    * foreachBatch shape as [[incrementalDedupStream]]: the checkpoint
    * pins batchIds, so a post-crash replay re-offers rows with their
    * ORIGINAL batchId and every first-writer minimum is unchanged
    * (crash/replay proofs in StreamingSpec mirror the doc-level
    * store's). */
  def incrementalPassageDedupStream(docs: DataFrame, idCol: String,
                                    textCol: String, storePath: String,
                                    checkpointPath: String,
                                    numBuckets: Int = 64,
                                    size: Int = 16): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        incrementalPassageDedupBatch(batch, idCol, textCol, storePath,
          batchId, numBuckets, size)
      }
      .start()

  /** The rewritten corpus a [[incrementalPassageDedupBatch]] store holds:
    * per document with at least one winning passage — (idCol, n_kept,
    * clean_text), passages reassembled in passage order. Documents whose
    * every passage lost (fully-duplicated content) have no store rows
    * and so no output row — the caller decides their fate, as in
    * [[graft.ops.TextAnalysis.dedupPassages]]. */
  def passageCleanCorpus(spark: SparkSession, storePath: String,
                         idCol: String): DataFrame =
    spark.read.parquet(storePath)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
          struct(col("passage_idx"), col("__passage")))),
          p => p("__passage")), " ").as("clean_text"))

  /** Does `path` exist on its filesystem? (Hadoop FS — works for any
    * scheme the session is configured for, not just local files.) */
  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** T7/R7: streaming embedding-index append — item_update events append to
    * the embedding table; ANN structures rebuild periodically downstream
    * (the reference also rebuilds — `retrieval.py:228-246`). */
  def appendEmbeddings(updates: DataFrame, tablePath: String,
                       checkpointPath: String): StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", tablePath)
      .start()

  /** R7∘R4 — streaming serving-index MAINTENANCE (r17 verdict #6): the
    * embedding append composed with the IVF path. Each arriving vector
    * is assigned to its nearest FROZEN centroid (the native
    * [[graft.ops.Similarity.assignClusters]] kernel — a pure projection,
    * so the streaming plan stays stateless: no shuffle, no state store)
    * and lands in a `centroid_id`-partitioned parquet store. The
    * partition layout enables file-listing pruning for readers that
    * filter centroid_id BELOW the catalog's dedup —
    * [[graft.ops.Similarity.servedTopKFromStore]] threads the probed
    * centroid set down to the scans and reads ONLY probed partitions;
    * a centroid_id equi-join placed ABOVE the assembled catalog
    * ([[ivfServingCatalog]]) is correct but scans every partition (the
    * dedup shuffle and the probe-side eval barrier block pushdown).
    *
    * FROZEN-CENTROIDS contract (the frozen-tokenizer pattern applied to
    * ANN): `centroids` must be the SAME table across every micro-batch
    * and restart — pass a localCheckpointed or parquet-backed frame,
    * never a plan that re-derives seeds from moving data. Assignment
    * consistency is what makes the store's partitions mean anything;
    * drift is handled by the PERIODIC RE-TRAIN ([[rebuildIvfStore]]),
    * not by mutating the serving quantizer mid-stream (the reference
    * also rebuilds — `retrieval.py:228-246`).
    *
    * Store layout is BASE + DELTA: the stream appends to `deltaPath`
    * (foreachBatch — the [[incrementalDedupStream]] shape, so the
    * CHECKPOINT owns source offsets and survives epoch transitions);
    * the serving catalog is [[ivfServingCatalog]] = base ∪ delta with
    * read-side id-dedup, which makes the at-least-once append and the
    * rebuild's crash window both idempotent to readers. StreamingSpec
    * pins stream-assignment ≡ batch assignClusters on the same frozen
    * table, incremental append, partition layout, and the rebuild
    * round-trip. */
  def ivfIndexedAppendStream(updates: DataFrame, centroids: DataFrame,
                             vecCol: String, deltaPath: String,
                             checkpointPath: String): StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ivfIndexedAppendBatch(batch, centroids, vecCol, deltaPath)
      }
      .start()

  /** One micro-batch of [[ivfIndexedAppendStream]] — also the unit the
    * registry row drives directly (the x25 same-code pattern): assign
    * against the frozen centroids (native kernel, pure projection) and
    * append `centroid_id`-partitioned parquet. Replays append twice on
    * retry; readers go through [[ivfServingCatalog]]'s id-dedup, so
    * at-least-once delivery is invisible downstream. Refuses LOUDLY
    * while [[rebuildIvfStore]]'s lock is present — the stream should be
    * stopped across a rebuild. The lock check is best-effort
    * (check-then-act: an appender that passes just before the rebuild
    * creates the lock still writes into the rebuild's window), but the
    * residual window CANNOT lose rows: the rebuild's delta clear is
    * snapshot-scoped (it deletes only files listed before its catalog
    * read), so a raced-in append survives the clear, serves via the
    * delta-wins dedup, and folds into base at the next rebuild. A lock
    * left by a CRASHED rebuild keeps appends failing until the rebuild
    * is re-run to completion (the recovery path, which clears it) —
    * loud unavailability over silent loss. */
  def ivfIndexedAppendBatch(batch: DataFrame, centroids: DataFrame,
                            vecCol: String, deltaPath: String): Unit = {
    require(!pathExists(batch.sparkSession, rebuildLockPath(deltaPath)),
      s"ivfIndexedAppendBatch: rebuild in progress (or a crashed rebuild " +
        s"left its lock) at ${rebuildLockPath(deltaPath)} — appends now " +
        "would land in a delta the rebuild deletes; stop the appender " +
        "across rebuilds, or re-run rebuildIvfStore to completion to " +
        "clear the lock")
    graft.ops.Similarity.assignClusters(batch, vecCol, centroids)
      .write.mode("append").partitionBy("centroid_id").parquet(deltaPath)
  }

  /** The serving catalog view over the base + delta IVF store: union of
    * whichever halves exist, one row per id — the DELTA row wins a
    * base/delta duplicate DETERMINISTICALLY (the delta holds the
    * fresher assignment: an id present in both halves is the rebuild
    * crash window or an at-least-once replay straddling a rebuild, and
    * serving the newer vector/assignment is strictly better than an
    * arbitrary `dropDuplicates` pick; duplicates WITHIN one half are
    * byte-identical replays, so their tie is value-irrelevant). This
    * makes at-least-once appends and the rebuild's crash windows
    * read-idempotent AND reproducible. The base half resolves base →
    * base.old (the rebuild's rename window: between the two atomic
    * renames the current base is briefly absent while the PREVIOUS
    * epoch's copy sits at base.old — readers fall back to it, seeing
    * the consistent pre-rebuild view).
    *
    * `probedCentroids`: optional centroid_id IN-filter applied to EACH
    * half BELOW the union/dedup — because the store is partitioned by
    * centroid_id, the filter lands in the scan's partitionFilters and
    * prunes at the FILE LISTING. This is the only way a reader gets
    * partition pruning out of the store: the catalog's dedup shuffles
    * (and downstream eval barriers block pushdown), so a centroid_id
    * predicate applied ABOVE the catalog never reaches the scan
    * ([[graft.ops.Similarity.servedTopKFromStore]] is the serving
    * composition that threads the probed set down here). Pruned reads
    * are EXACTLY equivalent to filtering the unpruned catalog to the
    * probed cells (ADVICE r18 closed the cell-straddle divergence): an
    * id whose fresh delta row lives in an UNPROBED cell but whose stale
    * base row's cell IS probed must not serve the base row — the
    * unpruned catalog's delta-wins dedup would have dropped it — so
    * when pruning is active and a delta exists, the base half is
    * anti-joined against the delta's id column read UNPRUNED
    * (column-pruned to idCol only; the delta is the small
    * between-rebuilds half, so this one narrow scan is the price of
    * keeping the base half — the big one — pruned at the file
    * listing). */
  def ivfServingCatalog(spark: SparkSession, basePath: String,
                        deltaPath: String, idCol: String,
                        probedCentroids: Option[Seq[Long]] = None)
      : DataFrame = {
    val base =
      if (pathExists(spark, basePath)) Some(basePath)
      else if (pathExists(spark, basePath + ".old")) Some(basePath + ".old")
      else None
    val prune: DataFrame => DataFrame = df => probedCentroids match {
      case Some(ids) => df.filter(col("centroid_id").isin(ids: _*))
      case None => df
    }
    val deltaExists = pathExists(spark, deltaPath)
    val halves =
      base.toSeq.map { bp =>
        val b = prune(spark.read.parquet(bp))
        // cell-straddle guard (see the probedCentroids scaladoc): under
        // pruning, a base row whose id has ANY delta row is dropped
        // here — the global delta-wins winner may live in an unprobed
        // cell, and serving the stale base row would diverge from the
        // unpruned catalog
        val bSafe =
          if (probedCentroids.isDefined && deltaExists)
            b.join(spark.read.parquet(deltaPath).select(col(idCol)),
              Seq(idCol), "left_anti")
          else b
        bSafe.withColumn("__epoch", lit(0))
      } ++
      Seq(deltaPath).filter(_ => deltaExists).map(dp =>
        prune(spark.read.parquet(dp)).withColumn("__epoch", lit(1)))
    require(halves.nonEmpty,
      s"ivfServingCatalog: neither $basePath(.old) nor $deltaPath exists")
    val w = Window.partitionBy(col(idCol)).orderBy(col("__epoch").desc)
    halves.reduce(_ unionByName _)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__epoch", "__rn")
  }

  /** The rebuild lock guarding the append/rebuild race: while present,
    * [[ivfIndexedAppendBatch]] refuses to append (LOUD fail) — an
    * append landing in the delta during [[rebuildIvfStore]]'s window
    * would be silently deleted by the end-of-rebuild delta clear, the
    * exact row-loss class the two-rename swap exists to prevent. */
  private[graft] def rebuildLockPath(deltaPath: String): String =
    deltaPath + ".rebuild.lock"

  /** The periodic re-train half of [[ivfIndexedAppendStream]]'s
    * contract — the batch MATERIALIZATION job, run with the append
    * stream STOPPED (AvailableNow drains are the natural cadence): read
    * base ∪ delta, train fresh centroids over the FULL catalog
    * (hash-picked seeds + `iters` Lloyd rounds), reassign every vector,
    * stage, swap into base ATOMICALLY, then clear the delta. Returns
    * the NEW frozen centroid table (localCheckpointed) for the next
    * stream epoch — the stream restarts with it and the SAME
    * checkpoint, so source offsets carry over and new updates land in
    * the now-empty delta.
    *
    * Crash posture — the swap is two FS RENAMES (each atomic on
    * HDFS/local), never an overwrite of the only live copy (a
    * mode("overwrite") base write deletes the old base BEFORE the new
    * job commits: a crash there would permanently lose every row that
    * lived only in base): (1) stage written beside base; (2) IFF a
    * complete base exists: stale base.old deleted, base renamed to
    * base.old; (3) stage renamed to base; (4) base.old and delta
    * deleted. The stale-.old delete is INSIDE the base-exists branch on
    * purpose: when base is absent (a prior swap crashed between ITS two
    * renames), base.old is the only live copy and must survive until
    * step (3) installs the fresh base — deleting it up front would
    * open a window (crash before step 3) with NO live copy at all, and
    * the next rebuild would silently retrain from delta alone. With
    * this ordering every crash point leaves at least one complete base
    * copy resolvable by [[ivfServingCatalog]]'s base → base.old
    * fallback, and re-running the rebuild from any crash point
    * converges (it re-reads whatever the fallback resolves and
    * re-stages; a leftover stage is overwritten, a leftover .old is
    * superseded once the fresh base lands).
    *
    * Concurrency: takes the [[rebuildLockPath]] lock for the whole run
    * (appenders fail loudly while it is held — see
    * [[ivfIndexedAppendBatch]]; an appender that races past the check
    * is retained by the snapshot-scoped delta clear, so the window is
    * loss-free); the lock is created only after the store-exists
    * validation and cleared on any non-crash failure — persistence is
    * reserved for process death, where a lock left by the CRASHED
    * rebuild is adopted on re-run, since re-running the rebuild IS the
    * recovery path. Rebuilds are contractually single-instance. Scale
    * shape: one
    * catalog scan for seeding/Lloyd (centroid state driver-bounded),
    * one scan + one partitioned write for the rewrite — the rebuild is
    * linear and runs offline while the OLD store serves. */
  def rebuildIvfStore(spark: SparkSession, basePath: String,
                      deltaPath: String, idCol: String, vecCol: String,
                      nlist: Int, iters: Int = 2,
                      seed: Long = 42): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val fs = p(basePath).getFileSystem(conf)
    // Validate BEFORE taking the lock (ADVICE r18): the bootstrap case
    // (neither base nor delta exists yet) must fail WITHOUT creating a
    // lock — a lock minted by this non-crash failure would block every
    // append, and the lock's recovery advice ("re-run the rebuild") can
    // never succeed on an empty store.
    require(pathExists(spark, basePath) ||
        pathExists(spark, basePath + ".old") ||
        pathExists(spark, deltaPath),
      s"rebuildIvfStore: nothing to rebuild — neither $basePath(.old) " +
        s"nor $deltaPath exists")
    val lock = p(rebuildLockPath(deltaPath))
    if (!fs.exists(lock)) fs.create(lock, false).close()
    try {
      // Snapshot the delta's file list BEFORE building the catalog view
      // (whose parquet file index is resolved at DataFrame creation, so
      // it sees a superset of this snapshot): the end-of-rebuild delta
      // clear deletes ONLY these files. An appender that raced past the
      // lock check and landed files after this point keeps them — they
      // are served via the catalog's delta-wins dedup and folded by the
      // NEXT rebuild, so the check-then-act window cannot lose rows
      // (ADVICE r18: the lock alone only narrowed the race).
      def listFilesRec(dir: org.apache.hadoop.fs.Path)
          : Seq[org.apache.hadoop.fs.Path] =
        if (!fs.exists(dir)) Seq.empty
        else fs.listStatus(dir).toSeq.flatMap { st =>
          if (st.isDirectory) listFilesRec(st.getPath)
          else Seq(st.getPath)
        }
      val deltaSnapshot = listFilesRec(p(deltaPath))
      val store = ivfServingCatalog(spark, basePath, deltaPath, idCol)
        .select(col(idCol), col(vecCol))
      val seeds = graft.ops.Similarity.pickCentroids(store, idCol, vecCol,
        nlist, seed)
      val cents = (if (iters > 0)
        graft.ops.Similarity.refineCentroids(store, vecCol, seeds, iters)
      else seeds).localCheckpoint(true)
      val stage = basePath + ".stage"
      graft.ops.Similarity.assignClusters(store, vecCol, cents)
        .repartition(col("centroid_id"))
        .write.mode("overwrite").partitionBy("centroid_id").parquet(stage)
      // atomic two-rename swap; the stale-.old delete happens ONLY while
      // a complete base still exists (see the crash-posture scaladoc)
      if (fs.exists(p(basePath))) {
        fs.delete(p(basePath + ".old"), true)
        require(fs.rename(p(basePath), p(basePath + ".old")),
          s"rebuildIvfStore: rename $basePath -> .old failed")
      }
      require(fs.rename(p(stage), p(basePath)),
        s"rebuildIvfStore: rename $stage -> $basePath failed")
      fs.delete(p(basePath + ".old"), true)
      // snapshot-scoped delta clear (see above), then a best-effort
      // sweep of now-empty partition dirs; a dir holding a raced-in
      // late file survives both
      deltaSnapshot.foreach(f => fs.delete(f, false))
      def sweepEmptyDirs(dir: org.apache.hadoop.fs.Path): Unit =
        if (fs.exists(dir)) {
          fs.listStatus(dir).foreach { st =>
            if (st.isDirectory) sweepEmptyDirs(st.getPath)
          }
          if (fs.listStatus(dir).isEmpty) { fs.delete(dir, false); () }
        }
      sweepEmptyDirs(p(deltaPath))
      fs.delete(lock, false)
      cents
    } catch {
      // Non-crash failure: clear the lock so appends are not permanently
      // blocked by a failure whose fix may not be "re-run the rebuild".
      // Lock persistence is reserved for actual process death, where the
      // finally-less crash window leaves it on disk and re-running the
      // rebuild IS the recovery path (ADVICE r18).
      case e: Throwable =>
        try { fs.delete(lock, false); () } catch { case _: Throwable => () }
        throw e
    }
  }

  /** T11 streaming form: gap-based sessionization with
    * `flatMapGroupsWithState` — per key, a session index increments when
    * the gap since the previous event exceeds `gapSeconds`. Matches the
    * batch lag+cumulative-sum form (`Features.sessionize`) row-for-row on
    * in-order data (asserted in StreamingSpec); state per key is two longs
    * (last ts, session counter) — O(keys), not O(events).
    *
    * `idleStateTimeout`: opt-in processing-time TTL — a key idle that long
    * has its (last ts, counter) state dropped, bounding state to ACTIVE
    * keys rather than every key ever seen. A key that reappears after
    * expiry re-sessionizes from index 1 (sessionization state is
    * reconstructible; pick the timeout ≥ the longest session gap you care
    * to bridge). Same never-self-terminating caveat as
    * [[trailingActivityStream]] — set it on long-lived queries over
    * unbounded key spaces, leave None for batch drains. */
  def sessionizeStream(events: DataFrame, gapSeconds: Long,
                       idleStateTimeout: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
      col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("ts_s"))
      .as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Append,
        if (idleStateTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (lastTs, sessionIdx) = state.getOption.getOrElse((Long.MinValue, 0L))
            val out = it.toList.sortBy(e => (e._3, e._2)).map { case (_, id, ts) =>
              if (lastTs == Long.MinValue || ts - lastTs > gapSeconds)
                sessionIdx += 1
              lastTs = ts
              (user, id, sessionIdx)
            }
            state.update((lastTs, sessionIdx))
            idleStateTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
      .toDF("user_id", "event_id", "session_idx")
  }

  /** T11 on the Spark 4 `transformWithState` API: same gap-based
    * sessionization as [[sessionizeStream]], with the idle-key bound
    * expressed as DECLARATIVE state TTL (`TTLConfig`) instead of a
    * hand-rolled timeout branch — the state store treats expired (last ts,
    * counter) values as absent by itself. TTL requires
    * `TimeMode.ProcessingTime`, which (like flatMapGroupsWithState
    * timers) makes the engine schedule batches forever — so the TTL is
    * opt-in here too: None → `TimeMode.None`, the query drains and
    * terminates normally. Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`). Semantics parity with the
    * batch form and TTL expiry are asserted in StreamingSpec. */
  def sessionizeStreamTws(events: DataFrame, gapSeconds: Long,
                          idleStateTtl: Option[java.time.Duration] = None)
      : DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events.select(
      col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("ts_s"))
      .as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .transformWithState(new SessionizeProcessor(gapSeconds, idleStateTtl),
        if (idleStateTtl.isDefined) TimeMode.ProcessingTime()
        else TimeMode.None(),
        OutputMode.Append())
      .toDF("user_id", "event_id", "session_idx")
  }

  /** The [[sessionizeStreamTws]] stateful processor: per key a single
    * (last ts, session counter) value with TTL — state logic identical to
    * the flatMapGroupsWithState form, minus the hand-rolled timeout
    * branch. */
  private class SessionizeProcessor(gapSeconds: Long,
                                    ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long), (Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}
    @transient private var st: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("sess",
        org.apache.spark.sql.Encoders.product[(Long, Long)],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    override def handleInputRows(
        user: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long)] = {
      var (lastTs, sessionIdx) =
        if (st.exists()) st.get() else (Long.MinValue, 0L)
      val out = rows.toList.sortBy(e => (e._3, e._2)).map { case (_, id, ts) =>
        if (lastTs == Long.MinValue || ts - lastTs > gapSeconds)
          sessionIdx += 1
        lastTs = ts
        (user, id, sessionIdx)
      }
      st.update((lastTs, sessionIdx))
      out.iterator
    }
  }

  /** Streaming exact dedup (SURVEY §2.13 L1, streaming form): keep the
    * FIRST-arriving document per normalized-content hash, dropping
    * later duplicates that arrive within the watermark horizon.
    * `dropDuplicatesWithinWatermark` bounds the dedup state to the
    * watermark window, so state is O(arrival rate × watermark), not
    * O(corpus) — the property that makes streaming ingest dedup viable at
    * 100 TB/day (a full-history dedup belongs in the batch layer, L1).
    * The content hash matches the batch `Dedup.exactDupGroups` key, so a
    * batch compaction pass downstream dedups across horizons with the
    * same identity. */
  /** Streaming corpus-ingest term counts over tumbling event-time windows
    * (the trending-terms monitor — the text tranche's streaming member).
    * Explode → windowed count; the watermark lets closed windows emit and
    * their state drop, so state is O(active-window vocab), not corpus
    * vocab. Batch parity with the identical static groupBy is asserted
    * in StreamingSpec. */
  def termCountStream(docs: DataFrame, textCol: String, tsCol: String,
                      windowSeconds: Long,
                      watermark: String = "10 minutes"): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .select(col(tsCol),
        explode(graft.ops.TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(window(col(tsCol), s"$windowSeconds seconds"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("term"), col("cnt"))

  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash",
        md5(graft.ops.Dedup.normalizeText(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream-stream interval join — click→view attribution: each click
    * pairs with the SAME user's views at most `horizonSeconds` before it
    * (the streaming form of the reference's request-time "recent views"
    * feature; the funnel query a12 is the batch analog). Both sides carry
    * event-time watermarks and the join condition time-bounds click_ts
    * against view_ts, which is exactly what Structured Streaming needs to
    * expire buffered rows from the join state: state is
    * O(rate × (watermark + horizon)) per side, never unbounded. Inner
    * join → attributed clicks only; the same composition with a left
    * join yields unattributed clicks after the horizon closes. */
  def attributionStream(views: DataFrame, clicks: DataFrame,
                        horizonSeconds: Long,
                        watermark: String = "10 minutes"): DataFrame = {
    val v = views.select(col("user_id").as("view_user"),
        col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val c = clicks.select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    c.join(v,
      col("user_id") === col("view_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") +
          expr(s"INTERVAL $horizonSeconds SECONDS"))
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** Hopping-window counts — the stream form of the batch `t4_hopping`
    * query: width/slide event-time windows, count + value sum per
    * (window, event type). `window(ts, width, slide)` assigns each event
    * its width/slide windows up front, so this is an ordinary streaming
    * aggregation: the watermark closes windows and bounds state to the
    * ones still open — O(open windows × event types), independent of
    * stream length. */
  def hoppingCountsStream(events: DataFrame, widthSeconds: Long,
                          slideSeconds: Long,
                          watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$widthSeconds seconds",
        s"$slideSeconds seconds"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** T8: TTL freshness filter on read of an online store (ref TTLs in
    * `feature_definitions.py`; cache expiry `retrieval.py:643-657`). */
  def freshOnly(store: DataFrame, tsCol: String, now: Column,
                ttlSeconds: Long): DataFrame =
    store.filter(col(tsCol) <= now &&
      col(tsCol) >= now - expr(s"INTERVAL $ttlSeconds SECONDS"))
}
