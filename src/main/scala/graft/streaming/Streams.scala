package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Per-user session accumulator carried across micro-batches by
  * `flatMapGroupsWithState` (custom-state surface, SURVEY.md §2.7).
  */
case class SessionState(lastTs: Long, sessions: Long, events: Long)

/** Per-group KMV sketch state carried across micro-batches: the k
  * smallest DISTINCT hashes seen so far, ascending — at most k longs
  * per group, the bounded-state property that makes the sketch
  * streamable where an exact distinct count would need unbounded
  * state. */
case class KmvState(mins: Seq[Long])

/** Structured Streaming equivalents for the reference's batch dataflow
  * (SURVEY.md §2.7): arriving dataset files become a file-source stream;
  * per-dataset builds are stateless maps; global merges run incrementally.
  * The reference itself has no streaming — this is the scale-path
  * extension: new CODEX datasets (or event/log shards) land continuously
  * and the product updates without recomputing the world.
  */
object Streams {

  /** Last executed micro-batch plan / last progress JSON per memory-sink
    * query name (see runToMemoryMode's capture) — in-query evidence for
    * stream-static join shapes and state-store backends. REMOVE-on-read:
    * names are nanoTime-unique, so an entry is read at most once and
    * anything left behind would accumulate for the JVM lifetime.
    */
  private val lastPlans =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val lastProgresses =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def lastPlan(name: String): Option[String] =
    Option(lastPlans.remove(name))
  def lastProgressJson(name: String): Option[String] =
    Option(lastProgresses.remove(name))

  /** File-arrival stream over a parquet directory. `maxFilesPerTrigger`
    * bounds per-batch work — the knob that keeps batch latency flat as the
    * directory grows to millions of files.
    */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
                 maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Watermarked tumbling-window counts over an event-time column — the
    * monitoring aggregation from SURVEY.md §2.7. State is bounded by the
    * watermark: late rows beyond `lateness` are dropped and their window
    * state evicted.
    */
  def windowedCounts(events: DataFrame, tsCol: String, window_ : String,
                     lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Streaming exact dedup: drop duplicate keys within the watermark
    * horizon — the incremental form of the batch digest-dedup. State is one
    * (key, timestamp) entry per distinct key inside the horizon; the
    * watermark evicts it, so state size is bounded by arrival rate ×
    * horizon, not by stream length.
    */
  def streamingDedup(stream: DataFrame, tsCol: String, keyCols: Seq[String],
                     lateness: String): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming gap-based sessionization via `flatMapGroupsWithState` — the
    * custom-state API the built-in windowed aggregates can't express (state
    * = one (lastTs, counters) record per user, updated per batch). Within a
    * batch events are sorted by (event time, id) per group; across batches
    * the state carries the last seen timestamp so a session spanning a
    * batch boundary is not double-counted. Emits the cumulative
    * (user_id, n_sessions, n_events) per group per batch (append mode); on
    * a single-batch run over static input this equals the batch
    * sessionization exactly.
    */
  def streamingSessionCounts(events: DataFrame,
                             gapMicros: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "unix_micros(ts) AS ts_us", "event_id")
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, it, state) =>
          val evs = it.toArray.sortBy(t => (t._2, t._3))
          var (lastTs, sessions, nEvents) = state.getOption
            .map(s => (s.lastTs, s.sessions, s.events))
            .getOrElse((Long.MinValue, 0L, 0L))
          evs.foreach { case (_, ts, _) =>
            if (lastTs == Long.MinValue || ts - lastTs > gapMicros)
              sessions += 1
            lastTs = ts
            nEvents += 1
          }
          state.update(SessionState(lastTs, sessions, nEvents))
          Iterator((uid, sessions, nEvents))
      }
      .toDF("user_id", "n_sessions", "n_events")
  }

  /** Streaming KMV distinct sketch per group via
    * `flatMapGroupsWithState`: bounded k-long state per group (the
    * [[KmvState]] insert keeps the k smallest DISTINCT hashes — a
    * duplicate of a kept hash is caught by membership, and any hash
    * above the current k-th minimum cannot enter the sketch, so
    * ignoring it is exact, not approximate). The emitted estimate is
    * the same fixed (k−1)·2^60/h_k chain as the batch sketch
    * (IEEE-identical in JVM/Spark/DuckDB), with the exact count below
    * k — so a run over the full corpus must reproduce the BATCH KMV
    * row for row, which is what the oracle pins: the sketch is
    * order-insensitive BY THEOREM (k-min of a set does not depend on
    * arrival order), and this query is that theorem run through the
    * streaming engine's state machinery.
    *
    * SINGLE-TRIGGER CONTRACT (Append mode): this op emits one row per
    * group per MICRO-BATCH, so a run-to-completion sink only holds one
    * row per group when the whole input lands in ONE batch. Callers
    * must build the source with `maxFilesPerTrigger = Int.MaxValue`
    * and drain through [[runToMemoryAppend]], which ASSERTS the
    * single-batch expectation (`requireSingleBatch = true`) — an
    * incremental-trigger caller would accumulate stale per-group rows
    * in the sink and must dedup by latest batch itself. A true
    * incremental consumer should read the per-batch rows as a
    * changelog (each row IS the group's current sketch — later batches
    * supersede earlier ones), which is the production shape anyway.
    */
  /** One KMV insert: keep `mins` the ascending k smallest DISTINCT
    * values seen. A duplicate of a kept value is caught by membership;
    * a value ≥ the running k-th minimum of a full sketch provably
    * cannot belong to the k smallest, so skipping it is exact. Folding
    * any sequence through this equals sorted-distinct-take-k of the
    * whole sequence (order-insensitivity — property-spec-pinned).
    */
  private[graft] def kmvInsert(mins: Vector[Long], h: Long,
                               k: Int): Vector[Long] =
    if ((mins.size >= k && h >= mins.last) || mins.contains(h)) mins
    else {
      val idx = mins.indexWhere(_ > h) match {
        case -1 => mins.size
        case n => n
      }
      ((mins.take(idx) :+ h) ++ mins.drop(idx)).take(k)
    }

  def streamingKmv(events: DataFrame, k: Int,
                   kmvSpace: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(org.apache.spark.sql.functions.col("event_type"),
        graft.functions.text.md5_prefix64(
          org.apache.spark.sql.functions.col("user_id").cast("string"),
          15).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[KmvState, (String, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (et, it, state) =>
          var mins = state.getOption.map(_.mins.toVector)
            .getOrElse(Vector.empty[Long])
          it.foreach { case (_, h) => mins = kmvInsert(mins, h, k) }
          state.update(KmvState(mins))
          val est =
            if (mins.size < k) mins.size.toDouble
            else (k - 1).toDouble * kmvSpace.toDouble /
              mins.last.toDouble
          Iterator((et, mins.size.toLong, est))
      }
      .toDF("event_type", "n_mins", "kmv_est")
  }

  /** Run a streaming aggregation to completion against a static directory
    * (memory sink, complete mode) and return the result — used by tests and
    * by the `queries` registry to exercise the streaming path on the batch
    * harness data. `build` receives a CLONED session (scoped conf) and must
    * construct the stream on it.
    */
  def runToMemory(spark: SparkSession, name: String,
                  statePartitions: Int = 4)
                 (build: SparkSession => DataFrame): DataFrame =
    runToMemoryMode(spark, name, "complete", statePartitions,
      requireSingleBatch = false)(build)

  /** Append-mode variant for non-aggregating/flatMapGroupsWithState streams.
    * Run-to-completion append-mode verification is only meaningful when the
    * whole static input lands in ONE micro-batch (multi-batch: cumulative
    * per-group emissions accumulate in the sink, and watermark advance
    * between batches can drop rows batch semantics would keep) — callers
    * build the stream with `maxFilesPerTrigger = Int.MaxValue` and this
    * asserts the single-batch expectation held.
    */
  def runToMemoryAppend(spark: SparkSession, name: String,
                        statePartitions: Int = 4)
                       (build: SparkSession => DataFrame): DataFrame =
    runToMemoryMode(spark, name, "append", statePartitions,
      requireSingleBatch = true)(build)

  /** Multi-batch append-mode run — for queries whose SEMANTICS are the
    * watermark trajectory itself (late-data drop, append-mode window
    * finalization). Here input arriving over many micro-batches is the
    * point, not a verification hazard: the caller pins the file arrival
    * order and the oracle replays the resulting watermark in closed
    * form (`stream_late_data_drop`). Everything [[runToMemoryAppend]]'s
    * single-batch guard protects against must instead be accounted for
    * by the oracle.
    */
  def runToMemoryAppendMulti(spark: SparkSession, name: String,
                             statePartitions: Int = 4)
                            (build: SparkSession => DataFrame): DataFrame =
    runToMemoryMode(spark, name, "append", statePartitions,
      requireSingleBatch = false)(build)

  /** Run a `foreachBatch` stream to completion against a static directory.
    * Unlike [[runToMemory]] there is no sink table — `handle` receives
    * each micro-batch (plus its id) and applies its own side effect
    * (merge/upsert into a target). Same scoping rules: the stream is built
    * on a CLONED session with `statePartitions` shuffle partitions and a
    * tmpfs checkpoint. Returns the cloned session so callers can read
    * what `handle` wrote with the same conf.
    */
  def runForeachBatch(session: SparkSession, statePartitions: Int = 4)
                     (build: SparkSession => DataFrame)
                     (handle: (DataFrame, Long) => Unit): SparkSession = {
    val spark = session.newSession()
    session.conf.getAll.foreach { case (k, v) =>
      try spark.conf.set(k, v) catch { case _: Exception => () }
    }
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val stream = build(spark)
    val ckpt = {
      val base = new java.io.File("/dev/shm")
      val dir = if (base.isDirectory && base.canWrite)
        java.nio.file.Files.createTempDirectory(base.toPath, "graft-ckpt-")
      else java.nio.file.Files.createTempDirectory("graft-ckpt-")
      dir.toFile.deleteOnExit()
      dir.toString
    }
    try {
      val q = stream.writeStream
        .foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(ckpt))
    }
    spark
  }

  private def runToMemoryMode(session: SparkSession, name: String,
                              mode: String, statePartitions: Int,
                              requireSingleBatch: Boolean)
                             (build: SparkSession => DataFrame): DataFrame = {
    // Scope the run's conf to a CLONED session (shared SparkContext,
    // isolated SQLConf + temp views): mutating the caller's session-global
    // shuffle.partitions would silently re-plan any query running
    // concurrently on it. Runtime confs are copied over so source options
    // (nanosAsLong, ICU off) survive the clone.
    val spark = session.newSession()
    session.conf.getAll.foreach { case (k, v) =>
      try spark.conf.set(k, v) catch { case _: Exception => () }
    }
    // stateful ops fix their partition count at the first batch; 32 state
    // partitions mean 32 sequential store-commit barriers (file create +
    // fsync + rename each) PER BATCH — pure fixed overhead at this state
    // size and the reason this query degrades worst under host contention.
    // 4 partitions keep plenty of parallelism at verification state sizes
    // (measured: 8→4 cut the 3 stateful-join/dedup queries ~25%); durable
    // production streams size this to state volume instead.
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val agg = build(spark)
    // ephemeral run-to-completion stream: durability of the checkpoint buys
    // nothing (the result is read back immediately), so put the WAL + state
    // store on tmpfs when available — every offset/commit/state write is an
    // fsync'd create+rename, the dominant fixed cost under disk contention
    val ckpt = {
      val base = new java.io.File("/dev/shm")
      val dir = if (base.isDirectory && base.canWrite)
        java.nio.file.Files.createTempDirectory(base.toPath, "graft-ckpt-")
      else java.nio.file.Files.createTempDirectory("graft-ckpt-")
      dir.toFile.deleteOnExit()
      dir.toString
    }
    try {
      val q = agg.writeStream
        .format("memory").queryName(name).outputMode(mode)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally {
        // capture the final micro-batch's executed plan and progress
        // BEFORE stop(): stream-static join shape (broadcast vs
        // shuffled) is a plan property and the state-store backend is a
        // progress property — queries assert on them via
        // lastPlan(name) / lastProgressJson(name)
        try {
          lastPlans.put(name,
            org.apache.spark.sql.GraftStreamBridge.lastExecutedPlan(q))
          Option(q.lastProgress)
            .foreach(p => lastProgresses.put(name, p.json))
        } catch {
          // NonFatal only: swallowing OOM/interrupt here would mask a
          // dying JVM and lose the interrupt flag right before stop()
          case scala.util.control.NonFatal(_) => ()
        }
        q.stop()
      }
      if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG"))
        q.recentProgress.foreach(p => System.err.println(
          s"[stream] batch=${p.batchId} rows=${p.numInputRows} " +
            s"wm=${Option(p.eventTime).map(_.get("watermark")).orNull} " +
            s"maxET=${Option(p.eventTime).map(_.get("max")).orNull} " +
            s"dropped=${p.stateOperators.map(_.numRowsDroppedByWatermark).mkString(",")} " +
            s"durations=${p.durationMs}"))
      if (requireSingleBatch) {
        // A trailing zero-input batch is fine (watermark-advance state
        // eviction runs one); INPUT split across batches is not — that is
        // the mode where cumulative per-group emissions accumulate in the
        // sink and watermark advance can drop rows batch semantics keeps.
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches <= 1,
          s"run-to-completion append stream '$name' consumed input over " +
            s"$dataBatches batches — build it with " +
            "maxFilesPerTrigger=Int.MaxValue so the static input lands in " +
            "one batch")
      }
    } finally {
      // best-effort cleanup of the tmpfs checkpoint
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(ckpt))
    }
    spark.table(name)
  }
}
