package graft.ops

import org.apache.spark.sql.DataFrame

/** Data-scaled exchange widths (guide §2.2: shuffles get relatively
  * slower as you scale out — a fixed session-width exchange over a
  * small input pays 32-wide task/fetch overhead for no parallelism
  * gain; r18 measured curate_repetition_rules and the embed family
  * running 1.5-2× FASTER at 8 cores than 32 for exactly this reason).
  *
  * `scaled` derives the width from the frame's own plan-stat input
  * size: ceil(bytes / targetBytesPerTask), clamped to [1, session
  * shuffle partitions] and to an optional key-cardinality cap (a
  * keyed repartition cannot use more partitions than the key has
  * distinct values — guide §2.5; e.g. a 16-cell IVF assign write can
  * never fill more than 16 tasks). At scale the byte count dominates
  * and the width saturates at the session conf, so at-scale behavior
  * is identical to the r18 explicit-session-width form; only the
  * small-input overhead goes away. `targetBytesPerTask` is chosen
  * PER SITE because the per-input-byte fan-out differs by orders of
  * magnitude (a gram explode does ~2000 md5s per input doc; an index
  * compaction just rewrites bytes).
  *
  * Driver-only: reads the cached QueryExecution's optimized-plan
  * statistics (file-source leaf sizes propagated through project /
  * filter visitors) — no job runs. Frames whose stats are unknown
  * (e.g. LogicalRDD from a localCheckpoint without origin stats)
  * report Long.Max-ish sizes and simply saturate at the session
  * width, i.e. the pre-r19 behavior.
  */
object Width {
  def scaled(df: DataFrame, targetBytesPerTask: Long,
             maxWidth: Int = Int.MaxValue): Int = {
    val session = df.sparkSession.sessionState.conf.numShufflePartitions
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    ((bytes + targetBytesPerTask - 1) / targetBytesPerTask)
      .min(BigInt(session)).min(BigInt(maxWidth)).max(BigInt(1)).toInt
  }
}
