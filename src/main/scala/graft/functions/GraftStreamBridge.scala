package org.apache.spark.sql

/** Bridge into the `private[sql]` streaming execution internals: the
  * last micro-batch's EXECUTED physical plan of a streaming query.
  * Stream-static join shape claims ("this probe is a broadcast join",
  * "this variant shuffles") are plan properties of micro-batch
  * executions, which the public StreamingQuery API does not expose —
  * same package-namespace technique as [[GraftColumnBridge]].
  */
object GraftStreamBridge {
  def lastExecutedPlan(q: streaming.StreamingQuery): String = q match {
    case w: execution.streaming.runtime.StreamingQueryWrapper =>
      Option(w.streamingQuery.lastExecution)
        .map(_.executedPlan.toString).getOrElse("")
    case _ => ""
  }
}
