package graft.queries

import org.apache.spark.sql.SparkSession

/** Session sizing for INTERACTIVE-scale transaction gates — the
  * direct-[[graft.bitemp.TxLog]] analogue of
  * [[graft.streaming.IngestStream.start]]'s `txPartitions` declaration.
  *
  * A gate-built tx path (a few txs over tens of thousands of rows) is
  * job-count-bound at local[32], not data-bound: with the session
  * defaults each per-tx action shuffles into 32 near-empty partitions
  * and AQE turns every action into a chain of per-stage jobs with
  * replanning between them — pure scheduling latency at this size
  * (measured 3.9 s → 3.0 s on the cas gate at sf0.1 with 4 partitions
  * + AQE off). A 100 TB feed takes the other branch of the policy: it
  * leaves the session defaults alone and lets AQE coalesce/skew-handle.
  *
  * Restores the previous settings on exit ([[graft.sources.SessionConf]]
  * — see its scaladoc for the session-global/threading contract). Plans
  * RETURNED by `body` and executed later (a gate's final projection) run
  * under the restored session defaults — only the eager per-tx actions
  * inside pay the declared shape, which is where the job count lives.
  */
object Interactive {
  def txScale[A](s: SparkSession, partitions: Int = 4)(body: => A): A =
    graft.sources.SessionConf.withBatchScale(s, partitions)(body)
}
