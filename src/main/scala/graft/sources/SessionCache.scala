package graft.sources

import org.apache.spark.sql.SparkSession

/** Build-once memo for session-scoped artifacts (loaded tables, staged
  * fixtures, checkpointed index/edge builds), keyed by a tuple whose
  * FIRST element is the owning [[SparkSession]].
  *
  * Two policies every such cache in the repo shares (they were fixed
  * piecemeal across rounds — this is the one implementation):
  *
  *  - '''Dead-session sweep''': an entry keyed by a stopped session can
  *    never be hit again (sessions don't restart), so every access drops
  *    keys whose SparkContext has stopped. The sweep is O(live entries)
  *    — a handful of artifacts per session — and replaces the
  *    per-cache `onApplicationEnd` listeners some sites had and others
  *    (contrary to their comments) lacked.
  *  - '''Build outside the lock''': `computeIfAbsent` would hold the
  *    map's bucket lock across a multi-second Spark job, blocking
  *    unrelated keys that hash to the same bucket. Build first, then
  *    `putIfAbsent`; a racing duplicate build is benign — the first put
  *    wins and the loser's value is dropped (same rows either way).
  */
final class SessionCache[K <: Product, V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[K, V]()

  private def sessionOf(k: K): SparkSession =
    k.productElement(0).asInstanceOf[SparkSession]

  def getOrBuild(k: K)(build: => V): V = {
    m.keySet.removeIf(kk => sessionOf(kk).sparkContext.isStopped)
    Option(m.get(k)).getOrElse {
      val v = build
      Option(m.putIfAbsent(k, v)) match {
        case None => v
        case Some(winner) =>
          // racing duplicate build lost: a PLAN is free to drop, but a
          // persisted/cached frame would pin block-manager storage for
          // the session's lifetime with no handle left — release it.
          // Values may be tuple/case-class shaped (e.g. (PqCodebook,
          // DataFrame)), so scan Products recursively; a bare-DataFrame
          // match leaked the loser's blocks for tuple entries (r9 advice)
          SessionCache.releaseLoser(v)
          winner
      }
    }
  }

  /** Drop entries matching `p` (e.g. a data dir whose files were
    * rewritten under a live session). */
  def invalidateIf(p: K => Boolean): Unit = { m.keySet.removeIf(k => p(k)); () }

  /** Drop one entry, returning its value (so callers can unpersist a
    * cached frame's blocks in a still-live session). */
  def remove(k: K): Option[V] = Option(m.remove(k))

  /** Live entry count — lets plan-keyed memos cap their growth (ad-hoc
    * plans never repeat, so such a cache only shrinks via the
    * dead-session sweep without an explicit cap). */
  def size: Int = m.size
}

object SessionCache {
  /** Release every DataFrame reachable from `v`: bare frames, and frames
    * nested in tuples/case classes/collections (depth capped — values are
    * small artifact records, not deep trees). Covers both cache-manager
    * persistence (`unpersist`) and eager `localCheckpoint` results, whose
    * blocks live on the CHECKPOINT RDD the cache manager never sees — for
    * those, `DataFrame.unpersist` alone is a silent no-op and the blocks
    * stay pinned until driver GC (the r12 release defect: every
    * suffix-index build left ~K+2 corpus-position-sized block sets
    * behind). This is the one release entry point for one-shot
    * checkpointed intermediates; after the call the frame must NOT be
    * used again — a localCheckpoint has no lineage left to recompute
    * from, so a lost-block read fails instead of rebuilding. */
  def release(v: Any): Unit = releaseLoser(v)

  private[sources] def releaseLoser(v: Any, depth: Int = 0): Unit = {
    if (depth > 4) return
    v match {
      case df: org.apache.spark.sql.DataFrame =>
        if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
          df.unpersist(blocking = false)
        df.queryExecution.logical match {
          case lr: org.apache.spark.sql.execution.LogicalRDD
              if lr.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE =>
            lr.rdd.unpersist(blocking = false); ()
          case _ => ()
        }
      // Iterable BEFORE Product: a List is both, and walking its ::
      // cons cells through the Product branch burns one depth level per
      // element — frames past position 4 would silently leak
      case it: Iterable[_] =>
        it.foreach(releaseLoser(_, depth + 1))
      case a: Array[_] =>
        a.foreach(releaseLoser(_, depth + 1))
      case p: Product =>
        p.productIterator.foreach(releaseLoser(_, depth + 1))
      case _ => ()
    }
  }
}
