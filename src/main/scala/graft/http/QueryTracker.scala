package graft.http

import java.time.{Duration, Instant}

/** Node query-state introspection — the reference's active/recent/slowest
  * query registries (crux-core/src/crux/node.clj:65-86,190-197 +
  * crux/query_state.clj): every `q` is recorded in-progress, moved to the
  * completed ring on finish (with error, if it failed), and additionally
  * into the slowest ring when it exceeded the slow-query threshold. The
  * cleaning policies are pure functions over (now, options), ported
  * 1:1 so current_queries_test.clj's policy cases pin them.
  */
object QueryTracker {

  final case class QueryState(queryId: Long, query: String,
      startedAt: Instant, finishedAt: Option[Instant],
      status: String, // in-progress | completed | failed
      error: Option[String])

  /** Defaults = the reference's ::sys/args defaults (node.clj:298-312). */
  final case class Options(
      recentQueriesMaxAge: Duration = Duration.ofMinutes(5),
      recentQueriesMaxCount: Int = 20,
      slowQueriesMinThreshold: Duration = Duration.ofMinutes(1),
      slowQueriesMaxAge: Duration = Duration.ofHours(24),
      slowQueriesMaxCount: Int = 100)

  /** node.clj:65 `query-expired?` — finished longer than maxAge ago. */
  def expired(q: QueryState, maxAge: Duration, now: Instant): Boolean =
    q.finishedAt.exists(f => maxAge.compareTo(Duration.between(f, now)) < 0)

  /** node.clj:71 `slow-query?`. */
  def slow(q: QueryState, threshold: Duration): Boolean =
    q.finishedAt.exists(f =>
      threshold.compareTo(Duration.between(q.startedAt, f)) < 0)

  /** node.clj:75 `clean-completed-queries`: drop expired, newest-finished
    * first, cap the count. */
  def cleanCompleted(qs: Seq[QueryState], opts: Options,
      now: Instant = Instant.now()): Seq[QueryState] =
    qs.filterNot(expired(_, opts.recentQueriesMaxAge, now))
      .sortBy(_.finishedAt.map(_.toEpochMilli).getOrElse(Long.MaxValue))(
        Ordering[Long].reverse)
      .take(opts.recentQueriesMaxCount)

  /** node.clj:81 `clean-slowest-queries`: drop expired, longest-running
    * first (sort key started-finished ascending, as the reference), cap. */
  def cleanSlowest(qs: Seq[QueryState], opts: Options,
      now: Instant = Instant.now()): Seq[QueryState] =
    qs.filterNot(expired(_, opts.slowQueriesMaxAge, now))
      .sortBy(q => q.startedAt.toEpochMilli -
        q.finishedAt.map(_.toEpochMilli).getOrElse(q.startedAt.toEpochMilli))
      .take(opts.slowQueriesMaxCount)
}

/** Mutable per-node registry (the `!running-queries` atom). */
final class QueryTracker(opts: QueryTracker.Options = QueryTracker.Options()) {
  import QueryTracker._
  private val idGen = new java.util.concurrent.atomic.AtomicLong(0L)
  private val inProgress =
    new java.util.concurrent.ConcurrentHashMap[Long, QueryState]()
  @volatile private var completed: Seq[QueryState] = Nil
  @volatile private var slowest: Seq[QueryState] = Nil

  def started(query: String): Long = {
    val id = idGen.incrementAndGet()
    inProgress.put(id,
      QueryState(id, query, Instant.now(), None, "in-progress", None))
    id
  }

  def finished(id: Long, error: Option[String]): Unit = synchronized {
    Option(inProgress.remove(id)).foreach { q0 =>
      val q = q0.copy(finishedAt = Some(Instant.now()),
        status = if (error.isEmpty) "completed" else "failed", error = error)
      completed = cleanCompleted(q +: completed, opts)
      if (slow(q, opts.slowQueriesMinThreshold))
        slowest = cleanSlowest(q +: slowest, opts)
    }
  }

  def active(): Seq[QueryState] =
    scala.jdk.CollectionConverters.CollectionHasAsScala(inProgress.values()).asScala.toSeq
      .sortBy(_.queryId)
  def recent(): Seq[QueryState] = synchronized {
    completed = cleanCompleted(completed, opts); completed
  }
  def slowestQueries(): Seq[QueryState] = synchronized {
    slowest = cleanSlowest(slowest, opts); slowest
  }
}
