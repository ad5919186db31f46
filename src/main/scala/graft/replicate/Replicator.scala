package graft.replicate

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** Accumulated per-replicator counters, fed by a StreamingQueryListener
  * (reference: mutex-guarded SourceStats/TargetStats,
  * `pkg/replicator/stats.go:5-45`).
  */
class ReplicatorStats {
  val totalEvents = new AtomicLong(0)
  val totalBatches = new AtomicLong(0)
  val checkpoints = new AtomicLong(0)
  val errors = new AtomicLong(0)
  val startedAtMs = new AtomicLong(0)
  val lastEventAtMs = new AtomicLong(0)

  def uptimeMs: Long =
    if (startedAtMs.get == 0) 0 else System.currentTimeMillis() - startedAtMs.get

  def toJson: String =
    s"""{"total_events":${totalEvents.get},"total_batches":${totalBatches.get},
       |"checkpoints":${checkpoints.get},"errors":${errors.get},
       |"uptime_ms":$uptimeMs,"last_event_at_ms":${lastEventAtMs.get}}"""
      .stripMargin.replace("\n", "")
}

/** Streaming-CDC control plane: wraps a restartable StreamingQuery behind
  * the reference's FSM (`pkg/replicator/replicator.go:215-284`) and signal
  * surface (pause/resume/stop/restart, `:288-344`).
  *
  * Pause has no native Spark equivalent — it is implemented as a graceful
  * `query.stop()` plus restart-from-checkpoint on resume (SURVEY.md §7.3
  * hard-part 6); the checkpointLocation inside `buildQuery` makes that
  * exactly-resumable, so the observable semantics (at-least-once delivery,
  * resume from last committed position) match the reference's
  * write-then-checkpoint loop.
  */
class Replicator(
    val id: String,
    spark: SparkSession,
    buildQuery: SparkSession => StreamingQuery) {

  val fsm = new Fsm()
  val stats = new ReplicatorStats
  private val query = new AtomicReference[StreamingQuery](null)

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val q = query.get
      if (q != null && e.progress.id == q.id) {
        stats.totalBatches.incrementAndGet()
        val rows = e.progress.numInputRows
        if (rows > 0) {
          stats.totalEvents.addAndGet(rows)
          stats.lastEventAtMs.set(System.currentTimeMillis())
        }
        stats.checkpoints.incrementAndGet() // each committed micro-batch = one checkpoint
      }
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      val q = query.get
      if (q != null && e.id == q.id && e.exception.isDefined)
        stats.errors.incrementAndGet()
    }
  }

  def start(): Unit = synchronized {
    fsm.transition(FsmState.Connecting)
    try {
      spark.streams.addListener(listener)
      query.set(buildQuery(spark))
      stats.startedAtMs.set(System.currentTimeMillis())
      fsm.transition(FsmState.Streaming)
    } catch {
      case e: Throwable =>
        stats.errors.incrementAndGet()
        fsm.transition(FsmState.Error)
        throw e
    }
  }

  def pause(): Unit = synchronized {
    fsm.transition(FsmState.Paused)
    Option(query.getAndSet(null)).foreach(_.stop())
  }

  def resume(): Unit = synchronized {
    fsm.transition(FsmState.Streaming)
    query.set(buildQuery(spark))
  }

  def stop(): Unit = synchronized {
    fsm.transition(FsmState.Stopped)
    Option(query.getAndSet(null)).foreach(_.stop())
    spark.streams.removeListener(listener)
  }

  def restart(): Unit = synchronized {
    fsm.transition(FsmState.Reconnecting)
    Option(query.getAndSet(null)).foreach(_.stop())
    query.set(buildQuery(spark))
    fsm.transition(FsmState.Streaming)
  }

  /** Block until the current query has processed all available input —
    * test/drain hook (maps to `processAllAvailable`).
    */
  def processAllAvailable(): Unit =
    Option(query.get).foreach(_.processAllAvailable())

  def activeQuery: Option[StreamingQuery] = Option(query.get)

  def stateJson: String =
    s"""{"id":"$id","state":"${fsm.state.toString.toLowerCase}","stats":${stats.toJson}}"""
}

/** Process-wide registry backing the stats/control HTTP server. */
object ReplicatorRegistry {
  private val reg = new java.util.concurrent.ConcurrentHashMap[String, Replicator]()
  def register(r: Replicator): Unit = reg.put(r.id, r)
  def get(id: String): Option[Replicator] = Option(reg.get(id))
  def all: Seq[Replicator] = {
    import scala.jdk.CollectionConverters._
    reg.values.asScala.toSeq.sortBy(_.id)
  }
  def clear(): Unit = reg.clear()
}
