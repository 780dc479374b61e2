package graft.ops

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Plan-attached runtime warnings via `Dataset.observe` + one per-session
  * [[QueryExecutionListener]].
  *
  * Operators that are exact-but-quadratic past some data shape (uncapped
  * posting lists, mega-buckets) attach a `CollectMetrics` node — zero extra
  * jobs — and the listener fires the handler when the caller's action
  * completes. This replaces the earlier per-call watcher thread, which
  * blocked forever in `Observation.get` when the caller never ran an action
  * on the returned plan (one leaked daemon thread per plan built).
  *
  * A handler returns whether it is DONE: `true` unregisters it, `false`
  * keeps it armed for the next action. A partial action (`take(1)`,
  * `isEmpty` — limit pushdown) streams only some rows through
  * CollectMetrics, so a shape-triggered warning can legitimately see
  * nothing and must stay armed for the later full action; returning `true`
  * only after actually warning is what makes that work. An un-executed plan
  * leaks only its map entry, never a thread.
  *
  * Batch-only: `QueryExecutionListener` is not invoked for streaming
  * micro-batches (streaming `observe` metrics are delivered via
  * `StreamingQueryListener`), so observe-wrapped operators used on a
  * streaming DataFrame never fire these warnings. All current callers are
  * batch operators; a streaming caller would need to register a
  * `StreamingQueryListener` consulting the same handler map.
  *
  * Sessions are tracked weakly: a stopped-and-dropped SparkSession is
  * GC-able together with its listener (the listener is reachable only from
  * that session's `listenerManager`), so long-lived drivers creating many
  * short-lived sessions do not accumulate them here.
  *
  * The handler map is FIFO-bounded at [[MaxPending]]: plans that are built
  * but never executed would otherwise grow it without limit in a long-lived
  * driver. Evicting the oldest entry can only drop a warning for a plan
  * that sat un-executed behind 4096 newer observed plans — a diagnostics
  * trade-off, never a correctness one (warnings are advisory).
  */
private[graft] object PlanWarnings {

  private[graft] val MaxPending = 4096
  private val counter = new AtomicLong()
  private val handlers = new ConcurrentHashMap[String, Row => Boolean]()
  private val insertionOrder =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val sessions =
    java.util.Collections.newSetFromMap(
      java.util.Collections.synchronizedMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  private final class Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        val h = handlers.get(name)
        if (h != null && h(row)) handlers.remove(name)
      }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }

  /** Attach `metrics` to `df`; `handler` runs on the observed row after each
    * completed action on the returned DataFrame until it returns `true`
    * (= fired / no longer needed), which unregisters it. */
  def observe(df: DataFrame, tag: String, metrics: Seq[Column])(
      handler: Row => Boolean): DataFrame = {
    val spark = df.sparkSession
    if (sessions.add(spark)) spark.listenerManager.register(new Listener)
    val name = s"graft_warn_${tag}_${counter.incrementAndGet()}"
    handlers.put(name, handler)
    insertionOrder.add(name)
    // Names of already-fired handlers linger in the queue until polled here;
    // their remove() is a no-op and the loop simply skips past them.
    while (handlers.size() > MaxPending) {
      val oldest = insertionOrder.poll()
      if (oldest == null) return df.observe(name, metrics.head, metrics.tail: _*)
      handlers.remove(oldest)
    }
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  private[graft] def pendingHandlers: Int = handlers.size()
}
