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
  * Handlers are warn-once: each `observe` call gets a unique metrics name and
  * the handler is dropped after its first firing, so re-running the same
  * returned DataFrame doesn't repeat the warning and the handler map cannot
  * grow with repeated actions (an un-executed plan leaks only a map entry,
  * not a thread).
  */
private[graft] object PlanWarnings {

  private val counter = new AtomicLong()
  private val handlers = new ConcurrentHashMap[String, Row => Unit]()
  private val sessions =
    java.util.Collections.newSetFromMap(
      new ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private final class Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        val h = handlers.remove(name)
        if (h != null) h(row)
      }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }

  /** Attach `metrics` to `df` and run `handler` on the observed row after the
    * first completed action on the returned DataFrame. */
  def observe(df: DataFrame, tag: String, metrics: Seq[Column])(
      handler: Row => Unit): DataFrame = {
    val spark = df.sparkSession
    if (sessions.add(spark)) spark.listenerManager.register(new Listener)
    val name = s"graft_warn_${tag}_${counter.incrementAndGet()}"
    handlers.put(name, handler)
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  private[graft] def pendingHandlers: Int = handlers.size()
}
