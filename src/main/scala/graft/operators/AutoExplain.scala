package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{ExplainMode, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * auto_explain-shaped automatic plan capture (reference:
 * contrib/auto_explain/auto_explain.cpp:23-47 — an executor hook that
 * logs the plan of every statement whose duration crosses
 * `auto_explain.log_min_duration`; `log_analyze` adds actual row
 * counts, `log_verbose`/`log_format` widen the plan rendering).
 *
 * Spark-first: the executor hook IS `QueryExecutionListener` — the
 * public SparkSession surface invoked once per completed action with
 * the QueryExecution and wall duration; no reflection, no internals.
 * Captured entries stay driver-side in a bounded buffer (the
 * reference writes to the server log and forgets), and [[log]]
 * exposes them as a relation so the same workload tooling that reads
 * the pg_stat_statements view ([[QueryStats]]) can consume plans.
 *
 * Knob mapping:
 *  - log_min_duration → `minDurationUs` (< 0 disables, 0 logs all);
 *  - log_analyze → actual output row count from the executed plan's
 *    own metrics (topmost numOutputRows, AQE wrappers unwrapped);
 *  - log_verbose / log_format → `mode` ∈ simple|extended|formatted
 *    (Spark's ExplainMode names);
 *  - log_nested_statements → N/A (Spark actions don't nest).
 *
 * Delivery is ASYNCHRONOUS (the listener bus), so readers poll
 * [[Listener.size]] for the expected count before [[log]] — same
 * contract as the reference's log shipping.
 */
object AutoExplain {
  final case class Entry(seq: Long, action: String, durationUs: Long,
      outRows: Option[Long], plan: String)

  /** Retention bound for the driver-side buffer; oldest drop first. */
  val MaxEntries = 10000

  final class Listener(minDurationUs: Long, analyze: Boolean,
      mode: String) extends QueryExecutionListener {
    private val buf = new ConcurrentLinkedQueue[Entry]()
    private val seq = new AtomicLong(0L)
    // ConcurrentLinkedQueue.size is O(n): keep the count alongside so
    // the retention trim and awaitEntries polling stay O(1) on the
    // listener-bus thread
    private val count = new java.util.concurrent.atomic.AtomicInteger(0)
    def size: Int = count.get()
    def entries: Seq[Entry] = {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq
    }
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      val us = durationNs / 1000L
      if (minDurationUs >= 0 && us >= minDurationUs) {
        val rows = if (analyze) outputRows(qe.executedPlan) else None
        buf.add(Entry(seq.getAndIncrement(), funcName, us, rows,
          qe.explainString(ExplainMode.fromString(mode))))
        if (count.incrementAndGet() > MaxEntries &&
            buf.poll() != null) { count.decrementAndGet(); () }
      }
    }
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()
  }

  /** Topmost actual row count in the executed plan (log_analyze):
    * depth-first from the root, AQE wrappers unwrap to their final
    * physical plan, first node carrying numOutputRows wins — for a
    * collected query that is the result row count. */
  private def outputRows(plan: SparkPlan): Option[Long] = {
    var stack = List[SparkPlan](plan)
    while (stack.nonEmpty) {
      val p = stack.head; stack = stack.tail
      p match {
        case a: AdaptiveSparkPlanExec => stack = a.executedPlan :: stack
        case _ if p.metrics.contains("numOutputRows") =>
          return Some(p.metrics("numOutputRows").value)
        case _ => stack = p.children.toList ::: stack
      }
    }
    None
  }

  /** Actual output rows of an ALREADY-EXECUTED query — the same
    * extraction the listener's log_analyze arm uses, for callers that
    * hold the QueryExecution directly (EXPLAIN ANALYZE renders through
    * this instead of racing the asynchronous listener bus). */
  def actualRows(qe: QueryExecution): Option[Long] =
    outputRows(qe.executedPlan)

  /** Register a capture listener on `spark` (session-scoped: other
    * sessions on the same context are not observed — use
    * `spark.newSession()` for an isolated capture window). */
  def install(spark: SparkSession, minDurationUs: Long = 0L,
      analyze: Boolean = true, mode: String = "simple"): Listener = {
    require(Set("simple", "extended", "formatted")(mode),
      s"graft: unknown explain mode '$mode'")
    val l = new Listener(minDurationUs, analyze, mode)
    spark.listenerManager.register(l)
    l
  }

  def uninstall(spark: SparkSession, l: Listener): Unit =
    spark.listenerManager.unregister(l)

  /** Poll until the listener has delivered `n` entries (the bus is
    * asynchronous); false on timeout. */
  def awaitEntries(l: Listener, n: Int, timeoutMs: Long = 30000L): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (l.size < n && System.nanoTime() < deadline) Thread.sleep(10)
    l.size >= n
  }

  /** Captured entries as a relation. */
  def log(spark: SparkSession, l: Listener): DataFrame = {
    import spark.implicits._
    l.entries.map(e => (e.seq, e.action, e.durationUs, e.outRows, e.plan))
      .toDF("seq", "action", "duration_us", "out_rows", "plan")
  }
}
