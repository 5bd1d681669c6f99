package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Observability surface: a QueryExecutionListener that records, per
  * completed action, the wall duration and the executed plan's headline
  * metrics (output rows of the root node, files/bytes read summed over
  * parquet scans) into a bounded in-memory ring. `report` hands the
  * captures back as a DataFrame so dashboards/tests consume them with
  * the same API as everything else.
  *
  * This is the single-process analog of a metrics sink: at production
  * scale the same listener forwards to the metrics system instead of a
  * ring buffer — the capture points (listener + plan metrics) are the
  * Spark-native ones either way, with zero per-row overhead (metrics
  * are collected by the executors as SQLMetrics regardless; reading
  * them after completion costs nothing extra).
  *
  * Registration: `Metrics.install(spark)` (idempotent per session). */
object Metrics {

  final case class Capture(
      action: String,
      durationMs: Long,
      outputRows: Long,
      filesRead: Long,
      bytesRead: Long,
      error: Option[String])

  /** Bounded ring per session — a listener that grows without bound is
    * a driver leak; 4096 captures ≈ hours of interactive use.
    *
    * Both per-session maps hold WEAK keys: a session-cycling process
    * (notebook kernels, test harnesses, long-lived services creating
    * short-lived sessions) must not accumulate a ring + listener per
    * dead session forever. The listener deliberately holds its RING,
    * never its session — a strong session reference in a map value
    * would pin the weak key of the same entry (the classic WeakHashMap
    * self-reference pitfall) and re-create the leak. With that edge
    * absent, an unreferenced session, its listenerManager, its
    * listener, and its ring form one garbage cycle and are collected
    * together; [[evict]] offers the deterministic form. */
  private val MaxCaptures = 4096
  private val rings = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.ArrayDeque[Capture]]())

  private final class Listener(ring: java.util.ArrayDeque[Capture])
      extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      record(ring, funcName, qe, durationNs, None)
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit =
      record(ring, funcName, qe, 0L, Some(exception.toString.take(200)))
  }

  private def record(ring: java.util.ArrayDeque[Capture], funcName: String,
                     qe: QueryExecution, durationNs: Long,
                     err: Option[String]): Unit = {
    val plan = qe.executedPlan
    val rows = plan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
    var files = 0L; var bytes = 0L
    // AdaptiveSparkPlanExec hides the current physical plan from child
    // traversal — unwrap it (at any nesting depth) or scans go uncounted
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      // materialized AQE stages are leaves whose real subplan hangs off
      // `plan`, not `children` — without this case every scan under a
      // shuffle boundary goes uncounted
      case q: QueryStageExec => walk(q.plan)
      case n =>
        n.metrics.get("numFiles").foreach(m => files += m.value)
        n.metrics.get("filesSize").foreach(m => bytes += m.value)
        n.children.foreach(walk)
        n.subqueries.foreach(walk)
    }
    walk(plan)
    ring.synchronized {
      if (ring.size >= MaxCaptures) ring.removeFirst()
      ring.addLast(Capture(funcName, durationNs / 1000000L, rows,
        files, bytes, err))
    }
  }

  /** Listener per session, weak-keyed like [[rings]] (the value holds
    * only the ring — see the leak note there). */
  private val listeners = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, Listener]())

  /** Idempotent install — one listener per session. */
  def install(spark: SparkSession): Unit = listeners.synchronized {
    if (!listeners.containsKey(spark)) {
      val ring = rings.computeIfAbsent(spark,
        _ => new java.util.ArrayDeque[Capture]())
      val l = new Listener(ring)
      listeners.put(spark, l)
      spark.listenerManager.register(l)
    }
  }

  /** Deterministic eviction for session-cycling drivers: unregister the
    * listener and drop the ring; a later [[install]] starts fresh.
    * (Sessions that are simply dropped are reclaimed by GC via the weak
    * keys — this is the explicit form for immediate release.) */
  def evict(spark: SparkSession): Unit = listeners.synchronized {
    val l = listeners.remove(spark)
    if (l != null) spark.listenerManager.unregister(l)
    rings.remove(spark): Unit
  }

  /** Captures so far, oldest first. */
  def captures(spark: SparkSession): Seq[Capture] = {
    val ring = rings.get(spark)
    if (ring == null) Seq.empty
    else ring.synchronized {
      val it = ring.iterator(); val b = Seq.newBuilder[Capture]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  /** The captures as a DataFrame (the library-idiomatic report form). */
  def report(spark: SparkSession): DataFrame = {
    import spark.implicits._
    captures(spark)
      .map(c => (c.action, c.durationMs, c.outputRows, c.filesRead,
        c.bytesRead, c.error.orNull))
      .toDF("action", "duration_ms", "output_rows", "files_read",
        "bytes_read", "error")
  }

  def reset(spark: SparkSession): Unit = {
    val ring = rings.get(spark)
    if (ring != null) ring.synchronized(ring.clear())
  }
}
