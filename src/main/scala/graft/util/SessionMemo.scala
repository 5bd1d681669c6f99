package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, key) DataFrame memo shared by Tables (scan plans) and
  * TextDedup (persisted lineages).
  *
  * A WeakHashMap keyed by session is NOT enough on its own: a DataFrame
  * strongly references its SparkSession (via QueryExecution), so map
  * values would keep their own keys reachable forever — the classic
  * WeakHashMap self-reference pitfall. Instead, every access first
  * evicts entries whose session has been stopped; session counts are
  * tiny (one per Verify/Bench/test JVM), so the sweep is O(sessions).
  */
private[graft] final class SessionMemo(
    onHit: DataFrame => DataFrame = identity,
    persistedLineage: Boolean = false,
    name: String = "") {

  SessionMemo.register(this)

  private val memo = new java.util.HashMap[
    SparkSession, java.util.HashMap[String, DataFrame]]()

  /** (key, frame) entries for `s`, but only when this memo holds
    * persisted lineages (plan-only memos like Tables' scans have nothing
    * to warm). Keys are prefixed with the memo's family `name` so the
    * bench warm breakdown is attributable per lineage. */
  private[graft] def persistedEntries(s: SparkSession): Seq[(String, DataFrame)] =
    memo.synchronized {
      val m = memo.get(s)
      if (m == null || !persistedLineage) Seq.empty
      else {
        import scala.jdk.CollectionConverters._
        // deterministic (key-sorted) order so warm-time variance across
        // runs reflects the box, never HashMap iteration order
        m.entrySet().asScala.toSeq.sortBy(_.getKey).map { e =>
          val k = if (name.isEmpty) e.getKey else s"$name.${e.getKey}"
          k -> e.getValue
        }
      }
    }

  def apply(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    memo.synchronized {
      val it = memo.keySet().iterator()
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      val perSession = {
        val m = memo.get(s)
        if (m != null) m
        else {
          val m2 = new java.util.HashMap[String, DataFrame]()
          memo.put(s, m2); m2
        }
      }
      val hit = perSession.get(key)
      if (hit != null) onHit(hit)
      else { val df = build; perSession.put(key, df); df }
    }
}

private[graft] object SessionMemo {
  private val instances = scala.collection.mutable.ArrayBuffer[SessionMemo]()
  private def register(m: SessionMemo): Unit =
    instances.synchronized { instances += m }

  /** Re-persist and MATERIALIZE every persisted-lineage memo entry for
    * `s`. Benchmark hygiene: `spark.catalog.clearCache()` unpersists the
    * family pipelines' shared intermediates, so without this the first
    * query to touch a family in a timed pass absorbs the whole pipeline
    * rebuild (VERDICT r4 item 3 — q_corpus_report billed 13 s of
    * dedup-pipeline lineage). Persist-all FIRST so dependency order
    * doesn't matter: counting a downstream entry then caches its
    * upstream entries as a side effect. Returns the entry count. */
  def warmPersisted(s: SparkSession): Int = warmPersistedTimed(s).size

  /** [[warmPersisted]] with a per-entry (key, seconds) breakdown —
    * VERDICT r8 item 3: `pipeline_warm_sec` was a single opaque number,
    * so a warm-time regression wasn't attributable to a lineage.
    * Attribution caveat (documented, inherent): entries share lineage,
    * so the FIRST entry counted materializes its upstream entries as a
    * side effect and absorbs their build time (they then time ~0).
    * Order is key-sorted and deterministic, so run-over-run comparison
    * of a given key is still apples-to-apples. */
  def warmPersistedTimed(s: SparkSession): Seq[(String, Double)] = {
    val entries = instances.synchronized(instances.toList)
      .flatMap(_.persistedEntries(s))
    entries.foreach { case (_, df) =>
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.persist()
    }
    entries.map { case (key, df) =>
      val t0 = System.nanoTime()
      try df.count()
      catch { case _: Throwable => () } // a broken entry fails its own query, not the warm
      key -> (System.nanoTime() - t0) / 1e9
    }
  }
}
