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
    onHit: DataFrame => DataFrame = identity) {

  private val memo = new java.util.HashMap[
    SparkSession, java.util.HashMap[String, DataFrame]]()

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
