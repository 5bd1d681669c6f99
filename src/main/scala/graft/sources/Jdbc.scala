package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Generic JDBC warehouse source + sink — the neutral analog of the
  * reference's BigQuery read (`scripts/energy_etl.py:24-32`, the
  * watermark SELECT) and load (`energy_etl.py:86-108`, the batched
  * WRITE_APPEND): the engine stays Parquet-first, but a user pointing
  * at a real warehouse gets the same verbs over `spark.read.jdbc`.
  *
  * Scale design (100 TB cluster, remote warehouse):
  *  - READS are partitioned: `readPartitioned` splits the table into
  *    `numPartitions` disjoint range predicates on a numeric column, so
  *    1000 executors each pull their own slice over their own
  *    connection — a plain `read` is ONE connection on ONE task, fine
  *    for dims, wrong for facts.
  *  - FILTER + PROJECTION PUSHDOWN are free: Spark's JDBCRelation
  *    compiles catalyst filters into the remote WHERE clause and prunes
  *    columns into the SELECT list (pinned in JdbcSpec via
  *    PushedFilters), so the warehouse ships only matching rows — the
  *    exact property the reference leaned on BigQuery for.
  *  - WRITES are batched per partition: `append` rides Spark's JDBC
  *    writer (one INSERT batch per `batchSize` rows per partition);
  *    `upsert` is the key-level merge WRITE_APPEND lacks — executor-side
  *    batched UPDATE-then-INSERT (the executeBatch update-count array
  *    tells which keys were absent), ANSI-portable (no MERGE dialect),
  *    idempotent on replay. Single-writer contract per key range, the
  *    same assumption the reference's loader makes.
  */
object Jdbc {

  private def props(driver: Option[String]): Properties = {
    val p = new Properties()
    driver.foreach(p.setProperty("driver", _))
    p
  }

  /** Whole-table (or dim-sized) read — one remote cursor. Filters and
    * column pruning applied AFTER this call still push down to the
    * warehouse (JDBCRelation), so `read(...).filter(...).select(...)`
    * ships only the matching slice. */
  def read(
      spark: SparkSession,
      url: String,
      table: String,
      driver: Option[String] = None): DataFrame =
    spark.read.jdbc(url, table, props(driver))

  /** Range-partitioned parallel read over a numeric column — the fact
    * -table shape: Spark issues `numPartitions` concurrent queries,
    * each bounded by a disjoint `partitionCol` range, so the pull
    * parallelizes across executors instead of serializing on one
    * connection. Bounds outside [lower, upper] still arrive (the first/
    * last partitions are unbounded), so the split is a parallelism
    * hint, never a filter. */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionCol: String,
      lower: Long,
      upper: Long,
      numPartitions: Int,
      driver: Option[String] = None): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions,
      props(driver))

  /** Append-mode batched load — the reference's WRITE_APPEND
    * (`energy_etl.py:105`): at-least-once, duplicates on crash replay;
    * pair with [[upsert]] (or Pipeline.readDeduped's dedup-on-read)
    * when replays must not double rows. */
  def append(
      df: DataFrame,
      url: String,
      table: String,
      batchSize: Int = 1000,
      driver: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Append)
      .option("batchsize", batchSize.toString)
    driver.foreach(d => w.option("driver", d): Unit)
    w.jdbc(url, table, props(driver))
  }

  /** Key-level batched upsert — executor-side, connection per
    * partition, `batchSize`-row statement batches. Implementation is
    * UPDATE-then-INSERT rather than MERGE: `executeBatch` on the UPDATE
    * returns the per-row update counts, and exactly the rows that
    * updated nothing are re-batched as INSERTs — ANSI-portable across
    * warehouses whose MERGE dialects disagree (Derby/DB2 vs Postgres
    * ON CONFLICT vs BigQuery MERGE). Idempotent: replaying the same
    * frame updates every row to the same values. Contract: one writer
    * per key range at a time (same as the reference's loader); keys
    * must be non-null.
    *
    * Rows shuffle-free: whatever partitioning `df` arrives with is the
    * write parallelism — repartition by key upstream if the source
    * frame is skewed. */
  def upsert(
      df: DataFrame,
      url: String,
      table: String,
      keyCols: Seq[String],
      batchSize: Int = 1000,
      driver: Option[String] = None): Unit = {
    val cols = df.schema.fieldNames.toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"keyCols $keyCols must be columns of the frame (${cols.mkString(",")})")
    val nonKeys = cols.filterNot(keyCols.contains)
    require(nonKeys.nonEmpty, "upsert needs at least one non-key column")
    val updateSql =
      s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${keyCols.map(c => s"$c = ?").mkString(" AND ")}"
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val driverClass = driver
    val colIdx = cols.map(c => c -> df.schema.fieldIndex(c)).toMap
    val keySeq = keyCols.toIndexedSeq
    val nonKeySeq = nonKeys.toIndexedSeq
    val colSeq = cols.toIndexedSeq
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      driverClass.foreach(Class.forName(_): Unit)
      val conn = DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val upd = conn.prepareStatement(updateSql)
        val ins = conn.prepareStatement(insertSql)
        try {
          rows.grouped(batchSize).foreach { batch =>
            flushBatch(conn, upd, ins, batch, keySeq, nonKeySeq, colSeq, colIdx)
          }
        } finally { upd.close(); ins.close() }
      } finally conn.close()
    }
  }

  /** One UPDATE batch; rows whose update count is 0 become one INSERT
    * batch; one commit for both — a crash replays the whole batch,
    * which the UPDATE path absorbs. */
  private def flushBatch(
      conn: Connection,
      upd: PreparedStatement,
      ins: PreparedStatement,
      batch: Seq[org.apache.spark.sql.Row],
      keyCols: IndexedSeq[String],
      nonKeys: IndexedSeq[String],
      cols: IndexedSeq[String],
      colIdx: Map[String, Int]): Unit = {
    batch.foreach { r =>
      var i = 1
      nonKeys.foreach { c => upd.setObject(i, r.get(colIdx(c))); i += 1 }
      keyCols.foreach { c => upd.setObject(i, r.get(colIdx(c))); i += 1 }
      upd.addBatch()
    }
    val counts = upd.executeBatch()
    batch.iterator.zip(counts.iterator)
      .collect { case (r, 0) => r }
      .foreach { r =>
        cols.zipWithIndex.foreach { case (c, i) =>
          ins.setObject(i + 1, r.get(colIdx(c)))
        }
        ins.addBatch()
      }
    ins.executeBatch()
    conn.commit()
  }
}
