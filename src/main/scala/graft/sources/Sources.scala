package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-side resilience (SURVEY.md §2.1 "retry-on-failure read"):
  * the reference retries each HTTP fetch 3× and skips the (zone, day) on
  * exhaustion (energy_etl.py:61-78). On Spark the transport retry is
  * task-level (`spark.task.maxFailures`); what the ENGINE owns is
  * malformed-RECORD tolerance, which the reference gets implicitly by
  * `response.json()` raising and the record being skipped. These helpers
  * make that contract explicit for semi-structured ingest.
  *
  * Scale note: PERMISSIVE parsing is per-record and narrow; quarantined
  * rows stay in the same scan (no second read of a 100 TB input).
  */
object Sources {

  /** Parse a JSON-lines column with an explicit schema, PERMISSIVE mode:
    * malformed records land in `_corrupt` instead of failing the job —
    * the engine-side analog of the reference's skip-on-bad-payload.
    * Returns (good, quarantined). */
  def jsonWithQuarantine(
      df: DataFrame, jsonCol: String, schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt", StringType)
    val parsed = df.withColumn("_rec",
      from_json(col(jsonCol), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")))
    val good = parsed.filter(col("_rec._corrupt").isNull)
      .select(col("_rec.*")).drop("_corrupt")
    val bad = parsed.filter(col("_rec._corrupt").isNotNull)
      .select(col(jsonCol).as("raw_record"))
    (good, bad)
  }

  /** Strict variant: FAILFAST — schema drift aborts the run (the
    * reference's BigQuery load-time schema enforcement, :92-97). */
  def jsonStrict(df: DataFrame, jsonCol: String, schema: StructType): DataFrame =
    df.select(from_json(col(jsonCol), schema, Map("mode" -> "FAILFAST")).as("_rec"))
      .select(col("_rec.*"))

  /** Read JSON files with an explicit schema and a quarantine column —
    * file-based equivalent of [[jsonWithQuarantine]]. */
  def readJsonFiles(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Read CSV files with an explicit schema and a quarantine column —
    * the delimited-file twin of [[readJsonFiles]], same PERMISSIVE
    * contract: rows whose fields fail to parse against the declared
    * types land with `_corrupt` populated (the raw line) instead of
    * failing the job. `header` defaults true (the common export
    * shape); parsing is per-record and narrow, so quarantine costs no
    * second read of a 100 TB input.
    *
    * Caveat (applies to [[readJsonFiles]] too — Spark's file-source
    * contract): a query that references ONLY `_corrupt` (e.g. a bare
    * quarantine count) is rejected on the raw scan
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache or persist the parsed
    * frame first, or select a data column alongside. */
  def readCsvFiles(spark: SparkSession, path: String, schema: StructType,
                   header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** A source partition (e.g. a (zone, day) fetch) that exhausted its
    * retries and was skipped. */
  final case class FailedPartition(key: String, attempts: Int, lastError: String)

  /** Result of a retried multi-partition read: the union of successful
    * fetches (None when every key exhausted), plus the quarantine list
    * and per-key attempt counts — the observability the reference's
    * print-and-skip loop only logs. */
  final case class RetryRead(
      data: Option[DataFrame],
      quarantined: Seq[FailedPartition],
      attempts: Map[String, Int])

  /** Bounded-retry read over a keyed partition list — the explicit
    * engine analog of the reference's fetch loop (energy_etl.py:61-78:
    * 3 attempts per (zone, day), fixed sleep between attempts, skip the
    * partition on exhaustion and keep going). Each `fetch(key)` builds
    * one partition's DataFrame (REST page, JDBC slice, file batch…); a
    * throw triggers a retry after `delayMs`, and a key that exhausts
    * `maxAttempts` is quarantined instead of failing the run — partial
    * data plus a quarantine manifest beats an all-or-nothing job at
    * 100 TB. `sleep` is injectable so tests assert the backoff without
    * waiting it out. Distinct from `spark.task.maxFailures` (which
    * retries tasks INSIDE an already-built scan): this loop governs
    * source construction itself, where the reference's failures live. */
  def readWithRetry(
      keys: Seq[String],
      maxAttempts: Int = 3,
      delayMs: Long = 5000L,
      sleep: Long => Unit = Thread.sleep)(
      fetch: String => DataFrame): RetryRead = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    val results = Seq.newBuilder[DataFrame]
    val failed = Seq.newBuilder[FailedPartition]
    val attempts = Map.newBuilder[String, Int]
    keys.foreach { key =>
      var attempt = 0
      var done = false
      var lastErr = ""
      while (!done && attempt < maxAttempts) {
        attempt += 1
        try {
          results += fetch(key)
          done = true
        } catch {
          case scala.util.control.NonFatal(e) =>
            lastErr = String.valueOf(e.getMessage)
            if (attempt < maxAttempts) sleep(delayMs)
        }
      }
      attempts += key -> attempt
      if (!done) failed += FailedPartition(key, attempt, lastErr)
    }
    val good = results.result()
    RetryRead(good.reduceOption(_ unionByName _), failed.result(),
      attempts.result())
  }
}
