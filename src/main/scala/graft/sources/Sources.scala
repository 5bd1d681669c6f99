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
}
