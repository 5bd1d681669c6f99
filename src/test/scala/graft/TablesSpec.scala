package graft

import org.apache.spark.sql.types._

import graft.util.Tables

/** Pins the normalized fixture schemas — above all `events.ts`, whose
  * raw parquet type is TIMESTAMP(NANOS) and whose arrival type has
  * already drifted across Spark versions (≤4.0 + nanosAsLong → bigint
  * of nanos; 4.1+ → timestamp_ntz, the r5 red). Every downstream query
  * assumes the ONE normalized form Tables.events promises, so a future
  * Spark/parquet behavior change must fail HERE with a clear message,
  * not as DATATYPE_MISMATCH inside four unrelated queries. */
class TablesSpec extends SparkSpec {

  test("events.ts normalizes to session-TZ TimestampType (µs) on this Spark") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType,
      s"Tables.events must normalize ts to TimestampType; got " +
        s"${ev.schema("ts").dataType} on Spark ${spark.version} — " +
        "update the normalization branch in Tables.events")
  }

  test("events.ts values survive normalization (epoch cast + range sane)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the casts the restored queries rely on must analyze and produce
    // plausible epochs (fixture events are all post-2020, pre-2030)
    val bounds = Tables.events(spark, sf)
      .agg(min($"ts".cast("long")).as[Long], max($"ts".cast("long")).as[Long])
      .head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    assert(lo > 1577836800L && hi < 1893456000L, s"epoch range [$lo,$hi]")
  }

  test("fixture tables expose the columns the query surface assumes") {
    val expect = Map(
      "events" -> Set("event_id", "ts"),
      "documents" -> Set("doc_id", "text"),
      "embeddings" -> Set("vec_id", "embedding"))
    expect.foreach { case (t, cols) =>
      val have = Tables.load(spark, sf, t).schema.fieldNames.toSet ++
        (if (t == "events") Tables.events(spark, sf).schema.fieldNames.toSet
         else Set.empty[String])
      val missing = cols -- have
      assert(missing.isEmpty, s"$t missing columns: $missing")
    }
  }

  test("bucketSuffix: distinct fixture dirs never share a bucketed table, " +
    "even under String.hashCode collisions") {
    import graft.ops.Joins
    // "Aa" and "BB" are the canonical Java hashCode collision — the old
    // math.abs(dir.hashCode) memo key mapped both to ONE table
    assert("/tmp/Aa".hashCode === "/tmp/BB".hashCode)
    assert(Joins.bucketSuffix("/tmp/Aa") !== Joins.bucketSuffix("/tmp/BB"))
    // stable + canonicalizing: same dir through a redundant path → same key
    assert(Joins.bucketSuffix("/root/testdata/sf0.01") ===
      Joins.bucketSuffix("/root/testdata/./sf0.01/"))
    assert(Joins.bucketSuffix("/root/testdata/sf0.01") !==
      Joins.bucketSuffix("/root/testdata/sf0.001"))
    // well-formed table-name fragment: 16 lowercase hex chars
    assert(Joins.bucketSuffix(sf).matches("[0-9a-f]{16}"))
  }
}
