package graft

import org.apache.spark.sql.functions._

/** The cross-session parquet cache for heavy deterministic fixture
  * intermediates (VERDICT r10 item 5): hit/miss mechanics, staleness
  * invalidation on fixture regeneration, version bumps, and the
  * disabled mode. */
class FixtureCacheSpec extends SparkSpec {
  import graft.util.FixtureCache

  private def freshFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fc_fix").toString
    spark.range(10).select(col("id").as("doc_id"),
        concat(lit("w"), col("id")).as("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def withRoot[A](body: => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft_fc_root").toString
    sys.props("graft.cacheDir") = root
    try body finally sys.props.remove("graft.cacheDir"): Unit
  }

  test("miss builds + publishes once; later sessions replay the parquet " +
    "scan without re-running the build") {
    withRoot {
      val dir = freshFixture()
      var builds = 0
      def get() = FixtureCache.parquetBacked(spark, dir, "t", Seq("documents")) {
        builds += 1
        spark.read.parquet(s"$dir/documents.parquet")
          .groupBy(lit(1).as("g")).agg(count(lit(1)).as("n"), sum(col("doc_id")).as("s"))
      }
      val first = get().collect()
      assert(builds === 1)
      assert(first.head.getLong(1) === 10L && first.head.getLong(2) === 45L)
      // second call (a "new session" as far as the cache is concerned):
      // _SUCCESS present, build closure never runs
      val second = get().collect()
      assert(builds === 1, "cache hit must not re-run the build")
      assert(second.toSeq === first.toSeq)
    }
  }

  test("regenerating the input table invalidates the entry — a new " +
    "fingerprint can never serve stale rows") {
    withRoot {
      val dir = freshFixture()
      var builds = 0
      def get() = FixtureCache.parquetBacked(spark, dir, "t", Seq("documents")) {
        builds += 1
        spark.read.parquet(s"$dir/documents.parquet")
          .agg(sum(col("doc_id")).as("s"))
      }
      assert(get().head.getLong(0) === 45L)
      // regenerate the fixture with different content
      spark.range(5).select(col("id").as("doc_id"), lit("x").as("text"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      assert(get().head.getLong(0) === 10L, "stale cache served old rows")
      assert(builds === 2)
    }
  }

  test("a version bump invalidates; disabled mode always builds") {
    withRoot {
      val dir = freshFixture()
      var builds = 0
      def get(v: String) =
        FixtureCache.parquetBacked(spark, dir, "t", Seq("documents"), v) {
          builds += 1
          spark.range(1).select(lit(1L).as("one"))
        }
      get("1").collect(); get("1").collect()
      assert(builds === 1)
      get("2").collect()
      assert(builds === 2, "semantic version bump must rebuild")
      sys.props("graft.diskMemo") = "false"
      try {
        assert(!FixtureCache.enabled)
        get("1").collect(); get("1").collect()
        assert(builds === 4, "disabled mode must build every call")
      } finally sys.props.remove("graft.diskMemo"): Unit
    }
  }

  test("an EMPTY build result round-trips with its schema (the " +
    "degenerate-fixture shape: one doc yields zero candidate pairs)") {
    withRoot {
      val dir = freshFixture()
      val out = FixtureCache.parquetBacked(spark, dir, "empty", Seq("documents")) {
        spark.range(1).select(col("id").as("da"), col("id").as("db"))
          .filter(lit(false))
      }
      assert(out.columns.toSeq === Seq("da", "db"))
      assert(out.count() === 0L)
      // and the hit path reads the same empty-but-typed table back
      val hit = FixtureCache.parquetBacked(spark, dir, "empty", Seq("documents")) {
        fail("must not rebuild"); spark.range(1).toDF("x")
      }
      assert(hit.columns.toSeq === Seq("da", "db") && hit.count() === 0L)
    }
  }
}
