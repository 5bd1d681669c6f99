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

  test("a LOGIC EDIT (different class bytecode) misses the old entry — " +
    "no version bump needed (VERDICT r11 item 2)") {
    withRoot {
      val dir = freshFixture()
      var builds = 0
      def get(logic: Seq[Class[_]]) =
        FixtureCache.parquetBacked(spark, dir, "t", Seq("documents"),
          logic = logic) {
          builds += 1
          spark.range(1).select(lit(1L).as("one"))
        }
      // LogicV1/LogicV2 stand in for "the same build before and after
      // an edit": same shape, one constant changed, distinct bytecode
      get(Seq(classOf[FixtureCacheSpec.LogicV1])).collect()
      get(Seq(classOf[FixtureCacheSpec.LogicV1])).collect()
      assert(builds === 1, "unchanged logic must hit")
      get(Seq(classOf[FixtureCacheSpec.LogicV2])).collect()
      assert(builds === 2, "recompiled (edited) logic must re-key and rebuild")
      // the hash is of the BYTECODE, not the name: stable per class,
      // distinct across the two bodies
      val h1 = FixtureCache.classBytesHash(classOf[FixtureCacheSpec.LogicV1])
      val h2 = FixtureCache.classBytesHash(classOf[FixtureCacheSpec.LogicV2])
      assert(h1 === FixtureCache.classBytesHash(classOf[FixtureCacheSpec.LogicV1]))
      assert(h1 !== h2)
      assert(h1.length === 16 && h2.length === 16,
        "must be a real digest, not the name-only fallback")
    }
  }

  test("bucketed entries publish once and re-register per session: a " +
    "key-equi self-join plans SMJ with NO exchange and NO sort on " +
    "either side (VERDICT r11 item 4)") {
    withRoot {
      val dir = freshFixture()
      var builds = 0
      def get() = FixtureCache.parquetBacked(spark, dir, "tb",
        Seq("documents"), buckets = Some((4, Seq("doc_id")))) {
        builds += 1
        spark.read.parquet(s"$dir/documents.parquet")
      }
      val first = get()
      assert(builds === 1)
      assert(first.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
        === (0L until 10L))
      assert(get().count() === 10L)
      assert(builds === 1, "bucketed hit must not rebuild")
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = get().join(get().select(col("doc_id"),
          col("text").as("t2")), "doc_id")
        assert(j.count() === 10L)
        val p = j.queryExecution.executedPlan.toString
        assert(p.contains("SortMergeJoin"), p)
        assert(p.contains("SelectedBucketsCount"), p)
        assert(!p.contains("hashpartitioning(doc_id"),
          "bucket co-location must eliminate both join-side shuffles\n" + p)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
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

  test("the bucket-count KNOB re-keys the entry (VERDICT r12 item 5): a " +
    "published layout can never disagree with its registered CLUSTERED " +
    "BY spec") {
    withRoot {
      val dir = freshFixture()
      var builds = 0
      def get() = FixtureCache.parquetBacked(spark, dir, "kb",
        Seq("documents"),
        buckets = Some((graft.util.Config.cacheBuckets, Seq("doc_id")))) {
        builds += 1
        spark.read.parquet(s"$dir/documents.parquet")
      }
      sys.props("graft.cacheBuckets") = "4"
      try {
        assert(graft.util.Config.cacheBuckets === 4)
        assert(get().count() === 10L && builds === 1)
        assert(get().count() === 10L && builds === 1, "same count must hit")
        sys.props("graft.cacheBuckets") = "2"
        assert(graft.util.Config.cacheBuckets === 2)
        assert(get().count() === 10L)
        assert(builds === 2, "a bucket-count change must re-key and rebuild")
        // and the fingerprints really differ on layout alone
        val f4 = FixtureCache.fingerprint(dir, Seq("documents"), "1",
          buckets = Some((4, Seq("doc_id"))))
        val f2 = FixtureCache.fingerprint(dir, Seq("documents"), "1",
          buckets = Some((2, Seq("doc_id"))))
        assert(f4 !== f2)
      } finally sys.props.remove("graft.cacheBuckets"): Unit
    }
  }

  test("a cacheDir switch within one JVM re-registers at the NEW root — " +
    "the per-session table name folds in the entry path, so a deleted " +
    "old root can never serve a silent zero-row scan (ADVICE r12)") {
    val dir = freshFixture()
    val root1 = java.nio.file.Files.createTempDirectory("graft_fc_r1").toString
    val root2 = java.nio.file.Files.createTempDirectory("graft_fc_r2").toString
    var builds = 0
    def get() = FixtureCache.parquetBacked(spark, dir, "rootsw",
      Seq("documents"), buckets = Some((4, Seq("doc_id")))) {
      builds += 1
      spark.read.parquet(s"$dir/documents.parquet")
    }
    def rmAll(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rmAll)
      f.delete(): Unit
    }
    sys.props("graft.cacheDir") = root1
    try {
      assert(get().count() === 10L && builds === 1)
      // The failure shape: root changes, root1 deleted, fingerprint
      // identical — pre-fix the registered table still pointed at
      // root1's LOCATION and the scan returned zero rows
      rmAll(new java.io.File(root1))
      sys.props("graft.cacheDir") = root2
      assert(get().count() === 10L,
        "new root must republish + re-register, never serve the dead LOCATION")
      assert(builds === 2)
    } finally sys.props.remove("graft.cacheDir"): Unit
  }

  test("an EMPTY BUCKETED build round-trips too — the schema rides the " +
    "sidecar, since zero part files means zero parquet footers") {
    withRoot {
      val dir = freshFixture()
      def get() = FixtureCache.parquetBacked(spark, dir, "eb",
        Seq("documents"), buckets = Some((4, Seq("da")))) {
        spark.range(1).select(col("id").as("da"), col("id").as("db"))
          .filter(lit(false))
      }
      assert(get().columns.toSeq === Seq("da", "db") && get().count() === 0L)
    }
  }
}

object FixtureCacheSpec {
  /** Two stand-ins for "one build, before and after a logic edit":
    * identical shape, one constant apart — so their class files differ
    * exactly the way a recompiled operator's would. */
  private[graft] class LogicV1 { def f(x: Long): Long = x + 1 }
  private[graft] class LogicV2 { def f(x: Long): Long = x + 2 }
}
