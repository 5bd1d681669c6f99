package graft

/** Tie-storm sweep: every declared query must run against a fixture
  * copy where each table is ONE row replicated ×20 — every value
  * identical, every ordering a 20-way tie, every variance exactly
  * zero. Real corpora contain constant slices (a stuck sensor, a
  * boilerplate mirror, a single-tenant partition); operators with
  * pinned tie rules must resolve them and statistics must go NULL,
  * not throw. (This sweep caught q_corr dying under Spark 4's
  * ANSI-mode corr() on a zero-variance group.) */
class TieStormSpec extends SparkSpec {

  test("all declared queries survive one-row-x20 all-tie input") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dup").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val one = spark.read.parquet(s"$sf/$t.parquet").limit(1)
      (1 to 20).map(_ => one).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failed = SparkEntry.all.keys.toSeq.sorted.flatMap { name =>
      try { SparkEntry.all(name).fn(spark, dir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} " +
          Option(e.getMessage).getOrElse("").take(120))
      }
    }
    assert(failed.isEmpty, failed.mkString("\n"))
  }
}
