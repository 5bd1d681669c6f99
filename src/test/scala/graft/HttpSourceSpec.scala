package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{HttpSource, Sources}

/** Drives the live HTTP JSON source end-to-end against a loopback
  * server: healthy pages, a transiently-failing endpoint that recovers
  * within the retry budget (the reference's energy_etl.py:61-78
  * contract), a permanently-dead endpoint that lands in quarantine
  * instead of failing the job, and the fetch→parse pipeline with
  * malformed-payload quarantine. */
class HttpSourceSpec extends SparkSpec {

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def withServer(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val flakyCalls = new AtomicInteger(0)
    server.createContext("/ok1", (ex: HttpExchange) =>
      respond(ex, 200, """{"zone":"SE1","mwh":100}"""))
    server.createContext("/ok2", (ex: HttpExchange) =>
      respond(ex, 200, """{"zone":"SE2","mwh":250}"""))
    server.createContext("/flaky", (ex: HttpExchange) =>
      if (flakyCalls.incrementAndGet() < 3) respond(ex, 500, "boom")
      else respond(ex, 200, """{"zone":"SE3","mwh":77}"""))
    server.createContext("/dead", (ex: HttpExchange) =>
      respond(ex, 503, "down"))
    server.createContext("/garbage", (ex: HttpExchange) =>
      respond(ex, 200, """not json at all"""))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("distributed fetch: retries transient failures, quarantines dead endpoints") {
    withServer { base =>
      import spark.implicits._
      val urls = Seq(s"$base/ok1", s"$base/ok2", s"$base/flaky", s"$base/dead")
      val got = HttpSource.fetch(spark, urls, maxAttempts = 3, delayMs = 0L)
        .collect().map(r => r.url -> r).toMap
      assert(got(s"$base/ok1").status === 200)
      assert(got(s"$base/ok1").attempts === 1)
      assert(got(s"$base/flaky").status === 200) // recovered on 3rd try
      assert(got(s"$base/flaky").attempts === 3)
      assert(got(s"$base/flaky").body.contains("SE3"))
      assert(got(s"$base/dead").status === 503) // exhausted, not thrown
      assert(got(s"$base/dead").body === null)
      assert(got(s"$base/dead").error === "HTTP 503")
      // the job survived a dead endpoint: 3 of 4 pages fetched
      assert(got.values.count(_.body != null) === 3)
    }
  }

  test("RatePacer enforces the pacing floor: N acquires sleep at least " +
    "(N - burst) intervals; a burst allowance passes through unslept") {
    // deterministic fake clock: sleep() advances it (the pacer's only
    // time source), so the assertion is exact, not wall-clock-dependent
    var clock = 0L
    var slept = 0L
    val sleep: Long => Unit = ms => { slept += ms; clock += ms }
    val pacer = new HttpSource.RatePacer(
      minIntervalMs = 1000L, burst = 2, now = () => clock, sleep = sleep)
    pacer.acquire(); pacer.acquire() // burst: immediate
    assert(slept === 0L)
    (1 to 8).foreach(_ => pacer.acquire())
    // 10 acquires, burst 2 → at least 8 full intervals of enforced wait
    assert(slept >= 8000L, s"slept only $slept ms")
    // and the pacer never over-throttles a compliant clock: exactly 8
    assert(slept === 8000L, s"slept $slept ms")
    // idle refill: waiting 3 intervals buys back (up to burst) tokens
    clock += 3000L
    val before = slept
    pacer.acquire(); pacer.acquire() // refilled-to-burst: immediate
    assert(slept === before)
  }

  test("RatePacer survives a backwards clock step: a time reversal earns " +
    "no tokens but costs none — the next waits stay one-interval bounded") {
    var clock = 1000000L
    var slept = 0L
    val sleep: Long => Unit = ms => { slept += ms; clock += ms }
    val pacer = new HttpSource.RatePacer(
      minIntervalMs = 1000L, burst = 1, now = () => clock, sleep = sleep)
    pacer.acquire() // burst token
    clock -= 600000L // NTP step-back of 10 minutes between requests
    // pre-clamp this drove tokens to -600: the next acquire would sleep
    // ~601 s (ADVICE r10 #1). Clamped, it owes at most one interval.
    pacer.acquire()
    assert(slept <= 1000L, s"slept $slept ms after a backwards step")
    (1 to 5).foreach(_ => pacer.acquire())
    // steady state resumes: exactly one interval per subsequent acquire
    assert(slept <= 6000L, s"slept $slept ms")
  }

  test("fetch with minIntervalMs paces request starts (loopback floor)") {
    withServer { base =>
      val urls = Seq(s"$base/ok1", s"$base/ok2", s"$base/ok1", s"$base/ok2")
      val t0 = System.nanoTime()
      val got = HttpSource.fetch(spark, urls, maxAttempts = 1, delayMs = 0L,
        parallelism = 1, minIntervalMs = 150L).collect()
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(got.count(_.status == 200) === 4)
      // 4 requests through one partition, burst 1 → ≥ 3 full intervals
      // of enforced pacing on top of the transfer time itself
      assert(elapsedMs >= 450.0, s"elapsed only $elapsedMs ms")
    }
  }

  test("pollingIngest: each trigger fetches over HTTP and appends to the sink") {
    withServer { base =>
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val sink = java.nio.file.Files.createTempDirectory("graft_poll").toString + "/sink"
      val ckpt = java.nio.file.Files.createTempDirectory("graft_poll_ck").toString
      val ticks = MemoryStream[Long](spark)
      val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
      val q = graft.streaming.Streams.pollingIngest(
        ticks.toDF(), sink, ckpt) { _ =>
        fetches.incrementAndGet()
        // the reference loop body: fetch live pages, keep the healthy ones
        HttpSource.fetch(spark, Seq(s"$base/ok1", s"$base/ok2"),
            maxAttempts = 1, delayMs = 0L)
          .filter(col("status") === 200)
          .select(col("url"), col("body"))
      }
      try {
        ticks.addData(1L); q.processAllAvailable()
        ticks.addData(2L); q.processAllAvailable()
        assert(fetches.get() === 2) // one fetch per trigger tick
        val rows = spark.read.parquet(sink)
        assert(rows.count() === 4)  // 2 pages appended per tick
        assert(rows.filter(col("body").contains("SE1")).count() === 2)
      } finally q.stop()
    }
  }

  test("fetch -> parse pipeline with malformed-payload quarantine") {
    withServer { base =>
      import spark.implicits._
      val schema = StructType(Seq(
        StructField("zone", StringType), StructField("mwh", LongType)))
      val pages = HttpSource.fetch(spark,
          Seq(s"$base/ok1", s"$base/ok2", s"$base/garbage"),
          maxAttempts = 1, delayMs = 0L)
        .filter(col("status") === 200).toDF()
      val (good, bad) = Sources.jsonWithQuarantine(pages, "body", schema)
      val rows = good.select($"zone", $"mwh").as[(String, Long)]
        .collect().toSet
      assert(rows === Set(("SE1", 100L), ("SE2", 250L)))
      assert(bad.count() === 1) // the non-JSON page, quarantined not thrown
    }
  }
}
