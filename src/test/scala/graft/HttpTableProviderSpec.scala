package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The DataSource V2 surface of the HTTP source: `spark.read
  * .format("graft-http")` against a loopback server. Pins the three
  * contracts the connector adds over [[graft.sources.HttpSource.fetch]]:
  * short-name registration resolves, column pruning reaches the scan
  * (`SupportsPushDownRequiredColumns`), and the retry/quarantine
  * semantics survive the connector path unchanged. */
class HttpTableProviderSpec extends SparkSpec {

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
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("format(\"graft-http\") reads, retries, and quarantines like the fetch API") {
    withServer { base =>
      val urls = Seq(s"$base/ok1", s"$base/ok2", s"$base/flaky", s"$base/dead")
      val df = spark.read.format("graft-http")
        .option("urls", urls.mkString(","))
        .option("maxAttempts", 3).option("delayMs", 0)
        .load()
      assert(df.schema.fieldNames.toSeq ===
        Seq("url", "status", "body", "attempts", "error"))
      val got = df.collect().map(r => r.getString(0) -> r).toMap
      assert(got.size === 4)
      assert(got(s"$base/ok1").getInt(1) === 200)
      assert(got(s"$base/flaky").getInt(1) === 200)  // recovered on 3rd try
      assert(got(s"$base/flaky").getInt(3) === 3)
      assert(got(s"$base/dead").getInt(1) === 503)   // exhausted, not thrown
      assert(got(s"$base/dead").isNullAt(2))
      assert(got(s"$base/dead").getString(4) === "HTTP 503")
    }
  }

  test("column pruning reaches the scan: a status audit never reads bodies into rows") {
    withServer { base =>
      val df = spark.read.format("graft-http")
        .option("urls", s"$base/ok1,$base/ok2")
        .option("maxAttempts", 1).option("delayMs", 0)
        .load()
        .select("url", "status")
      val scans = df.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b }
      assert(scans.size === 1)
      assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("url", "status"))
      assert(df.filter(col("status") === 200).count() === 2)
    }
  }

  test("parallelism slices the URL list; composes with SQL over a temp view") {
    withServer { base =>
      val urls = (1 to 5).flatMap(_ => Seq(s"$base/ok1", s"$base/ok2"))
      val df = spark.read.format("graft-http")
        .option("urls", urls.mkString("\n"))  // newline-separated form
        .option("maxAttempts", 1).option("delayMs", 0)
        .option("parallelism", 3)
        .load()
      assert(df.rdd.getNumPartitions === 3)
      df.createOrReplaceTempView("http_pages")
      val agg = spark.sql(
        """SELECT get_json_object(body, '$.zone') AS zone, COUNT(*) AS n
          |FROM http_pages WHERE status = 200 GROUP BY 1 ORDER BY 1""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(agg.toSeq === Seq(("SE1", 5L), ("SE2", 5L)))
    }
  }

  test("url-prefix pushdown prunes pages BEFORE fetch; status pushdown filters in the reader") {
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      hits.incrementAndGet()
      if (ex.getRequestURI.getPath.startsWith("/bad")) respond(ex, 503, "down")
      else respond(ex, 200, """{"ok":true}""")
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val urls = Seq(s"$base/a/1", s"$base/a/2", s"$base/b/1", s"$base/bad/1")
      def read() = spark.read.format("graft-http")
        .option("urls", urls.mkString(","))
        .option("maxAttempts", 1).option("delayMs", 0)
        .load()
      // url prefix is decidable pre-fetch: only the 2 matching pages are requested
      hits.set(0)
      val a = read().filter(col("url").startsWith(s"$base/a/")).collect()
      assert(a.length === 2)
      assert(hits.get() === 2)
      // status filter can't skip the fetch, but the reader drops healthy rows
      hits.set(0)
      val quarantine = read().filter(col("status") >= 500).collect()
      assert(quarantine.length === 1)
      assert(quarantine.head.getInt(1) === 503)
      assert(hits.get() === 4) // every page fetched — rows filtered at source
    } finally server.stop(0)
  }

  test("missing urls option fails fast with a clear message") {
    val e = intercept[Exception] {
      spark.read.format("graft-http").load().collect()
    }
    assert(e.getMessage.contains("urls"))
  }
}
