package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the live HTTP JSON source —
  * `spark.read.format("graft-http").option("urls", ...).load()`.
  *
  * [[HttpSource.fetch]] already distributes the reference's REST loop
  * (`/root/reference/scripts/energy_etl.py:56-78`) via `mapPartitions`;
  * this wires the SAME per-URL bounded-retry fetch into Spark's
  * connector API so the source is a first-class table: it composes with
  * `spark.read`, shows up as `BatchScan graft-http` in `.explain`,
  * supports column pruning through `SupportsPushDownRequiredColumns`
  * (a `select(url, status)` audit never materializes response bodies
  * into rows), and slices the URL list into `parallelism` input
  * partitions so fetch bandwidth scales with the cluster while
  * honoring the polite-crawler bound (one in-flight request per
  * partition — the distributed analog of the reference's serial 5 s
  * pacing).
  *
  * At 100 TB the URL list is millions of (entity, day) pages: input
  * partitions stream URL slices, each reader holds ONE response in
  * memory at a time, and failed pages surface as quarantine rows
  * (status/error populated, body null) instead of failing the scan.
  *
  * Registered in
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`, so the
  * short name "graft-http" resolves without class-name plumbing.
  */
final class HttpTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-http"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpTableProvider.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HttpTable(new CaseInsensitiveStringMap(properties))
}

object HttpTableProvider {
  /** One row per requested URL — the [[HttpFetch]] shape. */
  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("status", IntegerType, nullable = false),
    StructField("body", StringType, nullable = true),
    StructField("attempts", IntegerType, nullable = false),
    StructField("error", StringType, nullable = true)))

  private[sources] def parseUrls(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw = options.get("urls")
    require(raw != null && raw.trim.nonEmpty,
      "graft-http requires option 'urls' (comma- or newline-separated)")
    raw.split("[,\n]").iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }
}

private final class HttpTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String =
    s"graft-http(${HttpTableProvider.parseUrls(options).size} urls)"

  override def schema(): StructType = HttpTableProvider.schema

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new HttpScanBuilder(options)
}

private final class HttpScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = HttpTableProvider.schema
  private var pushed: Array[Filter] = Array.empty

  /** Column pruning lands here: keep the table's field order but only
    * the requested names, so a status-only audit scan never carries
    * bodies in its rows. */
  override def pruneColumns(requiredSchema: StructType): Unit = {
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(HttpTableProvider.schema.filter(f => keep(f.name)))
  }

  /** Predicate pushdown: status comparisons and url prefixes are
    * evaluated in the reader right after the fetch (the fetch itself
    * must still happen — the rows being filtered ARE its result), so a
    * `status != 200` quarantine audit ships failure rows only instead
    * of every healthy body. url-prefix pushes cheaply because the URL
    * is known BEFORE the fetch — those pages are never requested at
    * all. Everything else stays residual in Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition(HttpFilters.supported)
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new HttpScan(
    HttpTableProvider.parseUrls(options),
    required,
    pushed,
    math.max(1, options.getInt("maxAttempts", 3)),
    math.max(0L, options.getLong("delayMs", 5000L)),
    math.max(1, options.getInt("parallelism", 8)))
}

/** The pushable subset: status range/equality, url prefix/equality,
  * IsNotNull on any column. Evaluated per fetched page in the reader
  * ([[HttpFilters.keep]]); url-only filters additionally prune the URL
  * list BEFORE fetching ([[HttpFilters.keepUrl]]). */
private object HttpFilters {
  def supported(f: Filter): Boolean = f match {
    case EqualTo("status" | "url", _) => true
    case GreaterThan("status", _) | GreaterThanOrEqual("status", _) => true
    case LessThan("status", _) | LessThanOrEqual("status", _) => true
    case StringStartsWith("url", _) => true
    case IsNotNull(_) => true
    case _ => false
  }

  /** Filters decidable from the URL alone — applied before fetching. */
  def keepUrl(filters: Array[Filter], url: String): Boolean = filters.forall {
    case EqualTo("url", v) => url == String.valueOf(v)
    case StringStartsWith("url", p) => url.startsWith(p)
    case _ => true
  }

  def keep(filters: Array[Filter], f: HttpFetch): Boolean = filters.forall {
    case EqualTo("status", v) => f.status == String.valueOf(v).toInt
    case GreaterThan("status", v) => f.status > String.valueOf(v).toInt
    case GreaterThanOrEqual("status", v) => f.status >= String.valueOf(v).toInt
    case LessThan("status", v) => f.status < String.valueOf(v).toInt
    case LessThanOrEqual("status", v) => f.status <= String.valueOf(v).toInt
    case EqualTo("url", v) => f.url == String.valueOf(v)
    case StringStartsWith("url", p) => f.url.startsWith(p)
    case IsNotNull("body") => f.body != null
    case IsNotNull("error") => f.error != null
    case IsNotNull(_) => true // url/status/attempts are never null
    case _ => true
  }
}

private final class HttpScan(
    urls: Seq[String],
    required: StructType,
    pushed: Array[Filter],
    maxAttempts: Int,
    delayMs: Long,
    parallelism: Int) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // url-decidable pushed filters prune BEFORE fetch: those pages are
    // never requested at all.
    val wanted = urls.filter(HttpFilters.keepUrl(pushed, _))
    val n = math.min(parallelism, math.max(1, wanted.size))
    // Round-robin, not contiguous slices: consecutive URLs usually hit
    // the same endpoint, so striping spreads each host's pages across
    // partitions instead of serializing them behind one reader.
    wanted.zipWithIndex.groupBy(_._2 % n).toArray.sortBy(_._1)
      .map { case (_, slice) => HttpInputPartition(slice.map(_._1).toArray) }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HttpReaderFactory(required, pushed, maxAttempts, delayMs)

  override def description(): String =
    s"graft-http: ${urls.size} urls, pushed=[${pushed.mkString(", ")}]"
}

private final case class HttpInputPartition(urls: Array[String]) extends InputPartition

private final class HttpReaderFactory(
    required: StructType,
    pushed: Array[Filter],
    maxAttempts: Int,
    delayMs: Long) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val urls = partition.asInstanceOf[HttpInputPartition].urls
    new PartitionReader[InternalRow] {
      private val fields = required.fieldNames
      private var i = 0
      private var row: InternalRow = _

      override def next(): Boolean = {
        while (i < urls.length) {
          val f = HttpSource.fetchOne(urls(i), maxAttempts, delayMs, Thread.sleep)
          i += 1
          if (HttpFilters.keep(pushed, f)) {
            row = InternalRow.fromSeq(fields.toSeq.map {
              case "url" => UTF8String.fromString(f.url)
              case "status" => f.status
              case "body" => if (f.body == null) null else UTF8String.fromString(f.body)
              case "attempts" => f.attempts
              case "error" => if (f.error == null) null else UTF8String.fromString(f.error)
            })
            return true
          }
        }
        false
      }

      override def get(): InternalRow = row

      override def close(): Unit = ()
    }
  }
}
