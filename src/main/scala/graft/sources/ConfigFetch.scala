package graft.sources

import java.io.InputStream
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.LocalDate
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.{Failure, Success, Try}

/** S1 connector seam — the reference downloads one gz-XML config
  * snapshot per day from a URL template and parses it
  * (/root/reference/R/1) Get-Historical-Configuration-Data-RunOnce.R:38-40
  * builds `…/{yyyyMMdd}/metro_config.xml.gz` per date and
  * `download.file`s it; the nightly at R/2) Get-…-RunDaily.R fetches
  * the current day).
  *
  * Split into transport and parse so the zero-egress build stays
  * testable: the transport is a pluggable `Fetcher` (url → stream);
  * production uses [[defaultFetcher]] (plain URL open), tests hand in
  * `file://` fixtures. Fetched bytes land in a local cache directory as
  * `metro_config_yyyyMMdd.xml.gz` — the name [[ConfigXml.dateFromPath]]
  * expects — and a cache hit skips the fetch entirely, so backfill
  * re-runs only pull missing days (idempotent, unlike the reference's
  * unconditional loop).
  *
  * Fetch is driver-side sequential (one small file per day — the remote
  * is a single web server, not a parallel store); PARSING the fetched
  * files is distributed via [[ConfigXml.readSnapshots]], one executor
  * task per file.
  */
object ConfigFetch {

  type Fetcher = String => InputStream

  /** Plain URL-open transport (http/https/file). */
  val defaultFetcher: Fetcher = url => new java.net.URI(url).toURL.openStream()

  /** Real HTTP transport (`java.net.http.HttpClient`): redirect-following,
    * connect/request timeouts, bounded retry with exponential backoff on
    * 5xx and transport-level failures (connect refused/reset, timeout).
    * 404 maps to `NoSuchFileException` — NOT retried — so [[fetchRange]]
    * records the day as missing (the reference's history has gaps);
    * other 4xx are non-retryable IOExceptions (a 403 won't fix itself).
    */
  def httpFetcher(connectTimeoutMs: Long = 10000L,
                  requestTimeoutMs: Long = 60000L,
                  retries: Int = 3,
                  backoffMs: Long = 200L): Fetcher = {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
      .build()
    url => {
      val req = HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
        .GET().build()
      var attempt = 0
      var result: InputStream = null
      var fatal: Throwable = null
      var retryable: Throwable = null
      while (result == null && fatal == null && attempt <= retries) {
        // exponent capped: an unclamped shift overflows to a negative
        // sleep (IllegalArgumentException) once conf-supplied retries
        // reach ~60; 2^20 × backoffMs is already an hours-scale ceiling
        if (attempt > 0) Thread.sleep(backoffMs << math.min(attempt - 1, 20))
        try {
          val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
          val code = resp.statusCode()
          if (code / 100 == 2) result = resp.body()
          else {
            resp.body().close()
            if (code == 404)
              fatal = new java.nio.file.NoSuchFileException(url, null, "HTTP 404")
            else if (code >= 500)
              retryable = new java.io.IOException(s"HTTP $code for $url")
            else
              fatal = new java.io.IOException(s"HTTP $code for $url")
          }
        } catch {
          case e: java.io.IOException => retryable = e
        }
        attempt += 1
      }
      if (fatal != null) throw fatal
      if (result == null) throw retryable
      result
    }
  }

  /** Transport selection by Spark conf — the production wiring:
    *
    *   spark.graft.fetch.transport = url | http     (default: url)
    *   spark.graft.fetch.connectTimeoutMs, .requestTimeoutMs,
    *   spark.graft.fetch.retries, .backoffMs        (http tuning)
    *
    * `url` is the plain stream-open (also serves `file://` fixtures);
    * `http` is [[httpFetcher]].
    */
  def fetcherFor(spark: SparkSession): Fetcher =
    spark.conf.get("spark.graft.fetch.transport", "url") match {
      case "url" => defaultFetcher
      case "http" => httpFetcher(
        spark.conf.get("spark.graft.fetch.connectTimeoutMs", "10000").toLong,
        spark.conf.get("spark.graft.fetch.requestTimeoutMs", "60000").toLong,
        spark.conf.get("spark.graft.fetch.retries", "3").toInt,
        spark.conf.get("spark.graft.fetch.backoffMs", "200").toLong)
      case other => throw new IllegalArgumentException(
        s"spark.graft.fetch.transport must be url|http, got '$other'")
    }

  private val Ymd = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** Expand a URL template for a date: `{yyyyMMdd}` and `{yyyy-MM-dd}`
    * placeholders (the reference pastes yyyyMMdd into the path).
    */
  def urlFor(template: String, date: LocalDate): String = template
    .replace("{yyyyMMdd}", date.format(Ymd))
    .replace("{yyyy-MM-dd}", date.toString)

  /** Cache path for a date. */
  def cachePath(cacheDir: String, date: LocalDate): Path =
    Paths.get(cacheDir, s"metro_config_${date.format(Ymd)}.xml.gz")

  /** Fetch one day into the cache (no-op on cache hit). Returns the
    * cached file. Downloads to a temp name then atomically moves, so a
    * crashed fetch never leaves a truncated file that a later run would
    * treat as a hit.
    */
  def fetch(template: String, date: LocalDate, cacheDir: String,
            fetcher: Fetcher = defaultFetcher): Path = {
    val target = cachePath(cacheDir, date)
    if (Files.exists(target)) return target
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent, ".fetch_", ".part")
    try {
      val in = fetcher(urlFor(template, date))
      try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
    target
  }

  /** Per-date outcome of a range fetch. */
  final case class FetchResult(fetched: Seq[Path], missing: Seq[(LocalDate, String)])

  /** Fetch a date range into the cache. Days the remote doesn't have
    * (the reference's history has gaps) are recorded, not fatal.
    */
  def fetchRange(template: String, dates: Seq[LocalDate], cacheDir: String,
                 fetcher: Fetcher = defaultFetcher): FetchResult = {
    val (ok, bad) = dates.map { d =>
      Try(fetch(template, d, cacheDir, fetcher)) match {
        case Success(p) => Left(p)
        case Failure(e) => Right(d -> e.getMessage)
      }
    }.partitionMap(identity)
    FetchResult(ok, bad)
  }

  /** One day: fetch (or cache-hit) then parse. */
  def readSnapshot(spark: SparkSession, template: String, date: LocalDate,
                   cacheDir: String, fetcher: Fetcher = defaultFetcher): DataFrame =
    ConfigXml.readSnapshot(spark, fetch(template, date, cacheDir, fetcher).toString)

  /** A date range: fetch all missing days, then parse exactly the
    * requested days in parallel (comma-joined path list → one task per
    * file), regardless of what else sits in the cache.
    */
  def readRange(spark: SparkSession, template: String, dates: Seq[LocalDate],
                cacheDir: String, fetcher: Fetcher = defaultFetcher): DataFrame = {
    val r = fetchRange(template, dates, cacheDir, fetcher)
    require(r.fetched.nonEmpty,
      s"no snapshot available for any of ${dates.size} dates; first error: ${r.missing.headOption}")
    ConfigXml.readSnapshots(spark, r.fetched.map(_.toString).mkString(","))
  }
}
