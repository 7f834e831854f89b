package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import java.time.LocalDate
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.functions._

class ConfigFetchSpec extends SparkSpec {
  import spark.implicits._

  private val xml =
    """<?xml version="1.0"?>
      |<tms_config>
      | <corridor route="I-94" dir="EB">
      |  <r_node name="rnd_1" n_type="Station" label="94/Main" lon="-93.2" lat="44.9"
      |          lanes="3" shift="0" s_limit="60" station_id="S1" attach_side="">
      |   <detector name="100" label="94E.1" category="" lane="1" field="500.5" abandoned="f"/>
      |   <detector name="101" label="94E.2" category="" lane="2" field="480.0" abandoned="f"/>
      |  </r_node>
      | </corridor>
      |</tms_config>""".stripMargin

  /** Lay out a fake remote: srcDir/{yyyyMMdd}/metro_config.xml.gz —
    * the reference's URL shape (R/1) Get-…-RunOnce.R:38-40).
    */
  private def remote(days: String*): (String, String) = {
    val src = Files.createTempDirectory("cfg_remote")
    days.foreach { ymd =>
      val d = Files.createDirectories(src.resolve(ymd))
      val out = new GZIPOutputStream(Files.newOutputStream(d.resolve("metro_config.xml.gz")))
      out.write(xml.getBytes("UTF-8")); out.close()
    }
    (s"file://$src/{yyyyMMdd}/metro_config.xml.gz",
      Files.createTempDirectory("cfg_cache").toString)
  }

  test("urlFor expands both placeholder styles") {
    val d = LocalDate.parse("2023-01-15")
    assert(ConfigFetch.urlFor("http://x/{yyyyMMdd}/c.xml.gz", d) ==
      "http://x/20230115/c.xml.gz")
    assert(ConfigFetch.urlFor("http://x/{yyyy-MM-dd}.gz", d) ==
      "http://x/2023-01-15.gz")
  }

  test("fetch caches under the dateFromPath-compatible name; cache hit skips transport") {
    val (tpl, cache) = remote("20230115")
    var calls = 0
    val counting: ConfigFetch.Fetcher = u => { calls += 1; ConfigFetch.defaultFetcher(u) }
    val d = LocalDate.parse("2023-01-15")
    val p1 = ConfigFetch.fetch(tpl, d, cache, counting)
    val p2 = ConfigFetch.fetch(tpl, d, cache, counting)
    assert(p1 == p2 && calls == 1)
    assert(p1.getFileName.toString == "metro_config_20230115.xml.gz")
    assert(ConfigXml.dateFromPath(p1.toString) == this.d("2023-01-15"))
  }

  test("readSnapshot: fetch + parse end-to-end over file:// transport (S1)") {
    val (tpl, cache) = remote("20230115")
    val df = ConfigFetch.readSnapshot(spark, tpl, LocalDate.parse("2023-01-15"), cache)
    assert(df.count() == 2)
    assert(df.select($"CORRIDOR_ROUTE").distinct().as[String].collect().toSeq == Seq("I-94"))
  }

  test("httpFetcher over a real socket: 503s retried with backoff, 404 is a " +
    "missing day, cache hit skips the network, conf selects the transport") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val gzBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new GZIPOutputStream(bos)
      out.write(xml.getBytes("UTF-8")); out.close()
      bos.toByteArray
    }
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/cfg/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val n = hits.incrementAndGet()
        if (n <= 2) ex.sendResponseHeaders(503, -1) // flaky warm-up: retry path
        else if (ex.getRequestURI.getPath.contains("20230115")) {
          ex.sendResponseHeaders(200, gzBytes.length.toLong)
          ex.getResponseBody.write(gzBytes)
        } else ex.sendResponseHeaders(404, -1)
        ex.close()
      }
    })
    server.start()
    try {
      val tpl = s"http://127.0.0.1:${server.getAddress.getPort}" +
        "/cfg/{yyyyMMdd}/metro_config.xml.gz"
      val cache = Files.createTempDirectory("cfg_http_cache").toString
      // transport selected by conf, not hard-wired
      spark.conf.set("spark.graft.fetch.transport", "http")
      spark.conf.set("spark.graft.fetch.retries", "3")
      spark.conf.set("spark.graft.fetch.backoffMs", "5")
      val f = try ConfigFetch.fetcherFor(spark)
      finally {
        spark.conf.unset("spark.graft.fetch.transport")
        spark.conf.unset("spark.graft.fetch.retries")
        spark.conf.unset("spark.graft.fetch.backoffMs")
      }
      assert(ConfigFetch.fetcherFor(spark) eq ConfigFetch.defaultFetcher) // default
      val day = LocalDate.parse("2023-01-15")
      val p = ConfigFetch.fetch(tpl, day, cache, f)
      assert(hits.get == 3, "two 503s then the 200") // retried over the socket
      val df = ConfigXml.readSnapshot(spark, p.toString)
      assert(df.count() == 2) // fetched bytes parse end-to-end
      ConfigFetch.fetch(tpl, day, cache, f)
      assert(hits.get == 3) // cache hit: no request
      // missing remote day: exactly one request (404 never retries)
      val fr = ConfigFetch.fetchRange(tpl,
        Seq(day, LocalDate.parse("2023-01-16")), cache, f)
      assert(fr.fetched.size == 1 &&
        fr.missing.map(_._1) == Seq(LocalDate.parse("2023-01-16")))
      assert(hits.get == 4)
    } finally server.stop(0)
  }

  test("readRange: missing remote days are skipped, not fatal; only requested days parse") {
    val (tpl, cache) = remote("20230115", "20230117", "20230118")
    val want = Seq("2023-01-15", "2023-01-16", "2023-01-17").map(LocalDate.parse)
    val fr = ConfigFetch.fetchRange(tpl, want, cache)
    assert(fr.fetched.size == 2 && fr.missing.map(_._1) == Seq(LocalDate.parse("2023-01-16")))
    val df = ConfigFetch.readRange(spark, tpl, want, cache)
    // 2 days × 2 detectors; the cached-but-unrequested 18th is not read
    assert(df.count() == 4)
    assert(df.select(countDistinct($"LAST_CHANGE_DATE")).head().getLong(0) == 2)
  }
}
