package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8

/** S9 HTTP API parity: every reference route answers over the engine
  * stores, envelope and error codes matching
  * services-preview/api-service (app.py:76-83, utils/errors.py:7-35),
  * and the data agrees with direct engine queries on the same session.
  */
class ApiSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  private lazy val martRoot =
    java.nio.file.Files.createTempDirectory("graft-api-mart").toString
  private lazy val server = {
    // a mart table for /api/indicator (the ATR scanner's snapshot rows)
    val atr = indicators.Ewma.queries("i02_atr")(spark, TestSession.sf)
    operators.Mart.upsertMart(spark,
      s"$martRoot/${operators.Mart.tableDirName("ATR波幅扫描器")}",
      operators.Mart.asMartRow(atr, "1m"))
    val fired = operators.Signals.queries("g02_signal_cooldown")(
      spark, TestSession.sf)
    Api.start(spark, TestSession.sf, Some(martRoot), Some(fired))
  }

  private def get(pathAndQuery: String): JsonNode = {
    val port = server.getAddress.getPort
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$pathAndQuery"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 200)
    mapper.readTree(resp.body())
  }

  test("health endpoint answers with the CoinGlass envelope") {
    val j = get("/api/health")
    assert(j.get("code").asText() == "0")
    assert(j.get("success").asBoolean())
    assert(j.get("data").get("status").asText() == "healthy")
  }

  test("supported-coins lists the engine's distinct symbols") {
    val j = get("/api/futures/supported-coins")
    val served = (0 until j.get("data").size())
      .map(j.get("data").get(_).asText()).toSet
    val expected = Tables.candles(spark, TestSession.sf)
      .select("symbol").distinct().collect().map(_.getString(0)).toSet
    assert(served == expected)
  }

  test("ohlc history serves the engine roll-up, ascending, limit-bounded") {
    val sym = Tables.candles(spark, TestSession.sf)
      .select("symbol").distinct().orderBy("symbol").head.getString(0)
    val j = get(s"/api/futures/ohlc/history?symbol=$sym&interval=1h&limit=5")
    assert(j.get("code").asText() == "0")
    val data = j.get("data")
    assert(data.size() == 5)
    val times = (0 until data.size()).map(data.get(_).get("time").asLong())
    assert(times == times.sorted, "rows must be time-ascending")
    // values match the direct roll-up query (reference reads its cagg)
    val expected = operators.Rollup.rollup(
        Tables.candles(spark, TestSession.sf).filter(col("symbol") === sym),
        3600L)
      .orderBy(col("bucket_ts").desc).limit(5)
      .collect().reverse
    (0 until 5).foreach { i =>
      assert(data.get(i).get("time").asLong() ==
        expected(i).getAs[Long]("bucket_ts") * 1000L)
      assert(math.abs(data.get(i).get("close").asText().toDouble -
        expected(i).getAs[Double]("close")) < 1e-9)
    }
  }

  test("invalid interval and missing params return reference error codes") {
    assert(get("/api/futures/ohlc/history?symbol=X&interval=7m")
      .get("code").asText() == Api.Code.InvalidInterval)
    assert(get("/api/futures/ohlc/history?interval=1h")
      .get("code").asText() == Api.Code.ParamError)
    assert(get("/api/nope").get("code").asText() == Api.Code.ParamError)
  }

  test("every limit-taking route clamps limit to 1000 (driver-side collects stay bounded)") {
    // round-5 VERDICT #4: these routes .collect() — acceptable ONLY
    // because the reference's own API contract caps limit at 1000
    // (api-service/src/routers/ohlc.py:22). A route that honored a
    // limit=10^9 request would materialize the corpus on the driver.
    val sym = Tables.candles(spark, TestSession.sf)
      .select("symbol").distinct().orderBy("symbol").head.getString(0)
    val routes = Seq(
      s"/api/futures/ohlc/history?symbol=$sym&interval=1m",
      s"/api/futures/open-interest/history?symbol=$sym",
      s"/api/futures/funding-rate/history?symbol=$sym",
      s"/api/futures/metrics?symbol=$sym",
      s"/api/indicator/data?table=${URLEncoder.encode("ATR波幅扫描器", UTF_8)}")
    routes.foreach { r =>
      val j = get(s"$r&limit=2000000000")
      assert(j.get("code").asText() == "0", s"route $r rejected a large limit: $j")
      assert(j.get("data").size() <= 1000,
        s"route $r served ${j.get("data").size()} rows — limit clamp missing")
      // and a zero/negative limit floors at 1, never errors or drains
      val j0 = get(s"$r&limit=-5")
      assert(j0.get("code").asText() == "0" && j0.get("data").size() <= 1,
        s"route $r mishandled a negative limit: $j0")
    }
    // malformed limit is a parameter error, not an internal one
    assert(get(s"/api/futures/ohlc/history?symbol=$sym&interval=1m&limit=abc")
      .get("code").asText() == Api.Code.ParamError)
  }

  test("indicator list and data serve the mart store with its contract columns") {
    val tbl = URLEncoder.encode("ATR波幅扫描器", UTF_8)
    val list = get("/api/indicator/list")
    assert((0 until list.get("data").size())
      .map(list.get("data").get(_).asText()).contains("ATR波幅扫描器"))

    val sym = Tables.candles(spark, TestSession.sf)
      .select("symbol").distinct().orderBy("symbol").head.getString(0)
    val data = get(s"/api/indicator/data?table=$tbl&symbol=$sym&limit=3")
      .get("data")
    assert(data.size() > 0 && data.size() <= 3)
    assert(data.get(0).has("交易对") && data.get(0).has("周期") &&
      data.get(0).has("数据时间"))
    assert(data.get(0).get("交易对").asText() == sym)

    assert(get("/api/indicator/data?table=missing")
      .get("code").asText() == Api.Code.TableNotFound)
  }

  test("metrics family endpoints serve the futures fact") {
    val sym = Tables.metrics5m(spark, TestSession.sf)
      .select("symbol").distinct().orderBy("symbol").head.getString(0)
    val m = get(s"/api/futures/metrics?symbol=$sym&limit=4").get("data")
    assert(m.size() == 4)
    assert(m.get(0).has("openInterest") && m.get(0).has("longShortRatio"))
    val oi = get(s"/api/futures/open-interest/history?symbol=$sym&limit=4")
      .get("data")
    assert(oi.size() == 4)
    // OHLC-style gauge: all four legs carry the same value (reference shape)
    assert(oi.get(0).get("open").asText() == oi.get(0).get("close").asText())
    val fr = get(s"/api/futures/funding-rate/history?symbol=$sym&limit=4")
      .get("data")
    assert(fr.size() == 4)
  }

  test("signal cooldown serves latest-fired anchors, newest first") {
    val j = get("/api/signal/cooldown")
    val data = j.get("data")
    assert(data.size() > 0)
    val ts = (0 until data.size()).map(data.get(_).get("timestamp").asLong())
    assert(ts == ts.sorted.reverse, "cooldown rows must be timestamp-desc")
    assert(data.get(0).get("key").asText().contains(":"))
  }
}
