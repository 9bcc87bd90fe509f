package graft.sources.vgsi

import graft.ingest.Source
import graft.sources.ScrapeResult

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Fetch function type: (baseUrl, pid) → page HTML. Production uses
  * [[VgsiSource.httpFetch]]; tests inject fixture HTML — the same seam the
  * reference's test suite uses (tests/test_engine.py:101-112).
  */
object VgsiSource {

  /** java.net.http GET with the reference's timeout (30 s); retries/backoff
    * live in the engine's Retry wrapper (S5 policy).
    */
  def httpFetch(timeoutSec: Long = 30): (String, Long) => String = {
    lazy val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(timeoutSec)).build()
    (baseUrl, pid) => {
      val req = HttpRequest
        .newBuilder(URI.create(VgsiParser.vgsiUrl(baseUrl, pid)))
        .timeout(Duration.ofSeconds(timeoutSec))
        .GET()
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new RuntimeException(s"HTTP ${resp.statusCode()} for pid $pid")
      resp.body()
    }
  }

  /** S8 — city-list extraction from the VGSI index page: hrefs whose last
    * path segment matches `<name>ct` (the reference's regex
    * `([\w]{2,}([cC][Tt])+)`, source.py:706-736); key = name minus the
    * state suffix.
    */
  def parseCityList(html: String): Map[String, String] = {
    val href = "(?i)href\\s*=\\s*[\"']([^\"']+)[\"']".r
    val cityPat = "([\\w]{2,}([cC][Tt])+)".r
    href
      .findAllMatchIn(html)
      .map(_.group(1))
      .flatMap { url =>
        val seg = url.stripSuffix("/").split("/").lastOption.getOrElse("")
        cityPat.findFirstMatchIn(seg).map { m =>
          val key = m.group(1).toLowerCase(java.util.Locale.ROOT).stripSuffix("ct")
          key -> url
        }
      }
      .toMap
  }
}

final case class VgsiSource(
    baseUrl: String,
    fetch: (String, Long) => String,
    override val ratePerSec: Double = 5.0,
    override val maxRetries: Int = 3,
    /** Photo byte fetcher; None disables the load-time photo hook even when
      * the engine's photoDir is set (tests inject fakes).
      */
    photoFetch: Option[String => Array[Byte]] = None
) extends Source {
  override def name: String = s"vgsi:$baseUrl"
  override def scrapeOne(pid: Long): ScrapeResult =
    VgsiParser.parse(fetch(baseUrl, pid), pid)

  /** One item per building photo — the reference's `_get_photo_items`
    * (source.py:672-679); default.jpg placeholders are filtered in
    * [[PhotoSink.downloadPhotos]]'s plan.
    */
  override def photoItems: Option[ScrapeResult => Seq[(String, Long)]] =
    photoFetch.map { _ => r =>
      r.buildings.flatMap(_.photo_url.map(_ -> r.property.pid))
    }

  override def fetchPhoto(url: String): Array[Byte] =
    photoFetch.fold(super.fetchPhoto(url))(_(url))
}
