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

  /** Trust-all context for the reference's TLS stance, scoped to ONE
    * client: some gis.vgsi.com city hosts serve self-signed certs, so the
    * reference builds a dedicated session with verification off rather
    * than disabling it process-wide (source.py:30-33 —
    * `_session.verify = False`). Unlike the reference, verification is ON
    * by default here — www.vgsi.com (the city index) and photo hosts
    * present CA-signed certs, and silently accepting any cert for those
    * invites MITM of the scrape — so this context is built only when a
    * caller explicitly opts out (`--no-verify-tls` on the CLI) for the
    * self-signed city hosts.
    */
  private def trustAllContext(): javax.net.ssl.SSLContext = {
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, Array[javax.net.ssl.TrustManager](new javax.net.ssl.X509TrustManager {
      override def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
    }), new java.security.SecureRandom())
    ctx
  }

  private def newClient(timeoutSec: Long, verifyTls: Boolean): HttpClient = {
    val b = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(timeoutSec))
      // follow redirects like the reference's requests session (GET
      // follows by default there); NORMAL refuses only https→http
      // downgrades
      .followRedirects(HttpClient.Redirect.NORMAL)
    (if (verifyTls) b else b.sslContext(trustAllContext())).build()
  }

  private def send(client: HttpClient, url: String, timeoutSec: Long): HttpResponse[String] = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSec)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    // >= 300, not >= 400: redirects are followed above, so any 3xx still
    // here is an unfollowable one — its stub body parsed as a parcel page
    // would write all-null rows as "successful" scrapes
    if (resp.statusCode() >= 300)
      throw new RuntimeException(s"HTTP ${resp.statusCode()} for $url")
    resp
  }

  /** Rethrow a TLS handshake failure WITH THE FLAG THAT HEALS IT named:
    * verification is on by default (a deliberate hardening over the
    * reference's verify=False), but the primary scrape targets —
    * self-signed gis.vgsi.com city hosts — then fail every fetch, and
    * the bare SSLHandshakeException gives the operator no hint that
    * `--no-verify-tls` (CLI) / `verifyTls = false` is the opt-out. Only
    * wraps when verification was actually ON (with it off, a handshake
    * failure is a different problem the hint would mis-diagnose).
    */
  private[graft] def tlsHint[T](verifyTls: Boolean, url: String)(body: => T): T =
    try body
    catch {
      case e: javax.net.ssl.SSLHandshakeException if verifyTls =>
        throw new RuntimeException(
          s"TLS handshake failed for $url with certificate verification ON — " +
            "gis.vgsi.com city hosts are commonly self-signed; pass --no-verify-tls " +
            "(CLI) or verifyTls = false to opt out for these hosts",
          e)
    }

  /** java.net.http GET with the reference's timeout (30 s); retries/backoff
    * live in the engine's Retry wrapper (S5 policy).
    */
  def httpFetch(timeoutSec: Long = 30, verifyTls: Boolean = true): (String, Long) => String = {
    lazy val client = newClient(timeoutSec, verifyTls)
    (baseUrl, pid) => {
      val url = VgsiParser.vgsiUrl(baseUrl, pid)
      tlsHint(verifyTls, url)(send(client, url, timeoutSec).body())
    }
  }

  /** Plain GET of one URL (the city-index page). Same client policy as
    * [[httpFetch]].
    */
  def httpGet(url: String, timeoutSec: Long = 30, verifyTls: Boolean = true): String =
    tlsHint(verifyTls, url)(send(newClient(timeoutSec, verifyTls), url, timeoutSec).body())

  /** Binary GET (photo bytes) as a reusable fetcher for
    * [[VgsiSource.photoFetch]].
    */
  def httpGetBytes(timeoutSec: Long = 30, verifyTls: Boolean = true): String => Array[Byte] = {
    lazy val client = newClient(timeoutSec, verifyTls)
    url => tlsHint(verifyTls, url) {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(timeoutSec)).GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray())
      if (resp.statusCode() >= 300)
        throw new RuntimeException(s"HTTP ${resp.statusCode()} for $url")
      resp.body()
    }
  }

  /** The reference's default city-index URL (source.py:40). */
  val CitiesUrl = "https://www.vgsi.com/connecticut-online-database/"

  /** S8 — city extraction from the VGSI index page, the reference's exact
    * selection (source.py:721-731): only anchors whose href matches
    * `https://gis\.vgsi\.com/`, the `([\w]{2,}([cC][Tt])+)` pattern
    * searched against the WHOLE href (not one path segment — the real
    * links end in `/Default.aspx` and the city sits mid-path), key =
    * match minus the 2-char state suffix, name = the anchor's text.
    * Returns (city_key, city_name, state, url) rows; last link per key
    * wins, like the reference's dict assignment.
    */
  def parseCities(html: String): Seq[(String, String, String, String)] = {
    val anchor = "(?is)<a(?![\\w-])[^>]*(?<![\\w-])href\\s*=\\s*[\"']([^\"']+)[\"'][^>]*>(.*?)</a>".r
    val gisHref = "https://gis\\.vgsi\\.com/".r
    val cityPat = "([\\w]{2,}([cC][Tt])+)".r
    val rows = anchor
      .findAllMatchIn(html)
      .flatMap { a =>
        val url = Html.decode(a.group(1))
        if (gisHref.findFirstIn(url).isEmpty) None
        else
          cityPat.findFirstMatchIn(url).map { m =>
            val location = m.group(1).toLowerCase(java.util.Locale.ROOT)
            val key = location.dropRight(2)
            val state = location.takeRight(2)
            (key, Html.text(a.group(2)), state, url)
          }
      }
      .toSeq
    // last wins per key (reference dict semantics) while preserving a
    // deterministic first-seen order for the survivors
    val byKey = rows.map(r => r._1 -> r).toMap
    rows.map(_._1).distinct.map(byKey)
  }

  /** key → url view of [[parseCities]] (the registry point-lookup shape). */
  def parseCityList(html: String): Map[String, String] =
    parseCities(html).map(r => r._1 -> r._4).toMap
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
