package graft

import graft.ingest.{InvalidEntryException, RateLimiter, Retry}

class IngestUtilSpec extends SparkSpec {

  test("rate limiter spaces acquisitions (D3)") {
    val rl = new RateLimiter(100.0) // 10ms interval
    val t0 = System.nanoTime()
    (1 to 5).foreach(_ => rl.acquire())
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 35) // 4 waits x 10ms, generous lower bound
    assert(rl.acquired == 5)
  }

  test("rate limiter with rate<=0 is unthrottled") {
    val rl = new RateLimiter(0)
    val t0 = System.nanoTime()
    (1 to 1000).foreach(_ => rl.acquire())
    assert((System.nanoTime() - t0) / 1e6 < 1000)
  }

  test("retry retries transient failures with backoff then succeeds") {
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer[Long]()
    val r = Retry.withBackoff(maxRetries = 3, initialDelayMs = 10, sleep = slept.append(_)) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(r == "ok" && calls == 3)
    assert(slept.toSeq == Seq(10L, 20L)) // exponential x2
  }

  test("retry gives up after maxRetries") {
    var calls = 0
    intercept[RuntimeException] {
      Retry.withBackoff(maxRetries = 2, initialDelayMs = 1, sleep = _ => ()) {
        calls += 1; throw new RuntimeException("always")
      }
    }
    assert(calls == 3) // initial + 2 retries
  }

  test("invalid entries are never retried (D6)") {
    var calls = 0
    intercept[InvalidEntryException] {
      Retry.withBackoff(maxRetries = 5, initialDelayMs = 1, sleep = _ => ()) {
        calls += 1; throw new InvalidEntryException("bad pid")
      }
    }
    assert(calls == 1)
  }

  test("TLS handshake failure names the healing flag when verification is ON, passes through when OFF") {
    import graft.sources.vgsi.VgsiSource
    def boom = new javax.net.ssl.SSLHandshakeException("PKIX path building failed")
    // verification ON: wrapped with the actionable hint, original as cause
    val e = intercept[RuntimeException] {
      VgsiSource.tlsHint(verifyTls = true, "https://gis.vgsi.com/x")(throw boom)
    }
    assert(e.getMessage.contains("--no-verify-tls"), e.getMessage)
    assert(e.getMessage.contains("https://gis.vgsi.com/x"), e.getMessage)
    assert(e.getCause.isInstanceOf[javax.net.ssl.SSLHandshakeException])
    // verification OFF: a handshake failure is a DIFFERENT problem the
    // hint would mis-diagnose - passes through unwrapped
    intercept[javax.net.ssl.SSLHandshakeException] {
      VgsiSource.tlsHint(verifyTls = false, "u")(throw boom)
    }
    // non-TLS results/failures untouched
    assert(VgsiSource.tlsHint(verifyTls = true, "u")(42) == 42)
  }
}
