package graft.ingest

import scala.util.control.NonFatal

/** Retry with exponential backoff (S5/S6 fetch policy): default 3 retries,
  * 1s initial delay, ×2 backoff — the reference's per-request policy
  * (/root/reference/scrapers/vgsi/source.py:202-253,
  * scrapers/llc_ct_data/source.py:57-102).
  */
object Retry {

  def withBackoff[T](
      maxRetries: Int = 3,
      initialDelayMs: Long = 1000,
      backoffFactor: Double = 2.0,
      sleep: Long => Unit = Thread.sleep
  )(op: => T): T = {
    var attempt = 0
    var delay = initialDelayMs
    while (true) {
      try return op
      catch {
        case e: InvalidEntryException => throw e // never retried (D6)
        case NonFatal(e) =>
          attempt += 1
          if (attempt > maxRetries) throw e
          sleep(delay)
          delay = (delay * backoffFactor).toLong
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Signals a permanently-invalid entry (bad PID page etc.) — skipped
  * silently, never retried, never counted as an error
  * (/root/reference/src/engine/engine.py:221-222, base.py:44-46).
  */
final class InvalidEntryException(msg: String) extends RuntimeException(msg)
