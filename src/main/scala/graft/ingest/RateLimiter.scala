package graft.ingest

import java.util.concurrent.ConcurrentHashMap

/** Token-interval rate limiter (D3) — the Spark re-expression of the
  * reference's limiter (/root/reference/src/engine/engine.py:38-93):
  * reserve the next slot optimistically under a short lock, sleep outside
  * the lock.
  *
  * Distribution note (SURVEY.md §7 risks): the reference's limiter is
  * process-global; on a cluster each executor JVM holds one limiter, so the
  * per-JVM rate must be globalRate / numExecutors — the divided rate is the
  * caller's responsibility and [[forKey]] gives one shared instance per JVM
  * per source key.
  */
final class RateLimiter(ratePerSec: Double) extends Serializable {
  @transient private lazy val lock = new Object
  @transient private var nextSlotNanos: Long = 0L
  private val intervalNanos: Long =
    if (ratePerSec <= 0) 0L else (1e9 / ratePerSec).toLong

  // AtomicLong, not a @volatile var: forKey SHARES one instance across all
  // tasks on the executor, and `+= 1` on a volatile is a non-atomic
  // read-modify-write that loses counts exactly under that sharing
  private val acquiredCount = new java.util.concurrent.atomic.AtomicLong(0L)
  def acquired: Long = acquiredCount.get()

  /** Block until a request slot is available. */
  def acquire(): Unit = {
    if (intervalNanos == 0) { acquiredCount.incrementAndGet(); return }
    val wait = lock.synchronized {
      val now = System.nanoTime()
      val slot = math.max(nextSlotNanos, now)
      nextSlotNanos = slot + intervalNanos
      slot - now
    }
    if (wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
    acquiredCount.incrementAndGet()
  }
}

object RateLimiter {
  private val instances = new ConcurrentHashMap[String, RateLimiter]()

  /** One limiter per (key, rate) per executor JVM — all tasks of a source
    * on this executor share the budget. The rate participates in the cache
    * key: a later caller asking for a different rate for the same source
    * gets a limiter honoring THAT rate rather than silently inheriting the
    * first one's.
    */
  def forKey(key: String, ratePerSec: Double): RateLimiter =
    instances.computeIfAbsent(s"$key@$ratePerSec", _ => new RateLimiter(ratePerSec))
}
