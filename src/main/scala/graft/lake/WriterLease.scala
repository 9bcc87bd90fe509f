package graft.lake

import org.apache.spark.sql.SparkSession

/** Fail-fast writer lease over a directory — the single-writer contract,
  * ENFORCED. Generalized from the [[graft.operators.VectorIndex]]
  * maintenance lease (where the semantics were battle-tested: ownership
  * races, unreadable holders, heartbeats) so the lake's mutation paths
  * ([[Lake.append]]/[[Lake.compact]]/[[Lake.rewriteTable]]/
  * [[UuidMigration.migrate]]) share one implementation instead of relying
  * on a by-convention scheduler.
  *
  * Acquisition is a create-EXCLUSIVE of the `__writer_lease` file
  * (`fs.create(…, overwrite=false)` — atomic on HDFS and local FS), so a
  * second concurrent writer blocks (bounded wait) or throws instead of
  * racing the staged renames underneath. A lease whose mtime is older
  * than the staleness window is a crashed writer and is taken over.
  * [[WriterLease.heartbeat]] refreshes the mtime mid-operation so a long
  * rewrite isn't mistaken for a crash. Best-effort fencing: the
  * exclusive-create is atomic, the stale-takeover window is not — two
  * writers both deciding the same lease is stale can race the delete;
  * true fencing needs the store's conditional ops. The staged-commit
  * discipline underneath stays crash-convergent either way; the lease
  * exists to fail FAST, not to be the last line of defense.
  */
final class WriterLease private[graft] (
    fs: org.apache.hadoop.fs.FileSystem,
    path: org.apache.hadoop.fs.Path,
    token: String
) {
  /** Holder read with bounded retries: a single transient store failure
    * must not be read as "no holder" — `None` from this method means the
    * holder could not be established even after retries, and every
    * caller treats that as NOT PROVABLY OURS (skip the mutation), never
    * as "free". Without the distinction, a stale-window takeover plus
    * one transient read failure let release() delete — and heartbeat()
    * refresh — the USURPER's live lease, the exact race the ownership
    * check exists to close.
    */
  private def currentHolder(): Option[String] = {
    var attempt = 0
    while (attempt < 3) {
      try {
        val in = fs.open(path)
        try return Some(new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
        finally in.close()
      } catch {
        case _: java.io.FileNotFoundException => return Some("") // gone: provably not ours
        case scala.util.control.NonFatal(_)   => attempt += 1
      }
    }
    None
  }

  /** Refresh the lease mtime — and FIRST verify we still hold it: after
    * a stale-window takeover, setTimes on the usurper's file would
    * silently refresh THEIR lease while both writers keep going; the
    * ownership check turns that into the loud failure the lease is for.
    * An UNREADABLE holder skips the refresh entirely (not provably ours
    * to touch) — the safe failure direction: a skipped beat risks only
    * our own staleness takeover, which the next successful heartbeat
    * reports loudly.
    */
  def heartbeat(): Unit = {
    currentHolder() match {
      case Some(c) if c == token =>
        try fs.setTimes(path, System.currentTimeMillis(), -1)
        catch {
          case _: UnsupportedOperationException =>
            // setTimes is UNSUPPORTED on object stores (S3A throws) — a
            // silently skipped refresh there would let a LIVE long op age
            // past the staleness window and be taken over, the exact race
            // the heartbeat exists to prevent. Fall back to rewriting the
            // lease with the SAME token (an overwrite PUT refreshes the
            // object's mtime); ownership was just verified above. This
            // arm fires ONLY for unsupported — a transiently-failing but
            // SUPPORTED setTimes must not take the rewrite path, because
            // the rewrite replaces the file's TOKEN: under an
            // A-stalls/B-takes-over race, setTimes leaves B's token in
            // place (A's next beat detects the takeover loudly) while a
            // rewrite would clobber it (A would never detect B). On
            // no-setTimes stores that residual race is part of the
            // documented best-effort takeover window; conditional ops are
            // the real fix there.
            try {
              val out = fs.create(path, true)
              try out.write(token.getBytes("UTF-8"))
              finally out.close()
            } catch {
              case scala.util.control.NonFatal(_) =>
                // the create may have TRUNCATED the file before the write
                // failed: an empty fresh-mtime lease is unreadable-as-ours
                // (next beat reads "" and aborts) and unreleasable (not
                // provably ours), bricking the scope for the staleness
                // window — same empty-lease state acquire() deletes on its
                // failed token write. Best-effort delete; a deleted lease
                // costs at worst OUR op a loud abort at the next beat,
                // never a silent double-writer.
                try {
                  val in = fs.open(path)
                  val content =
                    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
                    finally in.close()
                  if (content.isEmpty) fs.delete(path, false)
                } catch { case scala.util.control.NonFatal(_) => }
            }
          case scala.util.control.NonFatal(_) => // transient: next beat refreshes it
        }
      case Some(c) =>
        throw new IllegalStateException(
          s"writer lease $path was taken over mid-operation (now held by: $c) — " +
            "this op outlived the staleness window; abort rather than race the new holder")
      case None => // unreadable after retries: skip the refresh, don't touch a maybe-usurper
    }
  }

  /** Release only a lease we PROVABLY still own: deleting a usurper's
    * lease would hand the NEXT op a free acquisition while the usurper
    * still writes, and an unreadable holder is not proof of ownership —
    * leave it to age past the staleness window instead.
    */
  def release(): Unit =
    if (currentHolder().contains(token)) {
      if (fs.exists(path) && !fs.delete(path, false))
        throw new java.io.IOException(s"could not release writer lease $path")
    }
}

object WriterLease {

  /** A handle over an EXISTING (or absent) lease file without acquiring
    * it — spec-only seam for unit-testing the ownership semantics
    * (release must not delete a usurper's lease; heartbeat must fail
    * loudly on takeover) that the public ops only hit in mid-op race
    * windows no deterministic test can schedule.
    */
  private[graft] def handle(dir: String, spark: SparkSession, token: String): WriterLease = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/__writer_lease")
    new WriterLease(p.getFileSystem(spark.sparkContext.hadoopConfiguration), p, token)
  }

  /** Acquire the `__writer_lease` under `dir` for operation `op`.
    *
    *  - `staleMs`: a lease older than this is a crashed writer — taken over.
    *  - `waitMs`: how long to keep retrying a CONTENDED acquisition before
    *    failing loud (0 = fail-fast, the VectorIndex maintenance policy;
    *    the lake default waits, so an append landing during a compaction
    *    serializes behind it instead of failing the engine's batch).
    *  - `what`/`staleConf`: context strings for the contention error — the
    *    operator reading the failure must learn WHO holds the lease and
    *    WHICH knob ages a crashed one out.
    */
  private[graft] def acquire(
      dir: String,
      spark: SparkSession,
      op: String,
      staleMs: Long,
      waitMs: Long,
      what: String,
      staleConf: String
  ): WriterLease = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$dir/__writer_lease")
    def holderOf(): String =
      try {
        val in = fs.open(p)
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        finally in.close()
      } catch { case scala.util.control.NonFatal(_) => "<unreadable>" }
    def contention(e: java.io.IOException): Nothing =
      throw new IllegalStateException(
        s"$what: another writer holds the writer lease (${holderOf()}); " +
          s"refusing to race its staged commits — this '$op' must wait or the " +
          s"crashed lease ages past $staleConf",
        e)
    val deadline = System.currentTimeMillis() + waitMs
    while (true) {
      // crashed-writer takeover: a lease past the staleness window is dead.
      // The exists/getFileStatus pair races the holder's RELEASE — the
      // poll loop samples exactly the moment the lease frees — so a
      // vanished-underneath file must read as "free, try the create",
      // never escape as a raw FileNotFoundException out of an append.
      try {
        if (fs.exists(p)) {
          val age = System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
          if (age > staleMs) fs.delete(p, false)
        }
      } catch { case _: java.io.FileNotFoundException => () }
      val created =
        try Some(fs.create(p, false)) // create-exclusive: the atomic acquisition
        catch {
          // only an EXISTING lease is contention; every other IOException
          // (permissions, quota, transient store failure) must surface as
          // itself — misreporting it as "another op holds the lease" steers
          // the operator into waiting out a staleness window for a lease
          // that does not exist. (The fs.exists re-check can race a
          // release too; a racing-release IOException lands in the
          // FileAlreadyExists arm on real stores, and a next-iteration
          // retry is always safe, so an escaped raw failure here means a
          // genuinely broken store, which SHOULD surface.)
          case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
            if (System.currentTimeMillis() >= deadline) contention(e); None
          case e: java.io.IOException if fs.exists(p) =>
            if (System.currentTimeMillis() >= deadline) contention(e); None
        }
      created match {
        case Some(out) =>
          val token = s"op=$op pid=${ProcessHandle.current().pid()} at=${System.currentTimeMillis()}"
          // a failed token write must not strand the just-created file as
          // an empty lease nobody can release (it would brick the scope
          // until the staleness window ages it out) — best-effort delete
          // before rethrowing
          try {
            try out.write(token.getBytes("UTF-8"))
            finally out.close()
          } catch {
            case e: Throwable =>
              try fs.delete(p, false) catch { case scala.util.control.NonFatal(_) => () }
              throw e
          }
          return new WriterLease(fs, p, token)
        case None => Thread.sleep(100) // contended within the wait budget: poll
      }
    }
    sys.error("unreachable")
  }

  /** Run `body` while a daemon thread heartbeats the lease, so an op that
    * crosses the staleness window on a large batch isn't taken over and
    * raced mid-write. The thread refreshes at a third of the window; a
    * takeover detected mid-run surfaces as the loud failure the lease
    * promises (after the body — the action cannot be safely interrupted
    * midway, but the caller must never see a silent success).
    */
  private[graft] def withHeartbeat[T](lease: WriterLease, staleMs: Long)(body: => T): T = {
    val interval = math.max(staleMs / 3, 1000L)
    val exec = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-lease-heartbeat"); t.setDaemon(true); t
    })
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    exec.scheduleAtFixedRate(
      () => try lease.heartbeat() catch { case t: Throwable => failed.set(t) },
      interval, interval, java.util.concurrent.TimeUnit.MILLISECONDS)
    try {
      val r = body
      Option(failed.get()).foreach(t => throw t)
      r
    } finally exec.shutdownNow()
  }
}
