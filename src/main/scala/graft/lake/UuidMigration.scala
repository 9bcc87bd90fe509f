package graft.lake

import graft.functions.Canonical
import graft.sources.Flatten
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** One-shot migration of a VGSI scope from the legacy PAGE-SCRAPED uuid
  * identity (pid + the page's own town_name label — reference parity,
  * /root/reference/scrapers/vgsi/source.py:182-194) to the SCOPE-KEYED
  * identity (pid + ingest scope key, [[Flatten.scopeKeyedUuid]]): a
  * site-side label rendering change ("ANDOVER" → "Andover, CT") mints new
  * uuids under the legacy basis and silently splits every SCD2 chain in
  * the town; the scope key is the operator's own stable name and cannot
  * drift with the page.
  *
  * Which identity a lake uses is SELF-DESCRIBING via a scope-level marker
  * file (`_uuid_identity`): new lakes are marked scope-keyed at creation
  * by the engine, pre-marker lakes default to legacy until migrated, and
  * the engine consults [[identityOf]] every run — so switching the basis
  * WITHOUT rewriting history (which would itself split every chain) is
  * impossible by construction.
  *
  * [[migrate]] is the rewrite: for every table carrying the identity
  * (uuid on properties, property_uuid on the 7 children) it recomputes
  * the column FROM pid — not via a mapping join, which makes a crashed
  * run's rerun idempotent (recompute of an already-migrated row is a
  * no-op) — under [[Lake.rewriteTable]]'s atomic swap discipline, and
  * recomputes `row_hash` alongside (the uuid sits INSIDE the canonical
  * hash surface; without the recompute every entity would record one
  * spurious "change" on its first post-migration scrape). The
  * old→new mapping is still written first as the `uuid_migration` audit
  * table (old_uuid, new_uuid, pid) for external consumers holding legacy
  * uuids. Marker flips LAST: a crash anywhere mid-migration leaves the
  * scope reading legacy, and re-running converges.
  *
  * Scale shape: per table one scan + one column recompute + one swap —
  * no joins, no shuffles (the mapping distinct is the only exchange, on
  * the properties table's entity count). Same single-writer requirement
  * as [[Lake.compact]]: run post-session, never while an engine writes
  * the scope.
  */
object UuidMigration {

  val ScopeKeyIdentity = "scope_key"
  val PageTownIdentity = "page_town"
  val MappingTable = "uuid_migration"

  private def markerPath(root: String, scope: String) = s"$root/$scope/_uuid_identity"

  /** Any EVIDENCE of a pre-existing lake under the scope — including a
    * table hidden mid-crashed-swap (`<table>.__old` / work dirs, which
    * [[Lake.tables]] deliberately filters out of the TABLE listing). The
    * fresh-scope decision must use this, not the table listing: marking a
    * legacy scope scope-keyed because its only table happened to sit at
    * `.__old` during a crashed compaction would irreversibly split every
    * chain, with migrate() then short-circuiting on the marker.
    */
  private[graft] def scopeHasAnyData(spark: SparkSession, root: String, scope: String): Boolean = {
    val p = new Path(s"$root/$scope")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.isDirectory)
  }

  /** The identity basis this scope's uuids use: the marker's word when
    * present; otherwise legacy for a scope with ANY existing data —
    * crashed-swap strands included, see [[scopeHasAnyData]] — (it
    * predates the marker) and scope-keyed for a truly fresh one (the
    * engine marks it at creation, this is the same default).
    */
  def identityOf(spark: SparkSession, root: String, scope: String): String = {
    val p = new Path(markerPath(root, scope))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
      finally in.close()
    } else if (scopeHasAnyData(spark, root, scope)) PageTownIdentity
    else ScopeKeyIdentity
  }

  /** Stamp the scope as scope-keyed (atomic tmp+rename — a torn marker
    * read must be impossible; a half-written marker would silently flip
    * the engine back to legacy and fork the chains the migration just
    * unified).
    *
    * The marker is WRITE-ONCE (its only value is ever [[ScopeKeyIdentity]];
    * nothing writes a legacy marker), so a marker that already reads
    * scope-keyed short-circuits and the normal path is a single
    * tmp→marker rename with NO deleted-marker window — the old
    * delete-then-rename left an instant where [[identityOf]] saw no
    * marker and fell back to legacy for a fully-rewritten lake. Only the
    * repair of a TORN marker (unreadable/partial content — which
    * [[identityOf]] already reads as legacy, the same verdict the window
    * would give) still replaces the file; that path runs under the
    * migration's scope lease.
    */
  def markScopeKeyed(spark: SparkSession, root: String, scope: String): Unit = {
    val p = new Path(markerPath(root, scope))
    val tmp = new Path(markerPath(root, scope) + ".__tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readsScopeKeyed: Boolean =
      try {
        val in = fs.open(p)
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim ==
          ScopeKeyIdentity
        finally in.close()
      } catch { case scala.util.control.NonFatal(_) => false }
    if (fs.exists(p) && readsScopeKeyed) return // write-once: already published
    fs.mkdirs(p.getParent)
    val out = fs.create(tmp, true)
    try out.write(ScopeKeyIdentity.getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, p)) {
      // rename refused (dst exists on an HDFS-like store). A racer may
      // have published the identical marker first — fine; otherwise the
      // existing marker is torn and must be replaced: the deleted-marker
      // window now exists ONLY on this repair path, where the torn file
      // already read as legacy anyway.
      if (readsScopeKeyed) { fs.delete(tmp, false); return }
      fs.delete(p, false)
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"could not publish uuid identity marker $p")
    }
  }

  /** Run the migration. Returns (entities remapped, tables rewritten).
    * Idempotent: a rerun after any crash converges (recompute-from-pid
    * rewrites are no-ops on migrated rows; the mapping append anti-joins
    * out rows already recorded; an already-marked scope short-circuits).
    *
    * Holds the SCOPE's writer lease for the whole run
    * ([[Lake.withScopeLease]]): the migration plans over the table
    * listing and rewrites tables one by one, so an engine append landing
    * between two of its rewrites would either carry the OLD identity
    * into a just-migrated table or dodge the rewrite entirely — the
    * race that used to be fenced only by the "run post-session"
    * convention. The inner [[Lake.append]]/[[Lake.rewriteTable]] calls
    * re-enter the held lease.
    */
  def migrate(spark: SparkSession, root: String, scope: String): (Long, Long) =
    Lake.withScopeLease(spark, root, scope, "uuid-migration") {
    if (identityOf(spark, root, scope) == ScopeKeyIdentity &&
        new Path(markerPath(root, scope))
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(new Path(markerPath(root, scope))))
      return (0L, 0L) // already migrated (marker present)
    // promote crashed-swap strands FIRST: a table sitting at `<t>.__old`
    // is invisible to the listing, and migrating around it would flip the
    // marker with that table still on legacy uuids — permanently, since
    // the marker short-circuit would then refuse to heal it
    Lake.recoverScopeStrands(spark, root, scope)
    val tables = Lake.tables(spark, root, scope)
    require(tables.contains("properties"),
      s"uuid migration needs a properties table under $root/$scope (found: ${tables.mkString(", ")})")

    // schema pre-pass, and FAIL before touching anything: an identity-
    // bearing table without a pid column cannot be recomputed — silently
    // skipping it and flipping the marker anyway would strand its legacy
    // FKs against a rewritten properties table forever (migrate would then
    // short-circuit on the marker and never heal it)
    val plan: Seq[(String, String)] = tables.filterNot(_ == MappingTable).flatMap { t =>
      val cols = Lake.read(spark, root, scope, t).columns.toSet
      val keyCol =
        if (cols.contains("uuid")) Some("uuid")
        else if (cols.contains("property_uuid")) Some("property_uuid")
        else None
      keyCol match {
        case Some(k) if cols.contains("pid") => Some(t -> k)
        case Some(k) =>
          throw new IllegalStateException(
            s"uuid migration: table '$t' carries identity column '$k' but no 'pid' to recompute " +
              "it from — migrating around it would leave mixed identities and dangling FKs; " +
              "drop or remap that table first, then re-run")
        case None => None // no identity column: nothing to rewrite
      }
    }

    // 1) audit mapping FIRST (crash-safe ordering: once any table is
    // rewritten, the old uuids exist nowhere else). Recompute-from-pid
    // reruns produce old==new rows for already-migrated data — filtered —
    // and the anti-join keeps a partial first run's rows from doubling.
    val props = Lake.read(spark, root, scope, "properties")
    val mapping = props
      .select(col("uuid").as("old_uuid"), col("pid"))
      .distinct()
      .withColumn("new_uuid", Flatten.scopeKeyedUuid(col("pid"), scope))
      .filter(col("old_uuid") =!= col("new_uuid"))
      .select("old_uuid", "new_uuid", "pid")
    val toRecord =
      if (tables.contains(MappingTable))
        mapping.join(
          Lake.read(spark, root, scope, MappingTable).select("old_uuid"),
          Seq("old_uuid"), "left_anti")
      else mapping
    val cached = toRecord.persist()
    val entities =
      try {
        val n = cached.count()
        if (n > 0L) Lake.append(cached, root, scope, MappingTable)
        n
      } finally cached.unpersist(blocking = false)

    // 2) rewrite every identity-bearing table (schema-probed by the
    // pre-pass above, not a fixed list: a lake missing some child tables,
    // or carrying a custom one with the FK pair, migrates whole)
    var rewritten = 0L
    plan.foreach { case (t, k) =>
      Lake.rewriteTable(spark, root, scope, t) { df =>
        val remapped = df.withColumn(k, Flatten.scopeKeyedUuid(col("pid"), scope))
        // the uuid is inside the canonical hash surface: recompute so a
        // post-migration scrape of UNCHANGED content hashes equal to the
        // stored history instead of recording one phantom version per
        // entity. rowHash excludes the metadata cols (row_hash,
        // scraped_at) by contract, so this is the stamp-time surface.
        remapped.withColumn("row_hash", Canonical.rowHash(remapped))
      }
      rewritten += 1
    }

    // 3) flip the identity marker LAST
    markScopeKeyed(spark, root, scope)
    (entities, rewritten)
  }
}
