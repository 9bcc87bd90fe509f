package graft

import graft.ingest.{Engine, IngestConfig}
import graft.lake.{Lake, UuidMigration}
import graft.scd.Scd
import graft.sources.Flatten
import org.apache.spark.sql.functions._

/** The scope-keyed uuid identity migration (round-14 verdict #2): a lake
  * built under the legacy page-town basis survives a site-side label
  * rendering change with UNBROKEN version chains after the one-shot
  * migration — where the unmigrated basis mints new uuids for the whole
  * town and orphans every history.
  */
@org.scalatest.tags.Slow
class UuidMigrationSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (1L to 5L).toSeq
  private def data(label: String, bump: Set[Long] = Set.empty) =
    ids.map { i =>
      val base = FakeSource.prop(i, s"Owner$i", if (bump(i)) 9999.0 else 1000.0 * i)
      i -> base.copy(property = base.property.copy(town_name = Some(label)))
    }.toMap

  /** Build the lake the way a PRE-marker engine did: legacy flatten basis,
    * stamp, append — no identity marker (an r14 lake on disk).
    */
  private def legacyLake(root: String, scope: String, label: String): Unit = {
    val results = spark.createDataset(data(label).values.toSeq)
    val ts = new java.sql.Timestamp(System.currentTimeMillis())
    Flatten.flatten(results, scopeKey = None).foreach { case (t, df) =>
      val stamped = Lake.stampMetadata(df, ts)
      if (!stamped.isEmpty) Lake.append(stamped, root, scope, t)
    }
  }

  test("legacy lake + label change WITHOUT migration splits every chain (the documented failure)") {
    val root = tmpDir("uuidmig_bad")
    legacyLake(root, "andover", "ANDOVER")
    assert(UuidMigration.identityOf(spark, root, "andover") == UuidMigration.PageTownIdentity,
      "a pre-marker lake with tables must read as legacy")
    // the engine keeps the legacy basis on an unmigrated lake (no silent
    // flip) — so the rendering change mints 5 new uuids and currentState
    // doubles: the failure the migration exists to prevent
    Engine.runRefresh(spark, new FakeSource(data("Andover, CT")), root, "andover",
      IngestConfig(workers = 2, checkpoint = false))
    val props = Lake.read(spark, root, "andover", "properties")
    val cur = Scd.currentState(props, $"uuid", $"scraped_at", $"row_hash")
    assert(cur.count() == 10L, "split chains: every pid now has TWO current entities")
  }

  test("migrate: chains survive a label change; unchanged content re-dedups; audit mapping written") {
    val root = tmpDir("uuidmig_good")
    legacyLake(root, "andover", "ANDOVER")
    val beforeUuids = Lake.read(spark, root, "andover", "properties")
      .select($"pid", $"uuid").as[(Long, String)].collect().toMap

    val (entities, tables) = UuidMigration.migrate(spark, root, "andover")
    assert(entities == 5L, s"5 entities remapped, got $entities")
    assert(tables >= 4L, s"properties + children rewritten, got $tables")
    assert(UuidMigration.identityOf(spark, root, "andover") == UuidMigration.ScopeKeyIdentity)

    // mapping audit: old -> new, new matches both the rewritten lake and
    // the shared basis function
    val mapping = Lake.read(spark, root, "andover", UuidMigration.MappingTable)
      .select($"pid", $"old_uuid", $"new_uuid").as[(Long, String, String)].collect()
    assert(mapping.length == 5 && mapping.forall { case (p, o, n) => o == beforeUuids(p) && o != n })
    val expected = spark.createDataset(ids).toDF("pid")
      .select($"pid", Flatten.scopeKeyedUuid($"pid", "andover").as("u"))
      .as[(Long, String)].collect().toMap
    assert(mapping.forall { case (p, _, n) => n == expected(p) })
    // children carry the SAME remapped identity (FK integrity)
    val own = Lake.read(spark, root, "andover", "ownership")
    assert(own.join(Lake.read(spark, root, "andover", "properties").select($"uuid"),
      own("property_uuid") === col("uuid")).count() == own.count())

    // a migrated-lake refresh with IDENTICAL content writes NOTHING: the
    // row_hash recompute must be byte-exact with stamp-time hashing, else
    // every entity records one phantom version here
    val same = Engine.runRefresh(spark, new FakeSource(data("ANDOVER")), root, "andover",
      IngestConfig(workers = 2, checkpoint = false))
    assert(same.rowsWritten("properties") == 0,
      s"phantom versions after migration: ${same.rowsWritten}")

    // the label rendering change: same uuid, version 2 — a recorded content
    // change on a CONTINUOUS chain, not a new entity
    Engine.runRefresh(spark, new FakeSource(data("Andover, CT")), root, "andover",
      IngestConfig(workers = 2, checkpoint = false))
    val props = Lake.read(spark, root, "andover", "properties")
    val cur = Scd.currentState(props, $"uuid", $"scraped_at", $"row_hash")
    assert(cur.count() == 5L, "chains survive: one current entity per pid")
    assert(cur.select($"town_name").as[String].collect().forall(_ == "Andover, CT"))
    val versions = Scd.withVersions(props, $"uuid", $"row_hash", $"scraped_at")
      .groupBy($"uuid").agg(max($"version").as("v"))
      .select($"v").as[Int].collect()
    assert(versions.length == 5 && versions.forall(_ == 2),
      s"every entity: v1 (ANDOVER) + v2 (Andover, CT): ${versions.toSeq}")

    // idempotency: a second migrate is a marked-scope no-op
    assert(UuidMigration.migrate(spark, root, "andover") == ((0L, 0L)))
  }

  test("a legacy table hidden mid-crashed-swap still reads as legacy (no irreversible mismark)") {
    // Lake.tables filters `.__` work dirs, so a legacy scope whose only
    // table sits at properties.__old during a crashed compaction lists
    // ZERO tables — a tables-based fresh check would mark it scope-keyed,
    // irreversibly forking every chain (migrate then short-circuits on the
    // marker). The identity decision must see crash strands as data.
    val root = tmpDir("uuidmig_swap")
    // a legacy scope whose ONLY table is properties (children empty every
    // batch — the review's exact scenario)
    val results = spark.createDataset(data("ANDOVER").values.toSeq)
    val ts = new java.sql.Timestamp(System.currentTimeMillis())
    Lake.append(
      Lake.stampMetadata(Flatten.flatten(results, scopeKey = None)("properties"), ts),
      root, "andover", "properties")
    val table = new java.io.File(s"$root/andover/properties")
    assert(table.renameTo(new java.io.File(s"$root/andover/properties.__old")))
    assert(Lake.tables(spark, root, "andover").isEmpty,
      "precondition: the table listing hides the crash strand")
    assert(UuidMigration.identityOf(spark, root, "andover") == UuidMigration.PageTownIdentity,
      "crash strands ARE evidence of an existing lake")
    // an engine LOAD heals the swap (recoverBeforeWrite promotes on the
    // first append) and must keep the scope legacy — not mark it
    // scope-keyed off the empty table listing
    Engine.runLoad(spark, new FakeSource(data("ANDOVER")), ids, root, "andover",
      IngestConfig(workers = 2, checkpoint = false))
    assert(UuidMigration.identityOf(spark, root, "andover") == UuidMigration.PageTownIdentity,
      "the engine must not mark a crashed legacy scope as scope-keyed")
    val uuids = Lake.read(spark, root, "andover", "properties")
      .select($"uuid").distinct().as[String].collect()
    assert(uuids.length == 5, s"legacy identity preserved across the heal: ${uuids.length} uuids")
  }

  test("migrate recovers a crashed-swap strand first — never flips the marker around it") {
    // a child table stranded at buildings.__old is invisible to the table
    // listing; planning around it would rewrite everything else, flip the
    // marker, and the strand's later promotion would dangle its legacy FKs
    // forever (the marker short-circuit refuses to heal)
    val root = tmpDir("uuidmig_strand")
    legacyLake(root, "andover", "ANDOVER")
    val table = new java.io.File(s"$root/andover/buildings")
    assert(table.exists(), "fixture writes buildings")
    assert(table.renameTo(new java.io.File(s"$root/andover/buildings.__old")))
    val (_, tables) = UuidMigration.migrate(spark, root, "andover")
    assert(new java.io.File(s"$root/andover/buildings").exists(),
      "migrate must promote the strand before planning")
    val bld = Lake.read(spark, root, "andover", "buildings")
    val props = Lake.read(spark, root, "andover", "properties")
    assert(bld.join(props.select($"uuid"), bld("property_uuid") === col("uuid")).count() == bld.count(),
      "the recovered table must be migrated with the rest — no dangling FKs")
    assert(tables >= 4L)
  }

  test("migrate refuses a scope with an identity-bearing table it cannot recompute (no pid)") {
    val root = tmpDir("uuidmig_nopid")
    legacyLake(root, "andover", "ANDOVER")
    // a custom table carrying the FK but no pid: silently skipping it and
    // flipping the marker would strand its legacy FKs forever
    val someUuid = Lake.read(spark, root, "andover", "properties")
      .select($"uuid").as[String].head()
    Lake.append(Seq((someUuid, "note")).toDF("property_uuid", "note"), root, "andover", "annotations")
    val e = intercept[IllegalStateException](UuidMigration.migrate(spark, root, "andover"))
    assert(e.getMessage.contains("annotations"), e.getMessage)
    assert(UuidMigration.identityOf(spark, root, "andover") == UuidMigration.PageTownIdentity,
      "an aborted migration must leave the scope legacy and re-runnable")
    assert(!Lake.tables(spark, root, "andover").contains(UuidMigration.MappingTable),
      "abort must happen before anything is written")
  }

  test("a fresh lake is scope-keyed from birth: label changes never split, no migration needed") {
    val root = tmpDir("uuidmig_fresh")
    Engine.runLoad(spark, new FakeSource(data("ANDOVER")), ids, root, "andover",
      IngestConfig(workers = 2, checkpoint = false))
    assert(UuidMigration.identityOf(spark, root, "andover") == UuidMigration.ScopeKeyIdentity,
      "runLoad must mark a fresh scope at creation")
    Engine.runRefresh(spark, new FakeSource(data("Andover, CT")), root, "andover",
      IngestConfig(workers = 2, checkpoint = false))
    val props = Lake.read(spark, root, "andover", "properties")
    assert(Scd.currentState(props, $"uuid", $"scraped_at", $"row_hash").count() == 5L)
    // and the minted uuids are exactly the shared scope-keyed basis
    val minted = props.select($"pid", $"uuid").distinct().as[(Long, String)].collect().toMap
    val expected = spark.createDataset(ids).toDF("pid")
      .select($"pid", Flatten.scopeKeyedUuid($"pid", "andover").as("u"))
      .as[(Long, String)].collect().toMap
    assert(minted == expected)
  }

  test("markScopeKeyed is write-once: re-marking never touches the published marker; a torn one repairs") {
    val root = tmpDir("uuidmig_marker")
    UuidMigration.markScopeKeyed(spark, root, "m")
    assert(UuidMigration.identityOf(spark, root, "m") == UuidMigration.ScopeKeyIdentity)
    val f = new java.io.File(s"$root/m/_uuid_identity")
    assert(f.exists())
    // pin a sentinel mtime, re-mark: the already-published marker must not
    // be rewritten (the old delete-then-rename left a window where a
    // reader saw NO marker and read a fully-rewritten lake as legacy)
    assert(f.setLastModified(1234567000L))
    UuidMigration.markScopeKeyed(spark, root, "m")
    assert(f.lastModified() == 1234567000L,
      "an already-published marker must not be deleted or rewritten")
    assert(UuidMigration.identityOf(spark, root, "m") == UuidMigration.ScopeKeyIdentity)
    // a TORN marker (partial content — reads as neither identity) repairs;
    // torn THROUGH the Hadoop FS so the checksum sidecar matches (a raw
    // NIO write would make every read fail on ChecksumException instead)
    locally {
      val p = new org.apache.hadoop.fs.Path(s"$root/m/_uuid_identity")
      val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = hfs.create(p, true)
      try out.write("scope_k".getBytes("UTF-8")) finally out.close()
    }
    assert(UuidMigration.identityOf(spark, root, "m") != UuidMigration.ScopeKeyIdentity)
    UuidMigration.markScopeKeyed(spark, root, "m")
    assert(UuidMigration.identityOf(spark, root, "m") == UuidMigration.ScopeKeyIdentity,
      "a torn marker must be repaired")
  }
}
