package graft

import graft.ingest._
import graft.lake.{Checkpoints, Lake}
import graft.scd.Scd
import graft.sources._
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** Fake HTTP-free source, the analogue of the reference's test fakes
  * (/root/reference/tests/test_engine.py:101-112).
  */
class FakeSource(
    data: Map[Long, ScrapeResult],
    failFor: Set[Long] = Set.empty,
    invalidFor: Set[Long] = Set.empty
) extends Source {
  override def name = "fake"
  override def ratePerSec: Double = 0 // unthrottled in tests
  override def maxRetries: Int = 0
  override def scrapeOne(id: Long): ScrapeResult =
    if (invalidFor(id)) throw new InvalidEntryException(s"invalid $id")
    else if (failFor(id)) throw new RuntimeException(s"boom $id")
    else data(id)
}

object FakeSource {
  def prop(pid: Long, owner: String, value: Double): ScrapeResult =
    ScrapeResult(
      property = Property(
        pid = pid,
        town_name = Some("Testville"),
        address = Some(s"$pid Main St"),
        owner = Some(owner),
        account_number = None,
        sale_price = Some(value * 1.1),
        assessment_value = Some(value),
        appraisal_value = Some(value * 1.05),
        building_count = Some(1),
        land_size_acres = Some(0.5),
        extra_fields = None
      ),
      buildings = Seq(
        Building(0, Some(1950), Some(2000.0), Some(400000.0), Some(350000.0), Some(85), None,
          Map("style" -> "Colonial", "grade" -> "Good"),
          Seq(SubArea("BAS", Some("base"), Some(1000.0), Some(800.0)), SubArea("", None, None, None)))
      ),
      ownership = Seq(Ownership(Some(owner), Some(value * 1.1), Some("2020-05-15")))
    )
}

/** Executor-side fetch counter for the photo-hook test (local[*] shares the
  * JVM, so a static AtomicInteger observes executor calls).
  */
object PhotoFakes {
  val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** End-to-end ingestion slice (SURVEY.md §7 minimum slice +
  * /root/reference/tests/test_engine.py:344-546 scenarios): load → lake →
  * re-scrape with one change → current state + 2-version history + refresh
  * hash-dedup; plus circuit breaker, invalid-skip, checkpoint resume.
  */
@org.scalatest.tags.Slow
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private def mkData(values: Map[Long, Double]): Map[Long, ScrapeResult] =
    values.map { case (pid, v) => pid -> FakeSource.prop(pid, s"Owner$pid", v) }

  test("load -> change -> refresh: current state, 2-version history, hash dedup") {
    val root = tmpDir("lake")
    val ids = (1L to 10L).toSeq
    val v1 = mkData(ids.map(i => i -> (1000.0 * i)).toMap)

    val s1 = Engine.runLoad(spark, new FakeSource(v1), ids, root, "testville",
      IngestConfig(workers = 2, checkpoint = false))
    assert(s1.scraped == 10)
    assert(s1.rowsWritten("properties") == 10)
    assert(s1.rowsWritten("sub_areas") == 10) // empty-code footer rows dropped

    // second pass: pid 3 changed, everything else identical
    val v2 = mkData(ids.map(i => i -> (if (i == 3) 9999.0 else 1000.0 * i)).toMap)
    val s2 = Engine.runRefresh(spark, new FakeSource(v2), root, "testville",
      IngestConfig(workers = 2, checkpoint = false))
    // refresh writes ONLY the changed property row
    assert(s2.rowsWritten("properties") == 1)

    val props = Lake.read(spark, root, "testville", "properties")
    assert(props.count() == 11) // append-only: 10 + 1 changed

    // current state reflects the change
    val cur = Scd.currentState(props, $"uuid", $"scraped_at", $"row_hash")
    assert(cur.count() == 10)
    val changed = cur.filter($"pid" === 3).select($"assessment_value").as[Double].head()
    assert(changed == 9999.0)

    // history: changed pid has 2 versions, untouched pid has 1
    val hist3 = Scd.withVersions(props.filter($"pid" === 3), $"uuid", $"row_hash", $"scraped_at", $"row_hash")
    assert(hist3.count() == 2)
    val hist5 = Scd.withVersions(props.filter($"pid" === 5), $"uuid", $"row_hash", $"scraped_at", $"row_hash")
    assert(hist5.count() == 1)
  }

  test("content revert A->B->A yields THREE versions (per-entity-latest refresh dedup)") {
    // the reference's version-growth law (tests/test_engine.py:429-546)
    // extended to a revert: a yearly assessment revaluation that gets
    // rolled back must appear in the SCD2 chain. The old full-history
    // anti-join matched the historical hash and suppressed the third
    // state forever (currentState reported B while the source showed A).
    val root = tmpDir("lake_revert")
    val ids = (1L to 5L).toSeq
    val a = mkData(ids.map(i => i -> (1000.0 * i)).toMap)
    val b = mkData(ids.map(i => i -> (if (i == 3) 7777.0 else 1000.0 * i)).toMap)

    Engine.runLoad(spark, new FakeSource(a), ids, root, "revertville",
      IngestConfig(workers = 2, checkpoint = false))
    val sB = Engine.runRefresh(spark, new FakeSource(b), root, "revertville",
      IngestConfig(workers = 2, checkpoint = false))
    assert(sB.rowsWritten("properties") == 1)
    val sA = Engine.runRefresh(spark, new FakeSource(a), root, "revertville",
      IngestConfig(workers = 2, checkpoint = false))
    assert(sA.rowsWritten("properties") == 1, "the revert must re-record")

    val props = Lake.read(spark, root, "revertville", "properties")
    val hist3 = Scd.withVersions(props.filter($"pid" === 3), $"uuid", $"row_hash", $"scraped_at")
    assert(hist3.count() == 3, "A->B->A is three versions")
    // current state reflects the revert
    val cur = Scd.currentState(props, $"uuid", $"scraped_at", $"row_hash")
    assert(cur.filter($"pid" === 3).select($"assessment_value").as[Double].head() == 3000.0)
    // untouched entities stay single-version (idempotency intact)
    assert(Scd.withVersions(props.filter($"pid" === 5), $"uuid", $"row_hash", $"scraped_at").count() == 1)
    // the reverted entity's OWNERSHIP child (value-bearing) reverts with it
    // — a consistent snapshot, not a torn parent-only revert
    val own = Lake.read(spark, root, "revertville", "ownership")
    val pid3own = own.join(props.filter($"pid" === 3).select($"uuid".as("property_uuid")).distinct(),
      Seq("property_uuid"))
    assert(pid3own.count() == 3, "ownership re-records across A->B->A too")
  }

  test("duplicate entry ids in one batch write once across ALL tables (U2)") {
    val root = tmpDir("lake")
    val data = mkData(Map(1L -> 100.0, 2L -> 200.0))
    val s = Engine.runLoad(spark, new FakeSource(data), Seq(1L, 1L, 2L, 1L), root, "dup",
      IngestConfig(workers = 2, checkpoint = false, compactAfter = false))
    assert(s.rowsWritten("properties") == 2)
    assert(s.rowsWritten("buildings") == 2) // children deduped with the entry
    assert(s.rowsWritten("sub_areas") == 2)
    assert(s.rowsWritten("ownership") == 2)
  }

  test("invalid entries are skipped silently, not errors (D6)") {
    val root = tmpDir("lake")
    val ids = (1L to 5L).toSeq
    val src = new FakeSource(mkData(ids.map(i => i -> 100.0).toMap), invalidFor = Set(2L, 4L))
    val s = Engine.runLoad(spark, src, ids, root, "t", IngestConfig(workers = 1, checkpoint = false, compactAfter = false))
    assert(s.scraped == 3 && s.invalid == 2 && s.errors == 0)
  }

  test("errors are counted; circuit breaker aborts on consecutive failures (D5)") {
    val root = tmpDir("lake")
    val ids = (1L to 10L).toSeq
    val flaky = new FakeSource(mkData(ids.map(i => i -> 100.0).toMap), failFor = Set(7L))
    val s = Engine.runLoad(spark, flaky, ids, root, "t",
      IngestConfig(workers = 1, maxConsecutiveErrors = 3, checkpoint = false, compactAfter = false))
    assert(s.errors == 1 && s.scraped == 9)

    val broken = new FakeSource(mkData(ids.map(i => i -> 100.0).toMap), failFor = (4L to 8L).toSet)
    intercept[SparkException] {
      Engine.runLoad(spark, broken, ids, root, "t2",
        IngestConfig(workers = 1, maxConsecutiveErrors = 3, checkpoint = false, compactAfter = false))
    }
  }

  test("incremental batches: a breaker trip keeps earlier batches' data and checkpoint (D7/D8)") {
    val root = tmpDir("lake")
    val data = mkData((1L to 10L).map(i => i -> 100.0 * i).toMap)
    // ids 6-10 all fail -> batch 2 trips the breaker; batch 1 (1-5) must survive
    val broken = new FakeSource(data, failFor = (6L to 10L).toSet)
    intercept[org.apache.spark.SparkException] {
      Engine.runLoad(spark, broken, 1L to 10L, root, "inc",
        IngestConfig(workers = 1, maxConsecutiveErrors = 3, checkpointEvery = 5, compactAfter = false))
    }
    assert(Lake.read(spark, root, "inc", "properties").count() == 5)
    val cp = Checkpoints.load(spark, root, "inc")
    assert(cp.exists(_.lastEntryId == "5"))
    // resume with a healed source completes only the remainder, and the
    // checkpoint total accumulates across runs
    val s2 = Engine.runLoad(spark, new FakeSource(data), 1L to 10L, root, "inc",
      IngestConfig(workers = 1, checkpointEvery = 5, compactAfter = false))
    assert(s2.scraped == 5)
    assert(Lake.read(spark, root, "inc", "properties").count() == 10)
    assert(Checkpoints.load(spark, root, "inc").exists(_.totalScraped == 10))
  }

  test("zero-change refresh appends no files (empty-append guard)") {
    val root = tmpDir("lake")
    val data = mkData(Map(1L -> 1.0, 2L -> 2.0))
    Engine.runLoad(spark, new FakeSource(data), Seq(1L, 2L), root, "z2",
      IngestConfig(workers = 1, checkpoint = false, compactAfter = false))
    def nFiles = new java.io.File(s"$root/z2/properties").listFiles().count(_.getName.endsWith(".parquet"))
    val before = nFiles
    val s = Engine.runRefresh(spark, new FakeSource(data), root, "z2",
      IngestConfig(workers = 1, checkpoint = false, compactAfter = false))
    assert(s.rowsWritten.values.sum == 0)
    assert(nFiles == before)
  }

  test("checkpoint resume skips already-loaded ids (D8)") {
    val root = tmpDir("lake")
    val data = mkData((1L to 20L).map(i => i -> 100.0 * i).toMap)
    val s1 = Engine.runLoad(spark, new FakeSource(data), (1L to 10L), root, "c", IngestConfig(workers = 2))
    assert(s1.scraped == 10)
    val cp = Checkpoints.load(spark, root, "c")
    assert(cp.exists(_.lastEntryId == "10"))

    val s2 = Engine.runLoad(spark, new FakeSource(data), (1L to 20L), root, "c", IngestConfig(workers = 2))
    assert(s2.scraped == 10) // only 11..20
    assert(Lake.read(spark, root, "c", "properties").count() == 20)
  }

  test("non-numeric last_entry_id degrades to a full restart, never a wedged scope") {
    val root = tmpDir("lake")
    val data = mkData((1L to 5L).map(i => i -> 100.0 * i).toMap)
    // the doc shape allows arbitrary strings (the reference writes e.g.
    // "MBLU-104-7"); an unguarded .toLong threw on every later runLoad
    // until the checkpoint file was hand-deleted
    Checkpoints.save(spark, root,
      graft.lake.Checkpoint("c", "MBLU-104-7", 3L, "2026-01-01T00:00:00Z"))
    val st = Engine.runLoad(spark, new FakeSource(data), (1L to 5L), root, "c", IngestConfig(workers = 2))
    assert(st.scraped == 5, "unparseable cursor must mean start-over, not a throw")
    assert(Lake.read(spark, root, "c", "properties").count() == 5)
    // the voided checkpoint voids its TOTAL too: seeding priorTotal=3 from
    // the same doc the restart rewrites would double-count every
    // re-scraped entry (5 fresh scrapes must record 5, not 8)
    assert(Checkpoints.load(spark, root, "c").map(_.totalScraped).contains(5L),
      "a restart after a voided cursor must not inherit the stale total")
  }

  test("crash between append and checkpoint: the rerun's re-appends dedup against the lake") {
    val root = tmpDir("lake")
    val data = mkData((1L to 5L).map(i => i -> 100.0 * i).toMap)
    Engine.runLoad(spark, new FakeSource(data), (1L to 5L), root, "c", IngestConfig(workers = 2))
    val before = Lake.read(spark, root, "c", "properties").count()
    // simulate the crash window: the batch appended, the checkpoint never
    // landed — the rerun re-scrapes everything
    new java.io.File(s"$root/_checkpoints/c.json").delete()
    val st = Engine.runLoad(spark, new FakeSource(data), (1L to 5L), root, "c", IngestConfig(workers = 2))
    assert(st.scraped == 5, "rerun re-scrapes the uncheckpointed batch")
    assert(st.rowsWritten.values.sum == 0L,
      s"unchanged re-scrapes must dedup against the lake, wrote: ${st.rowsWritten}")
    assert(Lake.read(spark, root, "c", "properties").count() == before,
      "a crash-before-checkpoint rerun must not permanently double the batch")
  }

  test("footer-only sub_areas never create a schema-only table (preCount matches the flatten filter)") {
    // a batch whose every sub_area is the 'Total' footer row (empty code —
    // dropped by Flatten) must not pass the emptiness probe: the raw array
    // count said >0, the flatten output had zero rows, and the append
    // created the schema-only table dir the probe exists to prevent
    val base = FakeSource.prop(1L, "alice", 100.0)
    val footerOnly = base.copy(buildings = base.buildings.map(b =>
      b.copy(sub_areas = Seq(SubArea("", None, None, None)))))
    val root = tmpDir("lake_footer")
    val st = Engine.runLoad(spark, new FakeSource(Map(1L -> footerOnly)), Seq(1L), root, "f",
      IngestConfig(workers = 2, checkpoint = false))
    assert(st.rowsWritten.getOrElse("sub_areas", 0L) == 0L)
    assert(!Lake.tables(spark, root, "f").contains("sub_areas"),
      "no sub_areas table dir for a footer-only batch")
    assert(Lake.tables(spark, root, "f").contains("properties"), "siblings still write")
  }

  test("a null child Seq never cancels a sibling entry's table write") {
    val root = tmpDir("lake")
    // entry 1 carries a real building; entry 2's source handed back null
    // children. Under legacy semantics size(NULL) = -1, so the batch
    // pre-count summed 1 + (-1) = 0 and SKIPPED the buildings write —
    // silently dropping the real row
    val good = FakeSource.prop(1L, "alice", 100.0)
    val nulled = FakeSource.prop(2L, "bob", 200.0)
      .copy(buildings = null, ownership = null)
    val st = Engine.runLoad(spark, new FakeSource(Map(1L -> good, 2L -> nulled)),
      Seq(1L, 2L), root, "c", IngestConfig(workers = 2))
    assert(st.scraped == 2)
    assert(Lake.read(spark, root, "c", "buildings").count() == 1,
      "the real building must be written despite the sibling's null Seq")
    assert(Lake.read(spark, root, "c", "ownership").count() == 1)
  }

  test("caller-supplied unsorted ids: batches checkpoint in ID order, resume is exact") {
    val root = tmpDir("lake")
    val data = mkData((1L to 10L).map(i => i -> 100.0 * i).toMap)
    val shuffled = Seq(9L, 2L, 7L, 4L, 10L, 1L, 6L, 3L, 8L, 5L, 2L) // dup + unsorted
    // ids 6-10 fail -> sorted batch 2 trips; batch 1 must be exactly 1..5
    intercept[SparkException] {
      Engine.runLoad(spark, new FakeSource(data, failFor = (6L to 10L).toSet), shuffled, root, "uns",
        IngestConfig(workers = 1, maxConsecutiveErrors = 3, checkpointEvery = 5, compactAfter = false))
    }
    assert(Checkpoints.load(spark, root, "uns").exists(_.lastEntryId == "5"))
    assert(Lake.read(spark, root, "uns", "properties").count() == 5)
    val s2 = Engine.runLoad(spark, new FakeSource(data), shuffled, root, "uns",
      IngestConfig(workers = 1, checkpointEvery = 5, compactAfter = false))
    assert(s2.scraped == 5) // only 6..10; 1..5 skipped by resume despite shuffle
    assert(Lake.read(spark, root, "uns", "properties").count() == 10)
  }

  test("photos download during load when photoDir is set (S11 hook, test_engine.py:316-341)") {
    val root = tmpDir("lake")
    val photoDir = tmpDir("photos")
    PhotoFakes.fetches.set(0)
    val data = mkData(Map(1L -> 100.0, 2L -> 200.0, 3L -> 300.0)).map { case (pid, r) =>
      // pid 2's photo is a default.jpg placeholder -> must be skipped in-plan
      val url = if (pid == 2) "http://host/images/default.jpg" else s"http://host/photos/$pid.jpg"
      pid -> r.copy(buildings = r.buildings.map(_.copy(photo_url = Some(url))))
    }
    val src = new FakeSource(data) {
      override def photoItems: Option[ScrapeResult => Seq[(String, Long)]] =
        Some(r => r.buildings.flatMap(_.photo_url.map(_ -> r.property.pid)))
      override def fetchPhoto(url: String): Array[Byte] = {
        PhotoFakes.fetches.incrementAndGet(); url.getBytes("UTF-8")
      }
    }
    val cfg = IngestConfig(workers = 2, checkpoint = false, compactAfter = false,
      photoDir = Some(photoDir))
    Engine.runLoad(spark, src, Seq(1L, 2L, 3L), root, "pv", cfg)

    def photo(pid: Long) = new java.io.File(s"$photoDir/pv/$pid.jpg")
    assert(photo(1).exists() && photo(3).exists())
    assert(!photo(2).exists()) // placeholder filtered
    assert(new String(java.nio.file.Files.readAllBytes(photo(1).toPath), "UTF-8") ==
      "http://host/photos/1.jpg")
    assert(PhotoFakes.fetches.get() == 2)

    // rerun over the same scope: the existence check makes downloads idempotent
    Engine.runLoad(spark, src, Seq(1L, 2L, 3L), root, "pv", cfg)
    assert(PhotoFakes.fetches.get() == 2) // nothing re-fetched
  }

  test("no photoDir (or no photoItems) -> load runs with zero photo side effects") {
    val root = tmpDir("lake")
    val data = mkData(Map(1L -> 100.0))
    val s = Engine.runLoad(spark, new FakeSource(data), Seq(1L), root, "np",
      IngestConfig(workers = 1, checkpoint = false, compactAfter = false))
    assert(s.scraped == 1) // fetchPhoto default throws, but is never invoked
  }

  test("rangeBatches: wide sparse ID space slices to ascending covering batches") {
    // sparse 64-bit-ish spread — the shape that would OOM a naive collect at scale
    val ids = (1L to 100L).map(i => i * 1000003L + (i % 7) * 17L)
    val known = ids.toDF("id")
    val batches = Engine.rangeBatches(known, 10).toList
    assert(batches.nonEmpty && batches.forall(_.nonEmpty))
    assert(batches.flatten == ids.sorted.toList) // exact cover, ascending
    assert(batches.map(_.max).sliding(2).forall(p => p.size < 2 || p(0) < p(1)))
    // empty set -> no batches
    assert(Engine.rangeBatches(spark.emptyDataset[Long].toDF("id"), 10).isEmpty)
    // single id
    assert(Engine.rangeBatches(Seq(42L).toDF("id"), 10).toList == List(Seq(42L)))
    // full-width Long range: span and end-bound arithmetic must not wrap
    // (a wrapped span degraded to one filter per ID value; a wrapped end
    // bound silently dropped Long.MaxValue from the refresh)
    val extremes = Seq(Long.MinValue, -7L, 0L, 42L, Long.MaxValue - 1, Long.MaxValue)
    val wide = Engine.rangeBatches(extremes.toDF("id"), 2).toList
    assert(wide.flatten == extremes.sorted.toList, s"lost IDs at the range edges: $wide")
  }

  test("refresh runs bucket-by-bucket (checkpointEvery slices) and re-scrapes every known id") {
    val root = tmpDir("lake")
    val ids = (1L to 30L).map(i => i * 997L) // sparse ids
    val data = mkData(ids.map(i => i -> 100.0).toMap)
    Engine.runLoad(spark, new FakeSource(data), ids, root, "rb",
      IngestConfig(workers = 2, checkpoint = false, compactAfter = false))
    val s = Engine.runRefresh(spark, new FakeSource(data), root, "rb",
      IngestConfig(workers = 2, checkpoint = false, compactAfter = false, checkpointEvery = 7))
    assert(s.scraped == 30) // every known entity re-scraped across ~5 buckets
    assert(s.rowsWritten.values.sum == 0) // nothing changed -> hash dedup drops all
  }

  test("compaction merges session files and preserves rows (D9)") {
    val root = tmpDir("lake")
    val data = mkData((1L to 6L).map(i => i -> 10.0 * i).toMap)
    Engine.runLoad(spark, new FakeSource(data), (1L to 6L), root, "z",
      IngestConfig(workers = 4, checkpoint = false, compactAfter = true))
    val dir = new java.io.File(s"$root/z/properties")
    val parquets = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquets == 1) // compacted from up to 4 task files
    assert(Lake.read(spark, root, "z", "properties").count() == 6)
    assert(Lake.scopes(spark, root) == Seq("z")) // _checkpoints skipped
  }
}
