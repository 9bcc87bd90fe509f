package graft

import graft.lake.Lake
import graft.sources.ct.CtDataSource

/** JVM-static fetch fake: task closures are serialized even in local mode,
  * so per-page call counts and the crash switch live in a companion-style
  * object (one JVM in local[n]) rather than captured test fields.
  */
object CtCrashState {
  @volatile var failAt: Long = -1L
  @volatile var pages: Map[Long, Seq[String]] = Map.empty
  val calls = scala.collection.concurrent.TrieMap[Long, Int]()
  def reset(p: Map[Long, Seq[String]], failAt: Long): Unit = {
    this.pages = p; this.failAt = failAt; calls.clear()
  }
  def fetch: (String, Long, Int) => Seq[String] = (_, off, _) => {
    calls.put(off, calls.getOrElse(off, 0) + 1)
    if (off == failAt) throw new RuntimeException(s"fake HTTP failure at offset $off")
    pages.getOrElse(off, Nil)
  }
}

/** CT Socrata ingestion — mirrors /root/reference/tests/test_llc_ct_data.py
  * scenarios: flatten/rename, pagination, load+refresh with both versions
  * visible in the append-only lake.
  */
class CtDataSpec extends SparkSpec {
  import spark.implicits._

  private def fakeFetch(rowsByDataset: Map[String, Seq[String]]): (String, Long, Int) => Seq[String] =
    (ds, off, limit) => rowsByDataset.getOrElse(ds, Nil).slice(off.toInt, off.toInt + limit)

  test("pagination keys: 120001 rows -> 3 pages of dataset:offset") {
    assert(
      CtDataSource.pageKeys("n7gp-d28j", 120001L) ==
        Seq("n7gp-d28j:0", "n7gp-d28j:50000", "n7gp-d28j:100000")
    )
    assert(CtDataSource.splitKey("n7gp-d28j:50000") == ("n7gp-d28j", 50000L))
    assert(CtDataSource.pageKeys("x", 0L) == Seq("x:0")) // at least one probe page
  }

  test("businesses load renames id -> business_id and writes the scope table") {
    val root = tmpDir("ct")
    val rows = Seq(
      """{"id": "001", "name": "Test Corp", "status": "Active"}""",
      """{"id": "002", "name": "Other LLC", "status": "Dissolved"}"""
    )
    val (table, n) = CtDataSource.loadDataset(
      spark, "n7gp-d28j", rows.size.toLong, fakeFetch(Map("n7gp-d28j" -> rows)), root)
    assert(table == "businesses" && n == 2)
    val df = Lake.read(spark, root, CtDataSource.Scope, "businesses")
    assert(df.columns.contains("business_id") && !df.columns.contains("id"))
    assert(df.columns.contains("row_hash") && df.columns.contains("scraped_at"))
    assert(df.filter($"status" === "Active").select($"business_id").as[String].head() == "001")
  }

  test("refresh writes only changed rows; history keeps both versions") {
    val root = tmpDir("ct")
    val v1 = Seq(
      """{"id": "001", "name": "Test Corp", "status": "Active"}""",
      """{"id": "002", "name": "Other LLC", "status": "Active"}"""
    )
    CtDataSource.loadDataset(spark, "n7gp-d28j", 2L, fakeFetch(Map("n7gp-d28j" -> v1)), root)

    val v2 = Seq(
      """{"id": "001", "name": "Test Corp", "status": "Active"}""",
      """{"id": "002", "name": "Other LLC", "status": "Dissolved"}"""
    )
    val (_, n) = CtDataSource.loadDataset(
      spark, "n7gp-d28j", 2L, fakeFetch(Map("n7gp-d28j" -> v2)), root, refresh = true)
    assert(n == 1) // only the changed business

    val df = Lake.read(spark, root, CtDataSource.Scope, "businesses")
    assert(df.count() == 3)
    assert(df.filter($"business_id" === "002").count() == 2) // both versions visible
  }

  test("a zero-change refresh appends no file at all") {
    val root = tmpDir("ct")
    val rows = Seq("""{"id": "001", "name": "X", "status": "Active"}""")
    CtDataSource.loadDataset(spark, "n7gp-d28j", 1L, fakeFetch(Map("n7gp-d28j" -> rows)), root)
    val dir = new java.io.File(s"$root/${CtDataSource.Scope}/businesses")
    val before = dir.listFiles().count(_.getName.endsWith(".parquet"))
    val (_, n) = CtDataSource.loadDataset(spark, "n7gp-d28j", 1L, fakeFetch(Map("n7gp-d28j" -> rows)), root, refresh = true)
    assert(n == 0)
    val after = dir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(after == before) // no schema-only junk file
  }

  test("crash mid-load: rerun resumes past checkpointed pages, no duplicate rows") {
    val root = tmpDir("ct")
    val pages = Map( // offset -> page rows (multi-page without 50k fixtures)
      0L -> Seq("""{"id": "a1", "v": "1"}""", """{"id": "a2", "v": "2"}"""),
      50000L -> Seq("""{"id": "b1", "v": "3"}"""),
      100000L -> Seq("""{"id": "c1", "v": "4"}""", """{"id": "c2", "v": "5"}""")
    )
    CtCrashState.reset(pages, failAt = 100000L)
    intercept[Exception] {
      CtDataSource.loadDataset(spark, "n7gp-d28j", 150000L, CtCrashState.fetch, root,
        pagesPerBatch = 1)
    }
    // pages 0 and 50000 landed and checkpointed before the crash
    assert(Lake.read(spark, root, CtDataSource.Scope, "businesses").count() == 3)

    CtCrashState.failAt = -1L // heal and rerun the same load
    val (_, n) = CtDataSource.loadDataset(spark, "n7gp-d28j", 150000L, CtCrashState.fetch, root,
      pagesPerBatch = 1)
    assert(n == 2) // only the crashed page's rows
    assert(CtCrashState.calls.getOrElse(0L, 0) == 1) // page 0 never re-fetched
    val df = Lake.read(spark, root, CtDataSource.Scope, "businesses")
    assert(df.count() == 5)
    assert(df.select($"business_id").distinct().count() == 5) // idempotent, no dupes
  }

  test("loadAll covers every registered dataset (D10)") {
    val root = tmpDir("ct")
    val data = CtDataSource.Datasets.keys.map { ds =>
      ds -> Seq(s"""{"unique_key": "$ds-1", "v": "x"}""")
    }.toMap
    val written = CtDataSource.loadAll(spark, data.map { case (k, v) => k -> v.size.toLong }, fakeFetch(data), root)
    assert(written.keySet == CtDataSource.Datasets.values.toSet)
    assert(written.values.forall(_ == 1L))
    assert(Lake.tables(spark, root, CtDataSource.Scope).sorted ==
      CtDataSource.Datasets.values.toSeq.sorted)
  }

  test("a non-numeric checkpoint cursor voids the doc instead of wedging the scope") {
    val root = tmpDir("ct")
    val rows = Seq(
      """{"id":"b1","name":"Acme"}""",
      """{"id":"b2","name":"Brix"}""")
    // a hand-edited / reference-written cursor shape the doc allows; an
    // unguarded .toLong threw on every later load until the file was
    // hand-deleted — and keeping total_scraped=500 would double-count
    // every re-fetched page in the rewritten doc
    graft.lake.Checkpoints.save(spark, root,
      graft.lake.Checkpoint("llc_ct_data.businesses", "MBLU-104-7", 500L, "2026-01-01T00:00:00Z"))
    val (table, n) = CtDataSource.loadDataset(
      spark, "n7gp-d28j", 2L, fakeFetch(Map("n7gp-d28j" -> rows)), root)
    assert(table == "businesses" && n == 2, "voided cursor must mean start-over, not a throw")
    val cp = graft.lake.Checkpoints.load(spark, root, "llc_ct_data.businesses")
    assert(cp.map(_.totalScraped).contains(2L),
      s"the voided doc's stale total must not seed the restart: $cp")
  }

  test("in-batch duplicate rows collapse: unstable pagination cannot double a content version") {
    val root = tmpDir("ct")
    // two pages fetched in ONE batch, with row b2 straddling the boundary
    // (the unstable-pagination shape: an insert between the two page
    // fetches shifts an existing row into the next page) — both copies
    // share a row_hash and a scraped_at stamp, so only in-batch dedup can
    // collapse them
    val fetch: (String, Long, Int) => Seq[String] = (_, off, _) =>
      if (off == 0L) Seq("""{"id":"b1","name":"Acme"}""", """{"id":"b2","name":"Brix"}""")
      else Seq("""{"id":"b2","name":"Brix"}""", """{"id":"b3","name":"Corp"}""")
    val (_, n) = CtDataSource.loadDataset(
      spark, "n7gp-d28j", CtDataSource.PageSize + 1L, fetch, root)
    assert(n == 3, s"the straddling row must write once, wrote $n")
    val got = Lake.read(spark, root, "llc_ct_data", "businesses")
    assert(got.count() == 3)
    assert(got.filter($"business_id" === "b2").count() == 1,
      "one content version must never hold two identical rows")
  }
}
