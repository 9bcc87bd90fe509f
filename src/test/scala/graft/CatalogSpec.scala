package graft

import graft.lake.{GraftCatalog, Lake}
import graft.scd.Scd
import org.apache.spark.sql.functions._

/** The lake as a SQL `TableCatalog`: three-part names resolve to table
  * directories at query time, the W1/W4 product queries run over them, and
  * the pushdown/pruning the path API gets survives the name-based route.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def mkLake(): String = {
    val root = tmpDir("catalog_lake")
    val rows = for (u <- 1L to 20L; v <- 1 to 5)
      yield (u, v, s"state-$u-$v", java.sql.Timestamp.valueOf(f"2024-01-$v%02d 10:00:00"))
    Lake.append(rows.toDF("user_id", "version", "payload", "ts"), root, "app", "entities")
    Lake.append(Seq((1L, "x")).toDF("k", "v"), root, "other", "misc")
    root
  }

  test("three-part names: listing, W1 current-state, and W4 history match the path API") {
    val root = mkLake()
    GraftCatalog.register(spark, "graftlake", root)

    assert(spark.sql("SHOW NAMESPACES IN graftlake").as[String].collect().toSet == Set("app", "other"))
    assert(
      spark.sql("SHOW TABLES IN graftlake.app").select($"tableName").as[String].collect().toSeq
        == Seq("entities"))

    // W1 — current state via SQL over the three-part name
    val w1 = spark.sql("""
      SELECT user_id, payload FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, version DESC) AS rn
        FROM graftlake.app.entities) WHERE rn = 1
      ORDER BY user_id
    """)
    val w1Path = Scd
      .currentState(Lake.read(spark, root, "app", "entities"), col("user_id"), col("ts"), col("version"))
      .select($"user_id", $"payload")
      .orderBy($"user_id")
    assert(w1.collect().toSeq == w1Path.collect().toSeq)
    assert(w1.count() == 20)

    // W4 — one entity's history
    val w4 = spark.sql(
      "SELECT version, payload FROM graftlake.app.entities WHERE user_id = 7 ORDER BY ts, version")
    assert(w4.as[(Int, String)].collect().toSeq == (1 to 5).map(v => (v, s"state-7-$v")))
  }

  test("pushdown and column pruning survive the name-based route") {
    val root = mkLake()
    GraftCatalog.register(spark, "graftlake2", root)
    val df = spark.sql("SELECT payload FROM graftlake2.app.entities WHERE user_id = 7")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(user_id,7"),
      s"expected the key predicate pushed into the scan:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("ts:timestamp"),
      s"expected the scan schema pruned to the selected columns:\n$plan")
  }

  test("hive-partitioned lake tables prune partitions through the catalog") {
    val root = tmpDir("catalog_part")
    val rows = (1 to 400).map(i => (i.toLong, s"p$i", s"2024-01-${i % 4 + 1}"))
    Lake.appendPartitioned(
      rows.toDF("id", "payload", "ingest_date"), root, "app", "events", Seq("ingest_date"))
    GraftCatalog.register(spark, "graftpart", root)
    val df = spark.sql(
      "SELECT id FROM graftpart.app.events WHERE ingest_date = '2024-01-2'")
    assert(df.count() == 100)
    // the predicate must land as a PARTITION filter on the scan (applied at
    // file-listing time inside planInputPartitions), not as a data filter —
    // note Dataset.inputFiles is the wrong probe here: it reports the
    // relation's unpruned file index, partition filters notwithstanding
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scan.contains("PartitionFilters") && scan.contains("ingest_date") &&
      scan.contains("2024-01-2"), s"expected the partition predicate on the scan:\n$scan")
    assert(scan.contains("ReadSchema: struct<id:bigint>"),
      s"expected the scan pruned to the selected column:\n$scan")
  }

  test("CREATE TABLE AS SELECT materializes a queryable lake table") {
    val root = mkLake()
    GraftCatalog.register(spark, "graftctas", root)
    spark.sql("""
      CREATE TABLE graftctas.app.latest AS
      SELECT user_id, payload FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, version DESC) AS rn
        FROM graftctas.app.entities) WHERE rn = 1
    """)
    // the derived table is a plain directory-table like any other: listed,
    // queryable by name, and present on disk for path-based readers too
    assert(spark.sql("SHOW TABLES IN graftctas.app").select($"tableName").as[String].collect().toSet
      == Set("entities", "latest"))
    assert(spark.sql("SELECT count(*) AS n FROM graftctas.app.latest").as[Long].head() == 20)
    assert(Lake.read(spark, root, "app", "latest").count() == 20)
    spark.sql("DROP TABLE graftctas.app.latest")
    assert(!new java.io.File(s"$root/app/latest").exists())
  }

  test("INSERT INTO appends through the catalog; mergeSchema tolerates drift") {
    val root = mkLake()
    GraftCatalog.register(spark, "graftlake3", root)
    spark.sql("""
      INSERT INTO graftlake3.app.entities
      SELECT 99L AS user_id, 1 AS version, 'fresh' AS payload, TIMESTAMP '2024-02-01 00:00:00' AS ts
    """)
    assert(
      spark.sql("SELECT payload FROM graftlake3.app.entities WHERE user_id = 99").as[String].head()
        == "fresh")
    // drift: a batch with an extra column appended via the path API is
    // visible through the catalog (mergeSchema contract)
    Lake.append(
      Seq((100L, 1, "drifted", java.sql.Timestamp.valueOf("2024-02-02 00:00:00"), "extra"))
        .toDF("user_id", "version", "payload", "ts", "note"),
      root, "app", "entities")
    val cols = spark.sql("SELECT * FROM graftlake3.app.entities WHERE user_id = 100").columns.toSet
    assert(cols.contains("note"), s"drifted column missing through the catalog: $cols")
  }

  test("plain CREATE TABLE declares a durable schema: INSERT INTO an empty table works") {
    // the declared schema must survive to the first INSERT (which resolves
    // the table via loadTable) — without the footer-only seed file, schema
    // inference over the bare directory throws and the flow can never start
    val root = mkLake()
    GraftCatalog.register(spark, "graftddl", root)
    spark.sql("CREATE TABLE graftddl.app.notes (id BIGINT, body STRING)")
    assert(spark.sql("SELECT count(*) AS n FROM graftddl.app.notes").as[Long].head() == 0L)
    spark.sql("INSERT INTO graftddl.app.notes VALUES (1L, 'first'), (2L, 'second')")
    assert(
      spark.sql("SELECT body FROM graftddl.app.notes ORDER BY id").as[String].collect().toSeq
        == Seq("first", "second"))
  }

  test("RENAME refuses an existing target instead of nesting/corrupting it") {
    val root = mkLake()
    GraftCatalog.register(spark, "graftmv", root)
    spark.sql("CREATE TABLE graftmv.app.a AS SELECT 1L AS id")
    spark.sql("CREATE TABLE graftmv.app.b AS SELECT 2L AS id")
    // fs.rename(src, existingDir) silently moves a INSIDE b on local/HDFS
    // semantics — the catalog must reject before that can happen
    intercept[org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException] {
      spark.sql("ALTER TABLE graftmv.app.a RENAME TO app.b")
    }
    // both tables intact, then a clean rename to a fresh name succeeds
    assert(spark.sql("SELECT id FROM graftmv.app.a").as[Long].head() == 1L)
    assert(spark.sql("SELECT id FROM graftmv.app.b").as[Long].head() == 2L)
    spark.sql("ALTER TABLE graftmv.app.a RENAME TO app.c")
    assert(spark.sql("SELECT id FROM graftmv.app.c").as[Long].head() == 1L)
    assert(!new java.io.File(s"$root/app/a").exists())
  }

  /** A lake table carrying the engine's stamp triplet (uuid, scraped_at,
    * row_hash): 10 entities × 5 observations, content changing on
    * observations 1/3/5 only — so __versions has 3 rows per entity.
    */
  private def mkScdLake(): String = {
    val root = tmpDir("catalog_scd")
    val rows = for (u <- 1 to 10; o <- 1 to 5) yield {
      val content = s"state-$u-${(o + 1) / 2}" // changes at o=1,3,5
      (s"uuid-$u", u.toLong, content,
        java.sql.Timestamp.valueOf(f"2024-03-$o%02d 09:00:00"), s"hash-$u-${(o + 1) / 2}")
    }
    Lake.append(
      rows.toDF("uuid", "pid", "payload", "scraped_at", "row_hash"), root, "vgsi", "properties")
    root
  }

  test("derived SCD views: __current and __versions run the README workflow as pure SQL") {
    val root = mkScdLake()
    GraftCatalog.register(spark, "graftscd", root)

    // W1 — current state, by name only
    val cur = spark.sql(
      "SELECT uuid, payload FROM graftscd.vgsi.properties__current ORDER BY pid")
    val curPath = Scd
      .currentState(
        Lake.read(spark, root, "vgsi", "properties"), col("uuid"), col("scraped_at"), col("row_hash"))
      .select($"uuid", $"payload").orderBy($"pid")
    assert(cur.collect().toSeq == curPath.collect().toSeq)
    assert(cur.count() == 10)
    assert(spark.sql("SELECT payload FROM graftscd.vgsi.properties__current WHERE uuid = 'uuid-7'")
      .as[String].head() == "state-7-3")

    // W3/W4 — version chain; history of one entity is a filter on it
    val ver = spark.sql("""
      SELECT version, payload FROM graftscd.vgsi.properties__versions
      WHERE uuid = 'uuid-7' ORDER BY version""")
    assert(ver.as[(Int, String)].collect().toSeq
      == Seq((1, "state-7-1"), (2, "state-7-2"), (3, "state-7-3")))
    assert(spark.sql("SELECT count(*) AS n FROM graftscd.vgsi.properties__versions").as[Long].head() == 30)

    // W5 — changed-since is the __versions view filtered
    val changed = spark.sql("""
      SELECT uuid FROM graftscd.vgsi.properties__versions
      WHERE version > 1 AND scraped_at >= TIMESTAMP '2024-03-05 00:00:00'""")
    assert(changed.count() == 10) // every entity changed at o=5

    // the ViewCatalog SPI lists the derived pair; a triplet-less table gets
    // none (OSS `SHOW VIEWS` has no v2 exec node, so the SQL spelling of
    // this listing doesn't exist — the SPI is the listing surface)
    Lake.append(Seq((1L, "x")).toDF("k", "v"), root, "vgsi", "misc")
    val views = spark.sessionState.catalogManager.catalog("graftscd")
      .asInstanceOf[GraftCatalog].listViews("vgsi").map(_.name).toSet
    assert(views == Set("properties__current", "properties__versions"), s"views: $views")
  }

  test("one-part view names resolve after USE, wherever bare table names do") {
    val root = mkScdLake()
    GraftCatalog.register(spark, "graftuse", root)
    try {
      spark.sql("USE graftuse.vgsi")
      // bare `properties` resolves via the current namespace — the bare
      // __current view must resolve in the same session state (the rule
      // used to require >= 2 name parts, so only the view failed)
      assert(spark.sql("SELECT count(*) FROM properties").as[Long].head() == 50)
      assert(spark.sql("SELECT count(*) FROM properties__current").as[Long].head() == 10)
      assert(spark.sql("SELECT payload FROM properties__current WHERE uuid = 'uuid-7'")
        .as[String].head() == "state-7-3")
    } finally spark.sql("USE spark_catalog")
  }

  test("__versions agrees with Scd.withVersions row-for-row when hashes are NULL") {
    // Scd.withVersions uses =!= (NULL-propagating): a NULL hash is never a
    // change. The view must match — NOT(<=>) would count NULL↔value
    // transitions and diverge from the Scala API.
    val root = tmpDir("catalog_scd_null")
    val rows = Seq(
      ("u1", "a", java.sql.Timestamp.valueOf("2024-03-01 09:00:00"), "h1"),
      ("u1", "b", java.sql.Timestamp.valueOf("2024-03-02 09:00:00"), null),
      ("u1", "c", java.sql.Timestamp.valueOf("2024-03-03 09:00:00"), "h1"),
      ("u2", "d", java.sql.Timestamp.valueOf("2024-03-01 09:00:00"), null),
      ("u2", "e", java.sql.Timestamp.valueOf("2024-03-02 09:00:00"), "h2"))
    Lake.append(rows.toDF("uuid", "payload", "scraped_at", "row_hash"), root, "vgsi", "t")
    GraftCatalog.register(spark, "graftnull", root)
    val viaView = spark.sql(
      "SELECT uuid, payload, version FROM graftnull.vgsi.t__versions ORDER BY uuid, version")
      .as[(String, String, Int)].collect().toSeq
    val viaApi = Scd
      .withVersions(Lake.read(spark, root, "vgsi", "t"),
        col("uuid"), col("row_hash"), col("scraped_at"), col("row_hash"))
      .select($"uuid", $"payload", $"version")
      .orderBy($"uuid", $"version")
      .as[(String, String, Int)].collect().toSeq
    assert(viaView == viaApi, s"view $viaView != api $viaApi")
  }

  test("derived SCD views resolve a differently-cased stamp triplet") {
    // Spark SQL resolution is case-insensitive by default, so a lake table
    // cased UUID/Scraped_At/Row_Hash must serve __current/__versions
    // exactly like a lowercase one — and the generated view SQL must emit
    // the schema's ACTUAL casing so it resolves either way.
    val root = tmpDir("catalog_scd_case")
    val rows = for (u <- 1 to 4; o <- 1 to 3) yield {
      (s"uuid-$u", s"state-$u-$o",
        java.sql.Timestamp.valueOf(f"2024-03-$o%02d 09:00:00"), s"hash-$u-$o")
    }
    Lake.append(
      rows.toDF("UUID", "payload", "Scraped_At", "Row_Hash"), root, "vgsi", "cased")
    GraftCatalog.register(spark, "graftcase", root)
    val cat = spark.sessionState.catalogManager.catalog("graftcase").asInstanceOf[GraftCatalog]
    assert(cat.listViews("vgsi").map(_.name).toSet
      == Set("cased__current", "cased__versions"), "views must list for the cased triplet")
    assert(spark.sql("SELECT payload FROM graftcase.vgsi.cased__current WHERE UUID = 'uuid-2'")
      .as[String].head() == "state-2-3")
    assert(spark.sql("SELECT count(*) AS n FROM graftcase.vgsi.cased__versions").as[Long].head() == 12)
  }

  test("entity-key predicates push through the derived views into the parquet scan") {
    val root = mkScdLake()
    GraftCatalog.register(spark, "graftscd2", root)
    val df = spark.sql(
      "SELECT payload FROM graftscd2.vgsi.properties__current WHERE uuid = 'uuid-3'")
    assert(df.as[String].head() == "state-3-3")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(uuid,uuid-3"),
      s"expected the key predicate pushed below the window into the scan:\n$plan")
  }

  test("TVF sugar: graft_history and graft_changed_since run W4/W5 by name with pushdown") {
    val root = mkScdLake()
    GraftCatalog.register(spark, "grafttvf", root)

    // W4 — one entity's full version chain, copy-paste SQL
    val hist = spark.sql(
      "SELECT version, payload FROM graft_history('grafttvf.vgsi.properties', 'uuid-7')")
    assert(hist.as[(Int, String)].collect().toSeq
      == Seq((1, "state-7-1"), (2, "state-7-2"), (3, "state-7-3")))
    // the key filter the TVF synthesized reaches the parquet scan
    val plan = hist.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(uuid,uuid-7"),
      s"expected the TVF's key predicate pushed into the scan:\n$plan")

    // W5 — entities whose content changed at-or-after a timestamp
    val changed = spark.sql("""
      SELECT uuid FROM graft_changed_since('grafttvf.vgsi.properties',
                                           TIMESTAMP '2024-03-05 00:00:00')""")
    assert(changed.count() == 10) // every entity changed at o=5
    // and it agrees with the documented __versions filter it expands to
    val viaView = spark.sql("""
      SELECT uuid FROM grafttvf.vgsi.properties__versions
      WHERE version > 1 AND scraped_at >= TIMESTAMP '2024-03-05 00:00:00'""")
    assert(changed.as[String].collect().sorted.toSeq == viaView.as[String].collect().sorted.toSeq)

    // loud failures: non-string table arg, unknown catalog
    intercept[Exception](spark.sql("SELECT * FROM graft_history(42, 'k')").collect())
    intercept[Exception](
      spark.sql("SELECT * FROM graft_history('nosuch.vgsi.properties', 'k')").collect())
  }

  test("readonly catalog: DDL refused, INSERT fails at analysis, reads intact") {
    val root = mkScdLake()
    GraftCatalog.register(spark, "graftro", root, readonly = true)

    // reads — tables AND derived views — work verbatim
    assert(spark.sql("SELECT count(*) AS n FROM graftro.vgsi.properties").as[Long].head() == 50)
    assert(spark.sql("SELECT count(*) AS n FROM graftro.vgsi.properties__current").as[Long].head() == 10)

    def refused(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: chain(t.getCause)
      assert(
        chain(e).exists {
          case u: UnsupportedOperationException => u.getMessage.contains("read-only")
          case _ => false
        } || e.getMessage.contains("does not support append"),
        s"expected a read-only refusal for [$sql], got: $e")
    }
    refused("DROP TABLE graftro.vgsi.properties")
    refused("CREATE TABLE graftro.vgsi.scratch (id BIGINT)")
    refused("CREATE TABLE graftro.vgsi.scratch2 AS SELECT 1L AS id")
    refused("DROP NAMESPACE graftro.vgsi CASCADE")
    refused("ALTER TABLE graftro.vgsi.properties RENAME TO vgsi.renamed")
    refused("INSERT INTO graftro.vgsi.properties SELECT * FROM graftro.vgsi.properties LIMIT 1")

    // nothing was mutated
    assert(new java.io.File(s"$root/vgsi/properties").exists())
    assert(spark.sql("SELECT count(*) AS n FROM graftro.vgsi.properties").as[Long].head() == 50)
  }

  test("CREATE TABLE validates the namespace instead of silently truncating it") {
    val root = tmpDir("catalog_ns")
    GraftCatalog.register(spark, "graftns", root)
    val cat = spark.sessionState.catalogManager.catalog("graftns").asInstanceOf[GraftCatalog]
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.IntegerType)))
    // a multi-part namespace used to seed root/<ns0>/<t> (tail silently
    // dropped) while tableExists requires exactly one part — a table that
    // "creates" but can never resolve; an empty namespace was a bare AIOOBE
    import org.apache.spark.sql.connector.catalog.Identifier
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException] {
      cat.createTable(Identifier.of(Array("a", "b"), "t"), schema,
        Array.empty[org.apache.spark.sql.connector.expressions.Transform],
        new java.util.HashMap[String, String]())
    }
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException] {
      cat.createTable(Identifier.of(Array.empty[String], "t"), schema,
        Array.empty[org.apache.spark.sql.connector.expressions.Transform],
        new java.util.HashMap[String, String]())
    }
    assert(!new java.io.File(s"$root/a/t").exists(), "no stray directory from the rejected create")
  }

  test("view schema cache serves drifted appends fresh (listing-keyed invalidation)") {
    val root = tmpDir("catalog_cache")
    val rows = Seq(("uuid-1", "p1", java.sql.Timestamp.valueOf("2024-03-01 09:00:00"), "h1"))
    Lake.append(rows.toDF("uuid", "payload", "scraped_at", "row_hash"), root, "s", "t")
    GraftCatalog.register(spark, "graftcache", root)
    // resolve once (schema lands in the view cache), then append a DRIFTED
    // batch: the next view resolution must see the new column — the cache
    // key is the file listing, which the append changed
    assert(!spark.sql("SELECT * FROM graftcache.s.t__current").columns.contains("extra"))
    Lake.append(
      Seq(("uuid-2", "p2", java.sql.Timestamp.valueOf("2024-03-02 09:00:00"), "h2", 7))
        .toDF("uuid", "payload", "scraped_at", "row_hash", "extra"),
      root, "s", "t")
    val after = spark.sql("SELECT * FROM graftcache.s.t__current")
    assert(after.columns.contains("extra"), s"stale cached view schema: ${after.columns.toSeq}")
    assert(after.count() == 2)
  }
}
