package graft.lake

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, NoSuchViewException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{IntegerType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The lake as a Spark `TableCatalog`: three-part SQL names over the
  * directory layout, so the reference's DuckDB-on-the-lake workflow
  * (/root/reference/README.md:125-136 — `SELECT ... FROM properties ...`)
  * has a first-class SQL-over-names equivalent:
  *
  * {{{
  *   GraftCatalog.register(spark, "graft", "/data/lake")
  *   spark.sql("SELECT * FROM graft.vgsi.properties WHERE pid = 42")
  *   spark.sql("SHOW TABLES IN graft.vgsi")
  *   spark.sql("INSERT INTO graft.vgsi.notes SELECT ...")
  * }}}
  *
  * Resolution maps `catalog.scope.table` → `root/scope/table` at QUERY time
  * (no metastore, no registration per table — the directory IS the catalog,
  * exactly the reference's contract where dropping a parquet file into the
  * scope dir makes it queryable). Each table is served by Spark's own
  * parquet DSv2 ([[ParquetTable]]), so nothing is lost relative to the
  * path API: filter pushdown, column pruning, partition discovery/pruning
  * on hive-partitioned tables, and mergeSchema reads (the lake's
  * schema-drift contract) all flow through — CatalogSpec asserts pushdown
  * survives the three-part-name route. `INSERT INTO` appends through the
  * same committer as [[Lake.append]].
  *
  * At 100 TB the catalog itself does no work — it resolves names to paths;
  * scans, stats, and pruning are the parquet source's. A deployment sets
  * the two confs below cluster-wide instead of calling register():
  * `spark.sql.catalog.<name>=graft.lake.GraftCatalog` and
  * `spark.sql.catalog.<name>.root=<lake root>`.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces with ViewCatalog {

  private var catalogName: String = _
  private var root: String = _
  private var readonly: Boolean = false
  private var scdKey: String = _
  private var scdOrder: String = _
  private var scdHash: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null, s"catalog $name needs spark.sql.catalog.$name.root=<lake root>")
    // readonly=true enforces the lake's append-only contract AT the SQL
    // boundary: every DDL mutation throws and served tables lose their
    // write capability, so INSERT INTO fails at analysis — a shared
    // cluster can expose the lake to ad-hoc SQL users without also
    // exposing `DROP NAMESPACE ... CASCADE`
    readonly = options.getBoolean("readonly", false)
    // SCD triplet behind the derived __current/__versions views; defaults
    // are the ingest engine's stamp contract (Lake.stampMetadata + the
    // deterministic uuid)
    scdKey = options.getOrDefault("scd.key", "uuid")
    scdOrder = options.getOrDefault("scd.order", "scraped_at")
    scdHash = options.getOrDefault("scd.hash", "row_hash")
  }

  private def mutate(op: String): Unit =
    if (readonly)
      throw new UnsupportedOperationException(
        s"catalog $catalogName is read-only (spark.sql.catalog.$catalogName.readonly=true): $op refused")

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active
  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def scopeOf(namespace: Array[String]): String = namespace match {
    case Array(scope) => scope
    case _ => throw new NoSuchNamespaceException(namespace)
  }

  // ---- namespaces (scopes) ----

  override def listNamespaces(): Array[Array[String]] =
    Lake.scopes(spark, root).map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && Lake.scopes(spark, root).contains(namespace(0))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) Map("location" -> s"$root/${scopeOf(namespace)}").asJava
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String], metadata: util.Map[String, String]): Unit = {
    mutate("CREATE NAMESPACE")
    fs.mkdirs(new Path(s"$root/${scopeOf(namespace)}"))
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    mutate("DROP NAMESPACE")
    val scope = scopeOf(namespace)
    if (!cascade && Lake.tables(spark, root, scope).nonEmpty)
      throw new IllegalStateException(s"namespace $scope is not empty")
    fs.delete(new Path(s"$root/$scope"), true)
  }

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val scope = scopeOf(namespace)
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Lake.tables(spark, root, scope).map(t => Identifier.of(Array(scope), t)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 &&
      fs.exists(new Path(Lake.tablePath(root, ident.namespace()(0), ident.name)))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val path = Lake.tablePath(root, ident.namespace()(0), ident.name)
    // mergeSchema mirrors Lake.read: the lake tolerates schema drift across
    // append batches, and a name-based read must see the same union schema
    // a path-based read sees
    val t = ParquetTable(
      s"$catalogName.${ident.namespace()(0)}.${ident.name}",
      spark,
      new CaseInsensitiveStringMap(Map("path" -> path, "mergeSchema" -> "true").asJava),
      Seq(path),
      None,
      classOf[ParquetFileFormat]
    )
    if (readonly) new GraftCatalog.ReadOnlyTable(t) else t
  }

  /** CREATE TABLE materializes the directory; the schema lives in the data,
    * not a metastore — the lake's schema-on-read contract. For a plain
    * CREATE TABLE (no AS SELECT) "in the data" means a footer-only parquet
    * file carrying the declared schema: the first INSERT INTO resolves the
    * table through [[loadTable]], whose schema inference would fail on a
    * bare directory, so the declared schema must be durably readable
    * before any row lands. The seed file holds zero rows — scans skip it,
    * appends merge with it, compaction folds it away.
    */
  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]
  ): Table = {
    mutate("CREATE TABLE")
    require(partitions.isEmpty, "declare partitioning by writing hive-partitioned data instead")
    // scopeOf, not namespace()(0): a multi-part namespace would silently
    // drop its tail and seed root/<ns0>/<t> — a table that "created" but
    // can never be resolved (tableExists requires exactly one part); an
    // empty namespace would throw a bare AIOOBE
    val path = Lake.tablePath(root, scopeOf(ident.namespace()), ident.name)
    fs.mkdirs(new Path(path))
    if (schema.fields.nonEmpty)
      spark
        .createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("append").parquet(path)
    ParquetTable(
      s"$catalogName.${ident.namespace()(0)}.${ident.name}",
      spark,
      new CaseInsensitiveStringMap(Map("path" -> path, "mergeSchema" -> "true").asJava),
      Seq(path),
      Some(schema),
      classOf[ParquetFileFormat]
    )
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "the lake is append-only; schema evolves by appending drifted batches (mergeSchema)")

  override def dropTable(ident: Identifier): Boolean = {
    mutate("DROP TABLE")
    tableExists(ident) &&
      fs.delete(new Path(Lake.tablePath(root, ident.namespace()(0), ident.name)), true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    mutate("ALTER TABLE RENAME")
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    require(oldIdent.namespace.sameElements(newIdent.namespace), "rename stays within a scope")
    // rename onto an existing directory would NEST the source inside it on
    // HDFS/local semantics (old table vanishes, new table corrupts) — and
    // fs.rename reports failure by returning false, not throwing
    if (tableExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(newIdent)
    val ok = fs.rename(
      new Path(Lake.tablePath(root, oldIdent.namespace()(0), oldIdent.name)),
      new Path(Lake.tablePath(root, newIdent.namespace()(0), newIdent.name)))
    if (!ok)
      throw new IllegalStateException(
        s"rename ${oldIdent.name} -> ${newIdent.name} failed at the filesystem layer")
  }

  // ---- derived SCD views ----
  //
  // The reference's flagship lake queries (/root/reference/README.md:125-136
  // — current state, version history, changed-since) are window queries
  // over the stamp triplet (uuid, scraped_at, row_hash). The Scala surface
  // is graft.scd.Scd; this is the pure-SQL surface: for every lake table
  // carrying the triplet, the catalog serves two DERIVED views,
  //
  //   <cat>.<scope>.<table>__current   — W1, latest row per entity
  //   <cat>.<scope>.<table>__versions  — W3, change-only rows numbered
  //                                      ascending per entity as `version`
  //
  // so `SELECT * FROM graft.vgsi.properties__current WHERE pid = 42` is the
  // whole workflow, no Scala. W5 (changed-since) is the __versions view
  // filtered: `WHERE version > 1 AND scraped_at >= ...`.
  //
  // The views are DEFINED BY THE LAYOUT, like the tables: nothing is
  // registered or persisted, loadView synthesizes the SQL text against the
  // live table schema at resolution time. Predicates on the entity key
  // push through the window (Catalyst moves partition-key filters below
  // Window), so the point-query history of a 100 TB lake still prunes at
  // the scan — CatalogSpec asserts PushedFilters through the view.

  private val ViewSuffixes = GraftCatalog.viewSuffixes

  /** The base table ident a view name derives from, if the name is ours. */
  private def viewBase(ident: Identifier): Option[(Identifier, String)] =
    ViewSuffixes.collectFirst {
      case s if ident.name.endsWith(s) && ident.name.length > s.length =>
        (Identifier.of(ident.namespace, ident.name.stripSuffix(s)), s)
    }

  /** The configured stamp-column names (scd.key, scd.order, scd.hash) —
    * the TVF sugar ([[graft.functions.GraftSqlFunctions]]'s `graft_history`
    * / `graft_changed_since`) reads them to synthesize its filters.
    */
  def scdColumnNames: (String, String, String) = (scdKey, scdOrder, scdHash)

  /** Resolve the stamp triplet against the table's ACTUAL field names —
    * case-insensitively, matching Spark SQL's default resolution (a lake
    * table cased `UUID`/`Scraped_At` must serve views exactly like one
    * cased `uuid`/`scraped_at`; a case-sensitive match here would silently
    * serve NO views while SQL users could resolve the columns fine). Exact
    * match wins when two fields differ only by case. The RESOLVED names
    * (the schema's own casing) are what the generated view SQL emits.
    */
  private def resolveScdTriplet(schema: StructType): Option[(String, String, String)] = {
    def find(n: String): Option[String] =
      schema.fieldNames.find(_ == n).orElse(schema.fieldNames.find(_.equalsIgnoreCase(n)))
    for { k <- find(scdKey); o <- find(scdOrder); h <- find(scdHash) } yield (k, o, h)
  }

  private def hasScdTriplet(schema: StructType): Boolean =
    resolveScdTriplet(schema).isDefined

  /** The table's read schema via the non-deprecated `columns()` surface
    * (`Table.schema()` is deprecated since 3.4; the v2 util that converts
    * is `private[sql]`, so convert the three fields the views need here).
    */
  private def schemaOf(t: Table): StructType =
    StructType(t.columns().map(c =>
      org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)))

  /** Schema of a base table for VIEW resolution, cached per file listing.
    * mergeSchema inference reads every parquet footer, and one view query
    * pays it twice (analysis calls viewExists, then loadView) while SHOW
    * VIEWS pays it once per table in the scope. The cache key is a digest
    * of the table's recursive file listing (path, mtime, length per file)
    * — ONE listing RPC sweep, which inference's own FileIndex does anyway,
    * replacing the footer reads; any append/compact/partition write
    * changes the listing and misses the cache, so drifted schemas are
    * never served stale. Bounded: one entry per table this catalog has
    * resolved views against.
    */
  private val viewSchemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, StructType)]()

  private def cachedSchema(base: Identifier): StructType = {
    // scopeOf, not namespace()(0) — same contract as loadTable/createTable:
    // a multi-part namespace must not silently truncate to its head and an
    // empty one must not throw AIOOBE. Every current caller pre-gates via
    // tableExists/listTables, but the path derivation must not depend on it.
    val path = Lake.tablePath(root, scopeOf(base.namespace()), base.name)
    val key = try {
      var h = 1125899906842597L
      val it = fs.listFiles(new Path(path), true)
      while (it.hasNext) {
        val f = it.next()
        h = h * 31 + f.getPath.toString.hashCode
        h = h * 31 + f.getModificationTime
        h = h * 31 + f.getLen
      }
      h
    } catch { case _: java.io.IOException => Long.MinValue } // unknown state: don't cache
    val hit = viewSchemaCache.get(path)
    if (hit != null && key != Long.MinValue && hit._1 == key) hit._2
    else {
      val s = schemaOf(loadTable(base))
      if (key != Long.MinValue) viewSchemaCache.put(path, (key, s))
      s
    }
  }

  override def listViews(namespace: String*): Array[Identifier] = {
    val ns = namespace.toArray
    listTables(ns).flatMap { t =>
      if (hasScdTriplet(cachedSchema(t)))
        ViewSuffixes.map(s => Identifier.of(ns, t.name + s))
      else Seq.empty[Identifier]
    }
  }

  override def viewExists(ident: Identifier): Boolean =
    viewBase(ident).exists { case (base, _) =>
      tableExists(base) && hasScdTriplet(cachedSchema(base))
    }

  override def loadView(ident: Identifier): View = {
    val (base, suffix) = viewBase(ident).getOrElse(throw new NoSuchViewException(ident))
    if (!tableExists(base)) throw new NoSuchViewException(ident)
    val baseSchema = cachedSchema(base)
    val triplet = resolveScdTriplet(baseSchema).getOrElse(throw new NoSuchViewException(ident))
    def q(c: String) = s"`${c.replace("`", "``")}`"
    val cols = baseSchema.fieldNames.map(q).mkString(", ")
    val from = s"${q(catalogName)}.${q(base.namespace()(0))}.${q(base.name)}"
    // the schema's actual casing, so the generated SQL resolves even under
    // spark.sql.caseSensitive=true
    val (key, ord, hsh) = (q(triplet._1), q(triplet._2), q(triplet._3))
    // deterministic total order: observation time, content hash as tiebreak
    val sql = suffix match {
      case "__current" =>
        s"""SELECT $cols FROM (
           |  SELECT *, row_number() OVER (PARTITION BY $key ORDER BY $ord DESC, $hsh DESC) AS __rn
           |  FROM $from
           |) WHERE __rn = 1""".stripMargin
      case "__versions" =>
        // plain `<>` (NULL-propagating), not `NOT (<=>)`: Scd.withVersions
        // uses =!=, under which a NULL hash is never a change — the view
        // must agree with the Scala API row-for-row. NOTE the agreement is
        // conditional on ORDER: the views order by (order, hash) for a
        // deterministic total order, while Scd.currentState/withVersions
        // order by exactly the caller-supplied columns — pass the hash as
        // the final order column (as CatalogSpec does) to make the two
        // surfaces agree when observation times tie; with ties and no
        // tiebreak both surfaces are individually valid but may pick
        // different (equally latest) rows
        s"""SELECT $cols, row_number() OVER (PARTITION BY $key ORDER BY $ord, $hsh) AS version FROM (
           |  SELECT *, lag($hsh) OVER (PARTITION BY $key ORDER BY $ord, $hsh) AS __prev
           |  FROM $from
           |) WHERE __prev IS NULL OR $hsh <> __prev""".stripMargin
    }
    val schema =
      if (suffix == "__versions") baseSchema.add("version", IntegerType, nullable = false)
      else baseSchema
    GraftCatalog.ScdView(
      s"$catalogName.${ident.namespace()(0)}.${ident.name}", sql, catalogName, ident.namespace, schema)
  }

  override def createView(info: ViewInfo): View =
    throw new UnsupportedOperationException(
      "graft views are derived from the lake layout (__current/__versions); CREATE VIEW is not supported")

  override def alterView(ident: Identifier, changes: ViewChange*): View =
    throw new UnsupportedOperationException("graft views are derived; ALTER VIEW is not supported")

  override def dropView(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft views are derived; DROP VIEW is not supported")

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft views are derived; RENAME VIEW is not supported")
}

object GraftCatalog {
  /** Name suffixes of the derived SCD views ([[ResolveScdViews]] keys off
    * these before any catalog lookup).
    */
  val viewSuffixes: Seq[String] = Seq("__current", "__versions")

  /** Register a lake root as SQL catalog `name` on a running session. The
    * catalog manager instantiates [[GraftCatalog]] lazily on the first
    * three-part-name reference. `readonly = true` refuses every DDL
    * mutation and strips write capability from served tables.
    *
    * NOTE: the catalog manager caches plugin instances by name — options
    * changed AFTER the first use of `name` do not reach the live instance
    * (Spark behavior, not graft's). Register each (root, readonly)
    * combination under its own name, as in `graft` + `graft_ro`. The
    * explicit unset below still matters for the not-yet-instantiated case:
    * without it, register(readonly = false) over an earlier
    * register(readonly = true) would leave the stale conf to win when the
    * catalog is eventually instantiated.
    */
  def register(spark: SparkSession, name: String, root: String, readonly: Boolean = false): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    if (readonly) spark.conf.set(s"spark.sql.catalog.$name.readonly", "true")
    else spark.conf.unset(s"spark.sql.catalog.$name.readonly")
  }

  /** A scan-only facade over a served table: delegates reads verbatim,
    * advertises no write capability — so in readonly mode `INSERT INTO`
    * fails at analysis ("table does not support append") instead of
    * reaching the filesystem.
    */
  private final class ReadOnlyTable(delegate: Table with org.apache.spark.sql.connector.catalog.SupportsRead)
      extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
    override def name(): String = delegate.name()
    override def columns(): Array[Column] = delegate.columns()
    override def partitioning(): Array[Transform] = delegate.partitioning()
    override def properties(): util.Map[String, String] = delegate.properties()
    override def capabilities(): util.Set[TableCapability] =
      delegate.capabilities().asScala.filter(_ == TableCapability.BATCH_READ).asJava
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      delegate.newScanBuilder(options)
  }

  /** A derived SCD view: SQL text synthesized by [[GraftCatalog.loadView]],
    * analyzed by Spark in the catalog's own name context.
    */
  private final case class ScdView(
      viewName: String,
      sql: String,
      catalog: String,
      namespace: Array[String],
      viewSchema: StructType
  ) extends View {
    override def name(): String = viewName
    override def query(): String = sql
    override def currentCatalog(): String = catalog
    override def currentNamespace(): Array[String] = namespace
    override def schema(): StructType = viewSchema
    override def queryColumnNames(): Array[String] = Array.empty
    override def columnAliases(): Array[String] = Array.empty
    override def columnComments(): Array[String] = Array.empty
    override def properties(): util.Map[String, String] = util.Collections.emptyMap()
  }
}
