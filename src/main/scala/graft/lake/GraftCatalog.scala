package graft.lake

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
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
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null, s"catalog $name needs spark.sql.catalog.$name.root=<lake root>")
  }

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

  override def createNamespace(namespace: Array[String], metadata: util.Map[String, String]): Unit =
    fs.mkdirs(new Path(s"$root/${scopeOf(namespace)}"))

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
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
    ParquetTable(
      s"$catalogName.${ident.namespace()(0)}.${ident.name}",
      spark,
      new CaseInsensitiveStringMap(Map("path" -> path, "mergeSchema" -> "true").asJava),
      Seq(path),
      None,
      classOf[ParquetFileFormat]
    )
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
    require(partitions.isEmpty, "declare partitioning by writing hive-partitioned data instead")
    val path = Lake.tablePath(root, ident.namespace()(0), ident.name)
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

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) &&
      fs.delete(new Path(Lake.tablePath(root, ident.namespace()(0), ident.name)), true)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
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
}

object GraftCatalog {
  /** Register a lake root as SQL catalog `name` on a running session. The
    * catalog manager instantiates [[GraftCatalog]] lazily on the first
    * three-part-name reference.
    */
  def register(spark: SparkSession, name: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
  }
}
