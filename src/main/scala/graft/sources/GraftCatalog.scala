package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Spark catalog over the manifest warehouse — name resolution for
  * pure SQL, the last UX seam the TVFs left open:
  *
  * {{{
  * spark.sql.extensions      = graft.GraftExtensions
  * spark.sql.catalog.graft   = graft.sources.GraftCatalog
  * spark.sql.catalog.graft.root = /warehouse/base
  *
  * SELECT * FROM graft.wh.orders WHERE o_orderkey < 100
  * INSERT INTO graft.wh.orders SELECT ...
  * CREATE TABLE graft.wh.t (k BIGINT, v STRING)
  * }}}
  *
  * One namespace level = one directory under the configured root, each
  * holding an independent [[Warehouse]]; tables are that warehouse's
  * manifest tables. The split of responsibilities is the Delta Lake
  * shape (catalog for names, extension rule for plans):
  *
  *  - READS: `loadTable` returns a [[GraftTable]] whose schema is the
  *    live snapshot's; the extension's [[graft.plans.CatalogReadRule]]
  *    then splices the warehouse's one V1 read plan (merge-on-read
  *    deletes, auto-skip enrollment, meta-agg collapse — everything
  *    the Scala surface gets) in place of the V2 relation at
  *    analysis. The catalog therefore REQUIRES the extension for
  *    reads, exactly like Delta requires its session extension.
  *  - WRITES: `V1_BATCH_WRITE` + [[V1Write]] route INSERT INTO /
  *    INSERT OVERWRITE / CTAS onto the warehouse's own commit paths
  *    (`append` = O(delta) manifest commit, overwrite =
  *    `atomicPublish`) — Spark's planner does the fallback, no rule
  *    needed.
  *
  * `CREATE TABLE` publishes an empty snapshot of the declared schema
  * (schema lives in parquet footers + manifest, no extra metadata
  * file), which is exactly what makes CTAS = create + append
  * compose. `DROP TABLE` delegates to the warehouse's `dropTable`
  * (manifest pointer removal + GC eligibility), never a recursive
  * delete of files a concurrent reader may hold.
  */
class GraftCatalog extends CatalogPlugin with TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var initRoot: Option[String] = None
  private val whCache = scala.collection.mutable.Map[(String, String), Warehouse]()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    initRoot = Option(options.get("root"))
  }

  override def name(): String = catName

  private def spark: SparkSession = SparkSession.active

  /** The warehouse base dir, read from the LIVE session conf on every
    * use (falling back to the initialize-time option): Spark caches
    * the plugin instance per catalog name for the session's lifetime,
    * so binding the root at initialize would pin the first value
    * forever — a later `SET spark.sql.catalog.<name>.root=...` (or a
    * test/bench re-pointing at a fresh scratch dir) would silently
    * keep serving the old, possibly deleted, location.
    */
  private def root: String =
    spark.conf.getOption(s"spark.sql.catalog.$catName.root")
      .orElse(initRoot).getOrElse(
        throw new IllegalArgumentException(
          s"spark.sql.catalog.$catName.root must point at the warehouse base dir"))

  private def wh(ns: Array[String]): Warehouse = {
    require(ns.length == 1, s"graft catalog namespaces are one level, got ${ns.mkString(".")}")
    val r = root
    whCache.synchronized {
      if (whCache.size >= 64) whCache.clear() // bounded across re-pointed roots
      whCache.getOrElseUpdate((r, ns.head),
        new Warehouse(spark, s"$r/${ns.head}", manifest = true))
    }
  }

  // ---- namespaces ---------------------------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val d = new java.io.File(root)
    if (!d.isDirectory) Array.empty
    else d.listFiles().filter(_.isDirectory).map(f => Array(f.getName)).sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && new java.io.File(s"$root/${namespace.head}").isDirectory

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    require(namespace.length == 1, "one namespace level")
    new java.io.File(s"$root/${namespace.head}").mkdirs()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("alterNamespace")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("dropNamespace")

  // ---- tables -------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    wh(namespace).listTables().map(t => Identifier.of(namespace, t)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    namespaceExists(ident.namespace) && wh(ident.namespace).tableExists(ident.name)

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftTable(wh(ident.namespace), ident)
  }

  /** Time travel: `SELECT ... FROM graft.<ns>.<t> VERSION AS OF n` —
    * the analyzer routes the versioned table ref here; the returned
    * table's snapshot is `Warehouse.readVersion`, with the same
    * retention contract (current + previous guaranteed; older
    * versions fail loudly once GC'd).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = version.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"graft time travel takes a numeric version, got '$version'"))
    new GraftTable(wh(ident.namespace), ident, Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft catalog DDL does not declare partitioning; use atomicPublish(partitionCols) or write-side layout")
    val w = wh(ident.namespace)
    // empty snapshot of the declared schema: the schema's home is the
    // parquet footer + manifest, so CREATE = publish(empty) and CTAS
    // (create + append) composes with zero extra metadata machinery
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema).coalesce(1)
    w.atomicPublish(ident.name, empty)
    new GraftTable(w, ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("alterTable")

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && { wh(ident.namespace).dropTable(ident.name); true }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("renameTable")
}

/** One warehouse table as a DSv2 `Table`. The read path never executes
  * through this object — [[graft.plans.CatalogReadRule]] splices
  * `snapshot` (the full V1 read plan) over the V2 relation at
  * analysis — so the only live surfaces are `schema` (the snapshot's)
  * and the V1 write builder.
  */
final class GraftTable(val wh: Warehouse, ident: Identifier,
    version: Option[Long] = None)
    extends Table with SupportsWrite {

  /** The table's snapshot read — current, or the `VERSION AS OF`
    * manifest — built once per loadTable (= once per query analysis):
    * schema truth AND the plan the read rule splices. Analysis-time
    * snapshot semantics, same contract as the TVFs.
    */
  lazy val snapshot: DataFrame =
    version.map(wh.readVersion(ident.name, _)).getOrElse(wh.read(ident.name))

  override def name(): String = ident.toString
  override def schema(): StructType = snapshot.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.BATCH_READ)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ow: Boolean): Unit =
              if (overwrite || ow) wh.atomicPublish(ident.name, data)
              else wh.append(ident.name, data)
          }
      }
    }
}
