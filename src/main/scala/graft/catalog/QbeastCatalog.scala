package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/**
 * Catalog for `CREATE TABLE ... USING qbeast` / `INSERT INTO` / `SELECT`
 * (reference: `src/.../catalog/QbeastCatalog.scala:48-357`).
 *
 * Two deployment modes, mirroring the reference's CatalogExtension:
 *  - session-catalog extension (`spark.sql.catalog.spark_catalog`):
 *    non-qbeast tables delegate to the V2 session catalog;
 *  - standalone catalog (`spark.sql.catalog.<name>`): qbeast tables are
 *    tracked in an in-process store (metadata persists in each table's
 *    own `_qbeast_log`, so the store is only an identifier → location
 *    mapping; LOCATION-based tables are fully durable).
 */
class QbeastCatalog extends CatalogExtension {

  private var delegate: Option[TableCatalog] = None
  private var catalogName: String = "qbeast_catalog"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def setDelegateCatalog(d: CatalogPlugin): Unit = d match {
    case t: TableCatalog => delegate = Some(t)
    case _ =>
  }

  private def isQbeastProvider(properties: Map[String, String]): Boolean =
    properties.get(TableCatalog.PROP_PROVIDER).exists(_.equalsIgnoreCase("qbeast")) ||
      properties.get("provider").exists(_.equalsIgnoreCase("qbeast"))

  // ---------------------------------------------------------------- tables

  override def loadTable(ident: Identifier): Table = delegate match {
    case Some(d) =>
      val t = d.loadTable(ident)
      if (isQbeastProvider(t.properties().asScala.toMap)) toQbeastTable(ident, t) else t
    case None =>
      QbeastCatalog.standaloneTables.getOrElse(key(ident),
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
          Seq(catalogName) ++ ident.namespace() :+ ident.name()))
  }

  private def toQbeastTable(ident: Identifier, t: Table): QbeastTableImpl = {
    val props = t.properties().asScala.toMap
    val location = props.getOrElse(TableCatalog.PROP_LOCATION,
      props.getOrElse("location",
        throw new IllegalStateException(s"qbeast table ${ident.name} has no location")))
    QbeastTableImpl(ident.name(), stripScheme(location), t.schema(), props)
  }

  private def stripScheme(location: String): String =
    if (location.startsWith("file:")) new java.net.URI(location).getPath else location

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val props = properties.asScala.toMap
    if (!isQbeastProvider(props)) {
      return delegate.map(_.createTable(ident, schema, partitions, properties))
        .getOrElse(throw new UnsupportedOperationException(
          s"standalone qbeast catalog cannot create non-qbeast table ${ident.name}"))
    }
    require(partitions.isEmpty, "qbeast tables are self-organizing; PARTITIONED BY unsupported")
    delegate match {
      case Some(d) =>
        val created = d.createTable(ident, schema, partitions, properties)
        toQbeastTable(ident, created)
      case None =>
        val location = stripScheme(props.getOrElse(TableCatalog.PROP_LOCATION,
          props.getOrElse("location",
            s"/tmp/graft_catalog/${ident.namespace().mkString("/")}/${ident.name()}")))
        val table = QbeastTableImpl(ident.name(), location, schema,
          props + (TableCatalog.PROP_PROVIDER -> "qbeast"))
        QbeastCatalog.standaloneTables.put(key(ident), table)
        table
    }
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = delegate match {
    case Some(d) => d.alterTable(ident, changes: _*)
    case None =>
      // reference #30: ALTER TABLE SET/UNSET TBLPROPERTIES
      val table = QbeastCatalog.standaloneTables.getOrElse(key(ident),
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
          Seq(catalogName) ++ ident.namespace() :+ ident.name()))
      val props = changes.foldLeft(table.tableProperties) {
        case (acc, set: TableChange.SetProperty) => acc + (set.property() -> set.value())
        case (acc, rm: TableChange.RemoveProperty) => acc - rm.property()
        case (acc, _) => acc
      }
      val updated = table.copy(tableProperties = props)
      QbeastCatalog.standaloneTables.put(key(ident), updated)
      updated
  }

  override def dropTable(ident: Identifier): Boolean = delegate match {
    case Some(d) => d.dropTable(ident)
    case None => QbeastCatalog.standaloneTables.remove(key(ident)).nonEmpty
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = delegate match {
    case Some(d) => d.renameTable(from, to)
    case None =>
      QbeastCatalog.standaloneTables.remove(key(from)).foreach { t =>
        QbeastCatalog.standaloneTables.put(key(to), t.copy(identifierName = to.name()))
      }
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = delegate match {
    case Some(d) => d.listTables(namespace)
    case None =>
      QbeastCatalog.standaloneTables.keys
        .filter(_._1 == namespace.mkString("."))
        .map(k => Identifier.of(namespace, k._2)).toArray
  }

  override def tableExists(ident: Identifier): Boolean = delegate match {
    case Some(d) => d.tableExists(ident)
    case None => QbeastCatalog.standaloneTables.contains(key(ident))
  }

  private def key(ident: Identifier): (String, String) =
    (ident.namespace().mkString("."), ident.name())

  // ------------------------------------------------------------- functions

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    delegate match {
      case Some(d: FunctionCatalog) => d.listFunctions(namespace)
      case _ => Array.empty
    }

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    delegate match {
      case Some(d: FunctionCatalog) => d.loadFunction(ident)
      case _ =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
    }

  // ------------------------------------------------------------ namespaces

  override def defaultNamespace(): Array[String] = delegate match {
    case Some(d: CatalogPlugin) => d.defaultNamespace()
    case _ => Array("default")
  }

  override def listNamespaces(): Array[Array[String]] = delegate match {
    case Some(d: SupportsNamespaces) => d.listNamespaces()
    case _ => Array(Array("default"))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    delegate match {
      case Some(d: SupportsNamespaces) => d.listNamespaces(namespace)
      case _ => Array.empty
    }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    delegate match {
      case Some(d: SupportsNamespaces) => d.loadNamespaceMetadata(namespace)
      case _ =>
        if (namespace.sameElements(Array("default"))) Map.empty[String, String].asJava
        else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
          namespace.toSeq)
    }

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit =
    delegate match {
      case Some(d: SupportsNamespaces) => d.createNamespace(namespace, metadata)
      case _ =>
    }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    delegate match {
      case Some(d: SupportsNamespaces) => d.alterNamespace(namespace, changes: _*)
      case _ =>
    }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    delegate match {
      case Some(d: SupportsNamespaces) => d.dropNamespace(namespace, cascade)
      case _ => false
    }

}

object QbeastCatalog {
  /** Identifier → table for standalone-mode catalogs (table data +
   * metadata live in the table's own log; this is just the name map). */
  private[catalog] val standaloneTables = TrieMap.empty[(String, String), QbeastTableImpl]

  /** Location of a standalone-catalog table, for tooling. */
  def tableLocation(namespace: String, name: String): Option[String] =
    standaloneTables.get((namespace, name)).map(_.location)
}
