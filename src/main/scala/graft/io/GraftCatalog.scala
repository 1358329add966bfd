package graft.io

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 `TableCatalog` over a [[SnapshotBucketedStore]] root
  * (X233): tables become SQL-ADDRESSABLE BY NAME — register once,
  *
  *   spark.conf.set("spark.sql.catalog.lake", "graft.io.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.lake.root", "/data/lake")
  *
  * then `SELECT * FROM lake.corpus WHERE doc_id = 7`,
  * `INSERT INTO lake.events ...`, `SHOW TABLES IN lake`,
  * `DROP TABLE lake.tmp` all resolve through the store — no
  * `store.read(...)` plumbing, no per-view OPTIONS clause (the V1
  * `spark.read.format("graft")` path, [[GraftSource]], stays for
  * option-driven access; both surfaces share [[GraftPruning]], so
  * they prune identically).
  *
  * READ pushdown, the part that matters at 100 TB: the scan builder
  * receives Spark's pushed filters and required columns; equality
  * filters probe the manifest key Blooms, closed ranges the min/max
  * stats ([[GraftPruning.prunedRead]]) — a selective WHERE opens the
  * generation dirs that might match, not the table. Reported
  * `pushedFilters` are exactly the subset the pruning paths act on
  * (visible in `explain` as the scan's `PushedFilters`), and EVERY
  * filter is also returned as residual: pruning only EXCLUDES
  * provably-disjoint dirs, Spark re-evaluates the exact predicate on
  * survivors, and the residual also reaches the underlying parquet
  * scan inside the store's pruned read. Column pruning flows through
  * `pruneColumns` into the projection under the V1 scan.
  *
  * The scan itself is a [[V1Scan]] — the engine's own DSv2→V1
  * bridge (the path Spark's JDBC catalog ships on): the store
  * already produces pruned DataFrames whose parquet scans carry
  * pushdown and columnar batches; re-implementing PartitionReaders
  * underneath would re-derive that machinery for zero plan
  * improvement.
  *
  * WRITES map onto the store's commit families through the V1 write
  * bridge: `INSERT INTO` → atomic log [[TableStore.append]];
  * `INSERT OVERWRITE` / truncate → atomic [[TableStore.replace]].
  * Keyed upsert/MERGE is deliberately NOT spelled INSERT — it stays
  * on the explicit API ([[SnapshotBucketedStore.upsert]],
  * [[graft.ops.MergeInto]]) where the key contract is visible.
  * `CREATE TABLE` commits an empty log generation carrying the
  * declared schema (catalog-created tables are append-log tables;
  * partition transforms are refused loudly — the store's bucketing
  * is an upsert-key property, not a DDL one). DROP and RENAME
  * delegate to the store's lifecycle ops, which refuse while
  * zero-copy clones still borrow the table's dirs.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var rootPath: String = _
  private var opts: Map[String, String] = Map.empty

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    rootPath = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' requires option 'root' " +
          s"(spark.sql.catalog.$name.root=<store root>)"))
    import scala.jdk.CollectionConverters._
    opts = options.asCaseSensitiveMap().asScala.toMap
      .map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
  }

  override def name(): String = catalogName

  /** The store, bound to the ACTIVE session at call time (a catalog
    * instance is per-session in practice, but the contract keeps it
    * stateless): same shape options as [[GraftSource]]. */
  private def store: SnapshotBucketedStore = {
    implicit val spark: SparkSession = SparkSession.active
    def cols(k: String): Seq[String] =
      opts.get(k).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
    new SnapshotBucketedStore(
      rootPath,
      numBuckets = opts.get("buckets").map(_.toInt).getOrElse(64),
      fmt = opts.getOrElse("format", "parquet"),
      statsColumns = cols("statscolumns"),
      keyColumns = cols("keycolumns"),
      clusterColumn = opts.get("clustercolumn"),
      ndvColumns = cols("ndvcolumns"),
      quantileColumns = cols("quantilecolumns"),
      sortColumns = cols("sortcolumns"))
  }

  /** Flat namespace: the store root holds tables directly. */
  private def requireFlat(namespace: Array[String]): Unit =
    if (namespace.nonEmpty)
      throw new NoSuchNamespaceException(Array(catalogName) ++ namespace)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireFlat(namespace)
    store.tableNames.map(Identifier.of(Array.empty[String], _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty && store.snapshots(ident.name).nonEmpty

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new GraftV2Table(store, ident.name)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    requireFlat(ident.namespace)
    require(partitions.isEmpty,
      "graft tables take no partition transforms: bucketing is an " +
        "upsert-key property of the store (keyColumns/clusterColumn " +
        "catalog options), not DDL")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val s = SparkSession.active
    // an empty one-partition frame writes a footer-only file, so the
    // created table reads back with the declared schema and 0 rows
    store.append(ident.name, s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema).repartition(1))
    new GraftV2Table(store, ident.name)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft tables evolve through writes (numeric type-widening " +
        "upserts), not ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean =
    ident.namespace.isEmpty && store.dropTable(ident.name)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    requireFlat(oldIdent.namespace); requireFlat(newIdent.namespace)
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    store.renameTable(oldIdent.name, newIdent.name)
  }
}

/** One snapshot-store table behind the V2 [[Table]] seam. */
private[io] class GraftV2Table(store: SnapshotBucketedStore, table: String)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = table

  override def schema(): StructType =
    store.read(table).map(_.schema).getOrElse(
      throw new NoSuchTableException(Seq(table)))

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(store, table, schema())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(store, table)
}

/** Pushdown seams: filters land for manifest pruning (all reported
  * back as residual — see class doc), required columns land for the
  * projection under the V1 scan. */
private[io] class GraftScanBuilder(
    store: SnapshotBucketedStore, table: String, full: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = full

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    // everything is residual: pruning never substitutes for evaluation
    filters
  }

  override def pushedFilters(): Array[Filter] =
    GraftPruning.prunableSubset(pushed)

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftScan(store, table, pushed, required)
}

/** The scan: manifest-pruned store read, bridged to execution via
  * [[V1Scan]] (the store's DataFrame already carries parquet pushdown
  * and columnar reads — see [[GraftCatalog]] class doc). */
private[io] class GraftScan(
    store: SnapshotBucketedStore,
    table: String,
    filters: Array[Filter],
    required: StructType)
    extends V1Scan {

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftScan(table=$table, " +
      s"pruning=[${GraftPruning.prunableSubset(filters).mkString(", ")}])"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: org.apache.spark.sql.SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: org.apache.spark.sql.SQLContext = context
      override def schema: StructType = required
      // RowDataSourceScanExec renders the RELATION in explain — name
      // the scan and its pruning filters there, so the plan audit can
      // pin both without digging into the wrapper
      override def toString: String = GraftScan.this.description()
      override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
        val df = GraftPruning.prunedRead(store, table, filters)
        GraftSource.lastPrune = GraftPruning.pruneMetric(store, table, filters)
        val projected =
          if (required.isEmpty) df
          else df.select(required.fieldNames
            .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
        projected.rdd
      }
    }.asInstanceOf[T]
}

/** V1-bridge writes: append / truncate-overwrite onto the store's
  * atomic commit families. */
private[io] class GraftWriteBuilder(store: SnapshotBucketedStore, table: String)
    extends WriteBuilder with SupportsTruncate {

  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: org.apache.spark.sql.DataFrame,
            overwriteFlag: Boolean): Unit =
          if (overwrite || overwriteFlag) store.replace(table, data)
          else store.append(table, data)
      }
    override def toString: String = s"GraftWrite(table=$table, overwrite=$overwrite)"
  }
}
