package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DSv2 TableCatalog (X233): snapshot-store tables addressable by
  * NAME in plain SQL — reads hash-match the DataFrame path, the V2
  * scan reports its pushed filters in the executed plan, manifest
  * pruning fires through it (Bloom for equality, min/max for closed
  * ranges), column pruning reaches the projection, and the DDL/DML
  * lifecycle (CREATE/INSERT/INSERT OVERWRITE/SHOW/RENAME/DROP) maps
  * onto the store's atomic commit families. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def rows(r: Range, tag: String = "x") =
    r.map(i => (i.toLong, i * 2L, tag)).toDF("uuid", "v", "tag")

  /** Register a fresh catalog NAME for a root — CatalogManager caches
    * plugin instances by name, so each suite root gets its own. */
  private def register(root: String): String = {
    val name = "lake" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    spark.conf.set(s"spark.sql.catalog.$name.statscolumns", "v")
    spark.conf.set(s"spark.sql.catalog.$name.keycolumns", "uuid")
    name
  }

  test("SELECT by name ≡ the DataFrame path, with pushdown visible in the plan") {
    val root = tmpDir("graft_cat_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4,
      statsColumns = Seq("v"), keyColumns = Seq("uuid"))
    (0 until 8).foreach(g => store.append("t", rows(g * 100 until (g + 1) * 100)))
    val cat = register(root)

    val sql = spark.sql(
      s"SELECT uuid, v FROM $cat.t WHERE v >= 100 AND v <= 198 ORDER BY uuid")
    val viaSql = sql.as[(Long, Long)].collect().toSeq
    val viaApi = store.read("t").get
      .filter(col("v") >= 100 && col("v") <= 198)
      .select("uuid", "v").orderBy("uuid").as[(Long, Long)].collect().toSeq
    assert(viaSql == (50L until 100L).map(i => i -> i * 2))
    assert(viaSql == viaApi, "SQL-by-name and DataFrame paths must agree")

    // the executed plan carries the V2 scan's pushed-filter report —
    // both Spark's own PushedFilters line and the scan's pruning list
    val plan = sql.queryExecution.executedPlan.toString
    assert(plan.contains("GraftScan(table=t"), plan.take(800))
    assert(plan.contains("pruning=[GreaterThanOrEqual(v,100)"), plan.take(800))
    assert(plan.contains("PushedFilters: [GreaterThanOrEqual(v,100), LessThanOrEqual(v,198)]"),
      plan.take(800))

    // and the pruning METRIC proves only surviving dirs were read
    val (kept, total) = GraftSource.lastPrune.get
    assert(total == 8 && kept <= 2, s"range must prune through V2: $kept/$total")
  }

  test("equality predicate prunes via key Blooms through the V2 scan") {
    val root = tmpDir("graft_cat_eq_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4,
      statsColumns = Seq("v"), keyColumns = Seq("uuid"))
    (0 until 8).foreach(g => store.append("t", rows(g * 100 until (g + 1) * 100)))
    val cat = register(root)
    val one = spark.sql(s"SELECT tag FROM $cat.t WHERE uuid = 420")
      .as[String].collect().toSeq
    assert(one == Seq("x"))
    val (kept, total) = GraftSource.lastPrune.get
    assert(total == 8 && kept <= 2, s"eq must prune through V2: $kept/$total")
    // COUNT(*) (empty projection) keeps row multiplicity
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 800L)
  }

  test("DDL/DML lifecycle: CREATE, INSERT, INSERT OVERWRITE, SHOW, RENAME, DROP") {
    val root = tmpDir("graft_cat_ddl_")
    implicit val s = spark
    val cat = register(root)

    spark.sql(s"CREATE TABLE $cat.fresh (uuid BIGINT, v BIGINT, tag STRING)")
    assert(spark.sql(s"SELECT * FROM $cat.fresh").count() == 0)
    assert(spark.sql(s"SELECT * FROM $cat.fresh").columns.toSeq ==
      Seq("uuid", "v", "tag"))

    spark.sql(s"INSERT INTO $cat.fresh SELECT id, id * 2, 'a' FROM range(10)")
    spark.sql(s"INSERT INTO $cat.fresh SELECT id, id * 2, 'b' FROM range(10, 15)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.fresh").head().getLong(0) == 15L)

    spark.sql(s"INSERT OVERWRITE $cat.fresh SELECT id, id * 3, 'c' FROM range(4)")
    val after = spark.sql(s"SELECT uuid, v, tag FROM $cat.fresh ORDER BY uuid")
      .as[(Long, Long, String)].collect().toSeq
    assert(after == (0L until 4L).map(i => (i, i * 3, "c")))

    val shown = spark.sql(s"SHOW TABLES IN $cat").select("tableName")
      .as[String].collect().toSet
    assert(shown == Set("fresh"))

    spark.sql(s"ALTER TABLE $cat.fresh RENAME TO renamed")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.renamed").head().getLong(0) == 4L)
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.fresh").collect())

    spark.sql(s"DROP TABLE $cat.renamed")
    assert(spark.sql(s"SHOW TABLES IN $cat").count() == 0)
  }

  test("DROP and RENAME refuse while a zero-copy clone borrows the table's dirs") {
    val root = tmpDir("graft_cat_clone_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root)
    store.append("owner", rows(0 until 50))
    store.cloneTable("owner", "fork")
    val cat = register(root)
    val e = intercept[Exception](spark.sql(s"DROP TABLE $cat.owner"))
    assert(e.getMessage.contains("fork"), e.getMessage)
    val r = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.owner RENAME TO owner2"))
    assert(r.getMessage.contains("fork"), r.getMessage)
    // the borrower itself renames freely (its refs name the owner)
    spark.sql(s"ALTER TABLE $cat.fork RENAME TO fork2")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.fork2").head().getLong(0) == 50L)
    // dropping the borrower releases the owner
    spark.sql(s"DROP TABLE $cat.fork2")
    spark.sql(s"DROP TABLE $cat.owner")
    assert(store.tableNames.isEmpty)
  }

  test("VERSION AS OF time travel reads retained snapshots; pinned tables are read-only") {
    val root = tmpDir("graft_cat_tt_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4)
    store.upsert("t", rows(0 until 50), "uuid") // v0
    store.upsert("t", rows(0 until 10, tag = "y"), "uuid") // v1
    val cat = register(root)
    val v0 = spark.sql(s"SELECT tag FROM $cat.t VERSION AS OF 0 WHERE uuid = 3")
      .as[String].collect().toSeq
    val v1 = spark.sql(s"SELECT tag FROM $cat.t VERSION AS OF 1 WHERE uuid = 3")
      .as[String].collect().toSeq
    assert(v0 == Seq("x") && v1 == Seq("y"))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t VERSION AS OF 0")
      .head().getLong(0) == 50L)
    val gone = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 99").collect())
    assert(gone.getMessage.contains("99"), gone.getMessage)
    val ro = intercept[Exception](spark.sql(
      s"INSERT INTO $cat.t VERSION AS OF 0 SELECT id, id, 'z' FROM range(1)"))
    assert(ro != null)
  }

  test("SQL DELETE: equality/IN → merge-on-read tombstones, closed range → generation sweep") {
    val root = tmpDir("graft_cat_del_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4,
      statsColumns = Seq("v"), keyColumns = Seq("uuid"))
    store.upsert("t", rows(0 until 200), "uuid")
    val cat = register(root)

    // equality on the KEY column
    spark.sql(s"DELETE FROM $cat.t WHERE uuid = 7")
    assert(spark.sql(s"SELECT * FROM $cat.t WHERE uuid = 7").count() == 0)
    // IN-list on a NON-key column: conservative targeting still exact
    spark.sql(s"DELETE FROM $cat.t WHERE tag IN ('nope')")
    spark.sql(s"DELETE FROM $cat.t WHERE v IN (20, 40)") // uuids 10, 20
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 197L)
    assert(spark.sql(s"SELECT * FROM $cat.t WHERE uuid IN (10, 20)").count() == 0)
    // the deletes were LAZY: no bucket rewrite — tomb sidecars exist
    val dirs = new java.io.File(s"$root/t/data").listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("tomb-")), dirs.toSeq.toString)
    // closed range → deleteRange sweep
    spark.sql(s"DELETE FROM $cat.t WHERE v >= 300 AND v <= 398") // uuids 150..199
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 147L)
    // unsupported shapes refuse loudly rather than half-delete
    val e = intercept[Exception](
      spark.sql(s"DELETE FROM $cat.t WHERE tag = 'x' AND uuid = 3"))
    assert(e != null)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 147L)
  }

  test("COUNT(*)/MIN/MAX push into the manifest: metadata-only, and refuse under tombstones") {
    val root = tmpDir("graft_cat_agg_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4,
      statsColumns = Seq("v"), keyColumns = Seq("uuid"))
    (0 until 4).foreach(g => store.append("t", rows(g * 100 until (g + 1) * 100)))
    val cat = register(root)
    val q = spark.sql(s"SELECT COUNT(*), MIN(v), MAX(v) FROM $cat.t")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftAggServe"), plan.take(900))
    assert(!plan.contains("GraftScan(table="), "no data scan may remain: " + plan.take(900))
    val row = q.head()
    assert(row.getLong(0) == 400L && row.getLong(1) == 0L && row.getLong(2) == 798L)
    // an unservable aggregate (AVG) falls back to the true scan
    val avg = spark.sql(s"SELECT AVG(v) FROM $cat.t")
    assert(avg.queryExecution.executedPlan.toString.contains("GraftScan(table="))
    assert(avg.head().getDouble(0) == 399.0)
    // outstanding tombstones: pushdown declines, the scan computes truth
    val store2 = new SnapshotBucketedStore(s"${root}2", numBuckets = 4,
      statsColumns = Seq("v"), keyColumns = Seq("uuid"))
    store2.upsert("t", rows(0 until 100), "uuid")
    store2.deleteLazy("t", "uuid", Seq(0L, 1L).toDF("uuid"))
    val cat2 = register(s"${root}2")
    val q2 = spark.sql(s"SELECT COUNT(*), MIN(v) FROM $cat2.t")
    assert(q2.queryExecution.executedPlan.toString.contains("GraftScan(table="),
      "tombstoned table must scan, not serve stale metadata")
    val r2 = q2.head()
    assert(r2.getLong(0) == 98L && r2.getLong(1) == 4L)
  }

  test("missing table and missing root option fail loudly") {
    val root = tmpDir("graft_cat_err_")
    val cat = register(root)
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $cat.nope").collect())
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
    val bad = "lakebad" + math.abs(root.hashCode)
    spark.conf.set(s"spark.sql.catalog.$bad", classOf[GraftCatalog].getName)
    val m = intercept[Exception](spark.sql(s"SHOW TABLES IN $bad").collect())
    assert(m.getMessage.contains("root"), m.getMessage)
  }
}
