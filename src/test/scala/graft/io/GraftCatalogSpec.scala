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
