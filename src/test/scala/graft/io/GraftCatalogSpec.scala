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

  test("TIMESTAMP AS OF resolves by commit stamp ≡ the version it names; pre-history refuses") {
    val root = tmpDir("graft_cat_ts_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4)
    val before = System.currentTimeMillis()
    Thread.sleep(5)
    store.upsert("t", rows(0 until 50), "uuid") // v0
    Thread.sleep(5)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(5)
    store.upsert("t", rows(0 until 10, tag = "y"), "uuid") // v1
    Thread.sleep(5)
    val afterMs = System.currentTimeMillis()
    val cat = register(root)
    def tsLit(ms: Long): String = // session tz is UTC in specs
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ms))
    // travel-by-timestamp ≡ travel-by-version, both instants
    val atBetween = spark.sql(
      s"SELECT * FROM $cat.t TIMESTAMP AS OF '${tsLit(betweenMs)}' ORDER BY uuid")
    val v0 = spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 0 ORDER BY uuid")
    assert(atBetween.collect().toSeq == v0.collect().toSeq)
    val atAfter = spark.sql(
      s"SELECT tag FROM $cat.t TIMESTAMP AS OF '${tsLit(afterMs)}' WHERE uuid = 3")
      .as[String].collect().toSeq
    assert(atAfter == Seq("y"))
    // an instant before the first commit refuses loudly NAMING the
    // instant, never serves latest
    def rootCause(t: Throwable): Throwable =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq.last
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM $cat.t TIMESTAMP AS OF '${tsLit(before)}'").collect())
    assert(rootCause(e).getMessage.contains("retained commit"), e.getMessage)
    assert(rootCause(e).getMessage.contains(
      java.time.Instant.ofEpochMilli(before).toString.take(19)), e.getMessage)
    // vacuumed horizon: after vacuum only the newest stamp survives
    store.vacuum("t")
    val h = intercept[Exception](spark.sql(
      s"SELECT * FROM $cat.t TIMESTAMP AS OF '${tsLit(betweenMs)}'").collect())
    assert(rootCause(h).getMessage.contains("retained commit"), h.getMessage)
    assert(spark.sql(
      s"SELECT COUNT(*) FROM $cat.t TIMESTAMP AS OF '${tsLit(afterMs)}'")
      .head().getLong(0) == 50L)
  }

  test("per-table TBLPROPERTIES: two keyed shapes under one catalog; unknown props refuse") {
    val root = tmpDir("graft_cat_props_")
    implicit val s = spark
    val cat = register(root) // catalog-global keycolumns=uuid are only DEFAULTS
    spark.sql(s"CREATE TABLE $cat.docs (doc_id BIGINT, n_chars BIGINT, lang STRING) " +
      "TBLPROPERTIES('key'='doc_id', 'buckets'='4', 'statscolumns'='n_chars')")
    spark.sql(s"CREATE TABLE $cat.users (user_id BIGINT, score BIGINT, region STRING) " +
      "TBLPROPERTIES('key'='user_id', 'buckets'='2', 'insert'='upsert')")
    // the shapes persisted and differ
    val probe = new SnapshotBucketedStore(root)
    assert(probe.tableProps("docs") == Map(
      "key" -> "doc_id", "buckets" -> "4", "statscolumns" -> "n_chars"))
    assert(probe.tableProps("users")("buckets") == "2")
    // keyed from birth: MERGE-free writes go through the keyed paths —
    // users opted into insert='upsert', so INSERT means keyed upsert
    spark.sql(s"INSERT INTO $cat.users SELECT id, id, 'eu' FROM range(10)")
    spark.sql(s"INSERT INTO $cat.users SELECT id, id + 100, 'us' FROM range(5)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.users").head().getLong(0) == 10L,
      "INSERT on insert='upsert' must keep-last, not append-duplicate")
    assert(spark.sql(s"SELECT region FROM $cat.users WHERE user_id = 3")
      .as[String].head() == "us")
    // docs did NOT opt in: INSERT INTO refuses with guidance
    val refuse = intercept[Exception](spark.sql(
      s"INSERT INTO $cat.docs SELECT id, id, 'en' FROM range(3)"))
    assert(refuse.getMessage.contains("MERGE"), refuse.getMessage)
    // keyed SQL DELETE honors each table's OWN key (bucket targeting)
    val docsStore = new SnapshotBucketedStore(root, numBuckets = 4,
      keyColumns = Seq("doc_id"), statsColumns = Seq("n_chars"))
    docsStore.upsert("docs",
      (0 until 40).map(i => (i.toLong, i * 10L, "en")).toDF("doc_id", "n_chars", "lang"),
      "doc_id")
    spark.sql(s"DELETE FROM $cat.docs WHERE doc_id = 7")
    spark.sql(s"DELETE FROM $cat.users WHERE user_id IN (1, 2)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.docs").head().getLong(0) == 39L)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.users").head().getLong(0) == 8L)
    // INSERT OVERWRITE on a keyed table rebuilds, keeping it keyed
    spark.sql(s"INSERT OVERWRITE $cat.users SELECT id, id, 'apac' FROM range(3)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.users").head().getLong(0) == 3L)
    spark.sql(s"INSERT INTO $cat.users SELECT id, id, 'x' FROM range(2)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.users").head().getLong(0) == 3L,
      "the rebuilt table must still upsert by key")
    // unknown non-reserved properties refuse loudly at CREATE
    val bad = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.bad (a BIGINT) TBLPROPERTIES('zorp'='1')"))
    assert(bad.getMessage.contains("zorp"), bad.getMessage)
    val multi = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.bad2 (a BIGINT, b BIGINT) TBLPROPERTIES('key'='a,b')"))
    assert(multi.getMessage.contains("ONE"), multi.getMessage)
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
    // a compound predicate is beyond the metadata tier — it now falls
    // through to the ROW-LEVEL delta path (X244) instead of refusing
    spark.sql(s"DELETE FROM $cat.t WHERE tag = 'x' AND uuid = 3")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 146L)
    assert(spark.sql(s"SELECT * FROM $cat.t WHERE uuid = 3").count() == 0)
  }

  test("SQL MERGE INTO ≡ the MergeInto API form; only affected buckets rewrite") {
    val root = tmpDir("graft_cat_merge_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 8,
      statsColumns = Seq("v"), keyColumns = Seq("uuid"))
    store.upsert("t", rows(0 until 400), "uuid")
    val cat = register(root)
    val src = ((0 until 10).map(i => (i.toLong, i * 100L, "upd")) ++
      (10 until 15).map(i => (i.toLong, 0L, "del")) ++
      (1000 until 1005).map(i => (i.toLong, i * 2L, "new")))
      .toDF("uuid", "nv", "flag")
    src.createOrReplaceTempView("graft_merge_src_spec")
    val dirsBefore = new java.io.File(s"$root/t/data").listFiles()
      .map(_.getName).toSet
    val versionsBefore = store.snapshots("t").size

    spark.sql(
      s"""MERGE INTO $cat.t t USING graft_merge_src_spec s ON t.uuid = s.uuid
         |WHEN MATCHED AND s.flag = 'del' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.nv, tag = 'U'
         |WHEN NOT MATCHED THEN INSERT (uuid, v, tag) VALUES (s.uuid, s.nv, 'N')
         |""".stripMargin)

    // ≡ the API form (graft.ops.MergeInto, q42's operator) on the same inputs
    val api = graft.ops.MergeInto.merge(
      rows(0 until 400), src, "uuid",
      updateSet = Map("v" -> graft.ops.MergeInto.src("nv"), "tag" -> lit("U")),
      deleteWhen = Some(graft.ops.MergeInto.src("flag") === "del"),
      insertSet = Map("uuid" -> graft.ops.MergeInto.src("uuid"),
        "v" -> graft.ops.MergeInto.src("nv"), "tag" -> lit("N")))
    val viaSql = spark.sql(s"SELECT uuid, v, tag FROM $cat.t ORDER BY uuid")
      .collect().toSeq
    assert(viaSql == api.select("uuid", "v", "tag").orderBy("uuid").collect().toSeq,
      "SQL MERGE and the MergeInto operator must agree row-for-row")
    assert(viaSql.size == 400 - 5 + 5)
    // exactly-once: the whole four-clause merge is ONE snapshot commit
    assert(store.snapshots("t").size == versionsBefore + 1,
      "merge must commit update+delete+insert in one manifest rename")
    // plan audit: only the buckets holding CHANGED keys gained a new
    // generation — untouched buckets carried over by reference
    val changedKeys = (0L until 15L) ++ (1000L until 1005L)
    val expectedBuckets = spark.createDataset(changedKeys)
      .select(pmod(xxhash64(col("value")), lit(8L))).as[Long].collect().toSet
    val newDirs = new java.io.File(s"$root/t/data").listFiles()
      .map(_.getName).toSet -- dirsBefore
    val newBucketIds = newDirs.map(_.stripPrefix("b").takeWhile(_ != '-').toLong)
    assert(newDirs.nonEmpty && newBucketIds.subsetOf(expectedBuckets),
      s"merge rewrote unaffected buckets: $newBucketIds vs $expectedBuckets")
  }

  test("SQL UPDATE: one-commit delete+reinsert, including a KEY-moving update") {
    val root = tmpDir("graft_cat_upd_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 8,
      statsColumns = Seq("v"), keyColumns = Seq("uuid"))
    store.upsert("t", rows(0 until 100), "uuid")
    val cat = register(root)
    val v0 = store.snapshots("t").size
    spark.sql(s"UPDATE $cat.t SET tag = 'big', v = v + 1 WHERE v >= 100")
    assert(store.snapshots("t").size == v0 + 1, "one UPDATE = one commit")
    val got = spark.sql(s"SELECT uuid, v, tag FROM $cat.t ORDER BY uuid")
      .as[(Long, Long, String)].collect().toSeq
    val expect = (0L until 100L).map(i =>
      if (i * 2 >= 100) (i, i * 2 + 1, "big") else (i, i * 2, "x"))
    assert(got == expect)
    // an UPDATE that reassigns the KEY itself: the delete+reinsert
    // split moves the row to its new bucket, no duplicate, no ghost
    spark.sql(s"UPDATE $cat.t SET uuid = uuid + 1000 WHERE uuid = 3")
    assert(spark.sql(s"SELECT * FROM $cat.t WHERE uuid = 3").count() == 0)
    assert(spark.sql(s"SELECT v FROM $cat.t WHERE uuid = 1003")
      .as[Long].head() == 6L)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 100L)
  }

  test("MERGE over an embedding table: array columns flow through the delta writers") {
    val root = tmpDir("graft_cat_vec_")
    implicit val s = spark
    val cat = register(root)
    spark.sql(s"CREATE TABLE $cat.emb (id BIGINT, vec ARRAY<FLOAT>, model STRING) " +
      "TBLPROPERTIES('key'='id', 'buckets'='4', 'insert'='upsert')")
    spark.sql(s"INSERT INTO $cat.emb SELECT id, array(CAST(id AS FLOAT), 1.0F), 'm1' " +
      "FROM range(20)")
    // re-embedding wave: delete stale ids, upsert revised vectors, add new
    spark.sql("SELECT id, array(CAST(id * 2 AS FLOAT), 2.0F) AS vec FROM range(5, 25)")
      .createOrReplaceTempView("graft_reembed_src")
    spark.sql(
      s"""MERGE INTO $cat.emb t USING graft_reembed_src s ON t.id = s.id
         |WHEN MATCHED AND t.id < 8 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET vec = s.vec, model = 'm2'
         |WHEN NOT MATCHED THEN INSERT (id, vec, model) VALUES (s.id, s.vec, 'm2')
         |""".stripMargin)
    val got = spark.sql(s"SELECT id, vec, model FROM $cat.emb ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toList, r.getString(2)))
    val expect =
      (0L until 5L).map(i => (i, List(i.toFloat, 1.0f), "m1")) ++
        (8L until 25L).map(i => (i, List(i * 2.0f, 2.0f), "m2"))
    assert(got.toSeq == expect)
  }

  test("ALTER TABLE ADD COLUMNS: metadata-only, survives keyed writes and deletes") {
    val root = tmpDir("graft_cat_alter_")
    implicit val s = spark
    val cat = register(root)
    spark.sql(s"CREATE TABLE $cat.t (uuid BIGINT, v BIGINT) " +
      "TBLPROPERTIES('key'='uuid', 'buckets'='4', 'insert'='upsert')")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id * 2 FROM range(40)")
    val dirsBefore = new java.io.File(s"$root/t/data").listFiles().map(_.getName).toSet

    spark.sql(s"ALTER TABLE $cat.t ADD COLUMNS (note STRING, score BIGINT)")
    // metadata-only: no pre-existing dir rewritten
    val after = new java.io.File(s"$root/t/data").listFiles().map(_.getName).toSet
    assert(dirsBefore.subsetOf(after))
    assert((after -- dirsBefore).forall(_.startsWith("schema-")), (after -- dirsBefore).toString)
    // existing rows read null in the declared columns
    assert(spark.sql(s"SELECT * FROM $cat.t").columns.toSeq ==
      Seq("uuid", "v", "note", "score"))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t WHERE note IS NULL")
      .head().getLong(0) == 40L)
    // the declared column is immediately writable through every path
    spark.sql(s"INSERT INTO $cat.t SELECT id, id, 'tagged', id * 10 FROM range(3)")
    assert(spark.sql(s"SELECT score FROM $cat.t WHERE uuid = 2").as[Long].head() == 20L)
    spark.sql(s"UPDATE $cat.t SET note = 'upd' WHERE uuid = 10")
    assert(spark.sql(s"SELECT note FROM $cat.t WHERE uuid = 10").as[String].head() == "upd")
    // a conservative non-key DELETE must neither brick nor drop the
    // declared schema (the zero-row schema gen is skipped exactly)
    spark.sql(s"DELETE FROM $cat.t WHERE v IN (14)")
    assert(spark.sql(s"SELECT * FROM $cat.t").columns.length == 4)
    // 40 initial; the 3-row INSERT keyed-upserts over uuids 0..2
    // (count unchanged); the DELETE kills uuid 7 (v=14)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.t").head().getLong(0) == 39L)
    // duplicates and non-ADD changes refuse loudly
    val dup = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.t ADD COLUMNS (v BIGINT)"))
    assert(dup.getMessage.contains("already"), dup.getMessage)
    val ren = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO w"))
    assert(ren.getMessage.contains("rebuild"), ren.getMessage)
  }

  test("row-level SQL on a keyless or log table refuses with guidance") {
    val root = tmpDir("graft_cat_nokey_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root) // no key columns at all
    store.append("logt", rows(0 until 20))
    val cat = "lakenk" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    rows(0 until 5).createOrReplaceTempView("graft_nokey_src")
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO $cat.logt t USING graft_nokey_src s ON t.uuid = s.uuid
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |""".stripMargin))
    def rootCause(t: Throwable): Throwable =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq.last
    assert(rootCause(e).getMessage.contains("key"), e.getMessage)
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

  test("metadata tables: t$history and t$files serve the audit surface in SQL") {
    val root = tmpDir("graft_cat_meta_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4,
      keyColumns = Seq("uuid"))
    store.upsert("t", rows(0 until 100), "uuid") // v0
    store.upsert("t", rows(0 until 10, tag = "y"), "uuid") // v1
    store.deleteLazy("t", "uuid", Seq(3L).toDF("uuid")) // v2 (tombstone)
    val cat = register(root)
    val hist = spark.sql(s"SELECT version, n_buckets FROM $cat.`t$$history` ORDER BY version")
      .as[(Int, Int)].collect().toSeq
    assert(hist.map(_._1) == Seq(0, 1, 2), hist.toString)
    val files = spark.sql(s"SELECT kind, bucket, row_count, tombstones FROM $cat.`t$$files`")
      .collect()
    assert(files.nonEmpty && files.forall(_.getString(0) == "bucket"))
    // the outstanding tombstone is visible on its dir
    assert(files.exists(r => !r.isNullAt(3) && r.getString(3).startsWith("uuid:")),
      files.mkString("; "))
    // recorded physical row counts sum to the pre-delete total (the
    // tombstone is merge-on-read; physical rows unchanged)
    assert(files.map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).sum == 100L)
    // per-dir byte records (X258) surface in the audit table, and
    // every live dir of a current-code table carries one
    val fb = spark.sql(s"SELECT bytes FROM $cat.`t$$files`").collect()
    assert(fb.nonEmpty && fb.forall(r => !r.isNullAt(0) && r.getLong(0) > 0L),
      fb.mkString("; "))
    // unknown metadata suffix refuses naming the known set
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.`t$$bogus`").collect())
    assert(e.getMessage.contains("history"), e.getMessage)
    // metadata tables are read-only
    val w = intercept[Exception](spark.sql(
      s"INSERT INTO $cat.`t$$files` VALUES ('x', 'bucket', 0, 0, null)"))
    assert(w != null)
  }

  test("TRUNCATE TABLE empties atomically and preserves the table's shape") {
    val root = tmpDir("graft_cat_trunc_")
    implicit val s = spark
    val cat = register(root)

    // log table: truncate → empty, schema kept, appendable again
    spark.sql(s"CREATE TABLE $cat.lg (uuid BIGINT, v BIGINT, tag STRING)")
    rows(0 until 30).createOrReplaceTempView("trunc_seed")
    spark.sql(s"INSERT INTO $cat.lg SELECT * FROM trunc_seed")
    spark.sql(s"TRUNCATE TABLE $cat.lg")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.lg").head.getLong(0) == 0L)
    spark.sql(s"INSERT INTO $cat.lg SELECT * FROM trunc_seed")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.lg").head.getLong(0) == 30L)

    // keyed table: still speaks MERGE after the truncation
    spark.sql(s"CREATE TABLE $cat.ky (uuid BIGINT, v BIGINT, tag STRING) " +
      "TBLPROPERTIES('key'='uuid', 'buckets'='4', 'insert'='upsert')")
    spark.sql(s"INSERT INTO $cat.ky SELECT * FROM trunc_seed")
    spark.sql(s"TRUNCATE TABLE $cat.ky")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.ky").head.getLong(0) == 0L)
    spark.sql(s"MERGE INTO $cat.ky t USING trunc_seed s ON t.uuid = s.uuid " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.ky").head.getLong(0) == 30L)
    val store = new SnapshotBucketedStore(root, numBuckets = 4)
    val (b, l) = store.tableKind("ky").get
    assert(b > 0 && l == 0, s"keyed shape must survive truncate: ($b, $l)")

    // and the truncation is a normal snapshot: restore rolls it back
    spark.sql(s"TRUNCATE TABLE $cat.ky")
    val versions = store.snapshots("ky")
    spark.sql(s"CALL $cat.system.restore('ky', ${versions(versions.size - 2)})")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.ky").head.getLong(0) == 30L)

    // the streaming exactly-once high-water mark SURVIVES truncation:
    // a truncate that dropped it would let a crash-replayed epoch
    // re-insert an already-committed batch into the truncated table
    store.upsertWithBatch("ky", rows(100 until 110), "uuid", 7L)
    assert(store.lastAppliedBatch("ky").contains(7L))
    spark.sql(s"TRUNCATE TABLE $cat.ky")
    assert(store.lastAppliedBatch("ky").contains(7L),
      "TRUNCATE must carry the streaming batch mark forward")
    intercept[IllegalArgumentException](
      store.upsertWithBatch("ky", rows(100 until 110), "uuid", 6L))
    store.upsertWithBatch("ky", rows(100 until 110), "uuid", 8L)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.ky").head.getLong(0) == 10L)
  }

  test("SHOW TBLPROPERTIES reads back the declared shape") {
    val root = tmpDir("graft_cat_props_")
    val cat = register(root)
    spark.sql(s"CREATE TABLE $cat.pt (uuid BIGINT, v BIGINT) " +
      "TBLPROPERTIES('key'='uuid', 'buckets'='8', 'insert'='upsert')")
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.pt")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("key").contains("uuid"), props)
    assert(props.get("buckets").contains("8"), props)
    assert(props.get("insert").contains("upsert"), props)
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
