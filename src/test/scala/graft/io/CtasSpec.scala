package graft.io

import graft.SparkSpec

/** CTAS / RTAS through the catalog (X248): Spark's create-then-write
  * path over [[GraftCatalog.createTable]] + the V1 write bridge —
  * including keyed tables, where the seed write follows the table's
  * own INSERT contract. */
class CtasSpec extends SparkSpec {
  import spark.implicits._

  private def register(root: String): String = {
    val cat = "lakectas" + math.abs(root.hashCode).toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  test("CREATE TABLE AS SELECT materializes the query; OR REPLACE swaps it") {
    val cat = register(tmpDir("gsw_ctas_"))
    spark.sql(s"CREATE TABLE $cat.c AS SELECT id, id * 2 AS v FROM range(10)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.c").head().getLong(0) == 10)
    assert(spark.sql(s"SELECT v FROM $cat.c WHERE id = 4").as[Long].head() == 8L)
    spark.sql(s"CREATE OR REPLACE TABLE $cat.c AS SELECT id AS k FROM range(3)")
    assert(spark.sql(s"SELECT * FROM $cat.c").columns.toSeq == Seq("k"))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.c").head().getLong(0) == 3)
  }

  test("keyed CTAS: the seed write honors the table's INSERT contract") {
    val cat = register(tmpDir("gsw_ctask_"))
    // with insert='upsert' the CTAS seed lands as a keyed upsert and
    // the table is keyed FROM BIRTH — MERGE works immediately after
    spark.sql(s"CREATE TABLE $cat.ck TBLPROPERTIES('key'='id', " +
      "'buckets'='4', 'insert'='upsert') AS " +
      "SELECT id, id * 2 AS v FROM range(20)")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.ck").head().getLong(0) == 20)
    spark.sql(s"SELECT id, id * 100 AS nv FROM range(18, 25)")
      .createOrReplaceTempView("graft_ctas_src")
    spark.sql(
      s"""MERGE INTO $cat.ck t USING graft_ctas_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.nv
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)
         |""".stripMargin)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.ck").head().getLong(0) == 25)
    assert(spark.sql(s"SELECT v FROM $cat.ck WHERE id = 19").as[Long].head() == 1900L)
    // a keyed table WITHOUT the opt-in refuses its own CTAS seed write
    // (same guidance as INSERT INTO) — and the refused half-create is
    // cleaned up so the name is reusable
    val e = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.cr TBLPROPERTIES('key'='id') AS SELECT id FROM range(3)"))
    def rootCause(t: Throwable): Throwable =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq.last
    assert(rootCause(e).getMessage.contains("MERGE"), e.getMessage)
  }
}
