package graft.queries

import graft.SparkSpec

/** Catalog-wide invariants: every registered query must be runnable
  * and DETERMINISTIC — two executions produce identical ordered rows.
  * This is the local tripwire for the driver's hash-compare: any
  * nondeterminism (float agg order, unordered output, wall-clock,
  * arbitrary-row dedup) fails here before it fails a round. */
class CatalogSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("query names are unique and well-formed") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.length == names.length)
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), names.mkString(","))
  }

  test("every oracle-checked query has matching name sets in both maps") {
    val q = Catalog.queries.keySet
    val o = Catalog.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${o.diff(q)}")
  }

  test("every registered query runs twice with identical results at sf0.001") {
    Catalog.all.foreach { q =>
      val a = q.run(spark, sf).collect().map(_.toString).toSeq
      val b = q.run(spark, sf).collect().map(_.toString).toSeq
      assert(a == b, s"${q.name} is nondeterministic")
      assert(a.nonEmpty || q.name.startsWith("q13") || q.name.startsWith("q30") ||
        q.name.startsWith("q117"),
        s"${q.name} returned no rows at sf0.001") // near-dup pairs and the
      // 8-core may be legitimately empty at tiny sf (the sf0.001
      // co-presence graph has ~10 edges — no 8-core exists)
    }
  }
}
