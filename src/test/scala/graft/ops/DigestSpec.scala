package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DigestSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, Option("a")), (2L, Option("b")), (3L, Option("c")), (4L, None: Option[String]))

  private def digestOf(df: org.apache.spark.sql.DataFrame) =
    Digest.tableDigest(df, Seq("id", "s")).head() match {
      case r => (r.getLong(0), r.getDecimal(1))
    }

  test("digest ignores row order and partitioning, catches any content change") {
    val df = base.toDF("id", "s")
    val d0 = digestOf(df)
    assert(digestOf(df.repartition(7)) == d0)
    assert(digestOf(df.orderBy(col("s").desc_nulls_first)) == d0)
    assert(digestOf(base.reverse.toDF("id", "s")) == d0)

    val changed = base.updated(1, (2L, Option("B"))).toDF("id", "s")
    assert(digestOf(changed)._2 != d0._2, "a changed cell must move the digest")
    val dropped = base.take(3).toDF("id", "s")
    val dd = digestOf(dropped)
    assert(dd._1 == 3L && dd._2 != d0._2)
  }

  test("null position and column order are significant; empty table digests to zero") {
    val a = Seq((Option("x"), None: Option[String])).toDF("c1", "c2")
    val b = Seq((None: Option[String], Option("x"))).toDF("c1", "c2")
    assert(Digest.tableDigest(a, Seq("c1", "c2")).head().getDecimal(1) !=
      Digest.tableDigest(b, Seq("c1", "c2")).head().getDecimal(1),
      "(x, null) and (null, x) must digest differently")
    assert(Digest.tableDigest(a, Seq("c1", "c2")).head().getDecimal(1) !=
      Digest.tableDigest(a, Seq("c2", "c1")).head().getDecimal(1),
      "column order is part of the contract")

    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val e = Digest.tableDigest(empty, Seq("id", "s")).head()
    assert(e.getLong(0) == 0L && e.getDecimal(1).longValueExact() == 0L)
  }

  test("per-group digests locate the divergent group") {
    val x = Seq(("g1", 1L), ("g1", 2L), ("g2", 3L), ("g2", 4L)).toDF("g", "v")
    val y = Seq(("g1", 1L), ("g1", 2L), ("g2", 3L), ("g2", 99L)).toDF("g", "v")
    def m(df: org.apache.spark.sql.DataFrame) =
      Digest.tableDigestPerGroup(df, "g", Seq("v")).collect()
        .map(r => r.getString(0) -> r.getDecimal(2)).toMap
    val (mx, my) = (m(x), m(y))
    assert(mx("g1") == my("g1"), "untouched group must digest identically")
    assert(mx("g2") != my("g2"), "the drifted group must surface")
  }
}
