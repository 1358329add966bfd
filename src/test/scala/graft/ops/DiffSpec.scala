package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiffSpec extends SparkSpec {
  import spark.implicits._

  private def byKey(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2)))).toMap

  test("classifies added / removed / changed / unchanged with named changed columns") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "s", "v")
    val neu = Seq((2L, "b", 20.0), (3L, "cc", 30.0), (4L, "dd", 44.0), (5L, "e", 50.0))
      .toDF("id", "s", "v")

    val d = byKey(Diff.keyed(old, neu, Seq("id")))
    assert(d == Map(
      1L -> ("removed", None),
      3L -> ("changed", Some("s")),
      4L -> ("changed", Some("s,v")), // declared column order, not alpha
      5L -> ("added", None),
    ))

    val withU = byKey(Diff.keyed(old, neu, Seq("id"), includeUnchanged = true))
    assert(withU(2L) == ("unchanged", None))
    assert(withU.size == 5)
  }

  test("reserved report/working column names are refused, not silently overwritten") {
    val clash = Seq((1L, "x")).toDF("id", "change")
    intercept[IllegalArgumentException] {
      Diff.keyed(clash, clash, Seq("id"))
    }
    val prefixed = Seq((1L, "x")).toDF("id", "_o_s")
    intercept[IllegalArgumentException] {
      Diff.keyed(prefixed, prefixed, Seq("id"))
    }
  }

  test("null payloads compare null-safely: null==null unchanged, null vs value changed") {
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Some("x")))
      .toDF("id", "s")
    val neu = Seq((1L, Option.empty[String]), (2L, Some("y")), (3L, Option.empty[String]))
      .toDF("id", "s")
    val d = byKey(Diff.keyed(old, neu, Seq("id"), includeUnchanged = true))
    assert(d(1L) == ("unchanged", None))
    assert(d(2L) == ("changed", Some("s")))
    assert(d(3L) == ("changed", Some("s")))
  }

  test("key-only frames diff on presence alone") {
    val old = Seq(1L, 2L).toDF("id")
    val neu = Seq(2L, 3L).toDF("id")
    val d = byKey(Diff.keyed(old, neu, Seq("id")))
    assert(d == Map(1L -> ("removed", None), 3L -> ("added", None)))
  }

  test("composite keys and schema guards") {
    val old = Seq((1L, "x", 1.0)).toDF("a", "b", "v")
    val neu = Seq((1L, "x", 2.0)).toDF("a", "b", "v")
    val d = Diff.keyed(old, neu, Seq("a", "b")).collect()
    assert(d.length == 1 && d.head.getString(2) == "changed" &&
      d.head.getString(3) == "v")

    intercept[IllegalArgumentException] {
      Diff.keyed(old, neu.drop("v"), Seq("a"))
    }
    intercept[IllegalArgumentException] {
      Diff.keyed(old, neu, Seq("missing"))
    }
    intercept[IllegalArgumentException] {
      Diff.keyed(old, neu, Nil)
    }
  }

  test("diff of a frame against itself is empty (and all-unchanged when asked)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    assert(Diff.keyed(df, df, Seq("id")).isEmpty)
    val u = Diff.keyed(df, df, Seq("id"), includeUnchanged = true)
    assert(u.count() == 2 &&
      u.filter($"change" =!= "unchanged").isEmpty)
  }
}
