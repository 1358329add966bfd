package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Within-file sort layout (sortColumns): every data file written by
  * any commit family is internally sorted on the declared columns,
  * so parquet row-group/page stats are tight and format-level
  * pushdown can skip inside files — content identical to the
  * unsorted twin. */
class SortedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def rows(r: Range) = {
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(r.toVector)
    shuffled.map(i => (i.toLong, (i * 37 % 1000).toLong, s"s$i"))
      .toDF("uuid", "v", "payload")
  }

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
  }

  test("every data file is internally sorted; content unchanged") {
    val root = tmpDir("graft_sorted_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4,
      sortColumns = Seq("v"))
    val plain = new SnapshotBucketedStore(tmpDir("graft_unsorted_"),
      numBuckets = 4)
    store.upsert("t", rows(0 until 400), "uuid")
    store.delete("t", "uuid", (0L until 40L).toDF("uuid")) // rewrite path too
    plain.upsert("t", rows(0 until 400), "uuid")
    plain.delete("t", "uuid", (0L until 40L).toDF("uuid"))
    // identical content
    val a = store.read("t").get.select("uuid", "v").as[(Long, Long)]
      .collect().toSet
    val b = plain.read("t").get.select("uuid", "v").as[(Long, Long)]
      .collect().toSet
    assert(a == b)
    // every parquet file individually sorted on v
    val files = parquetFiles(s"$root/t/data")
    assert(files.nonEmpty)
    files.foreach { f =>
      val vs = spark.read.parquet(f.getAbsolutePath)
        .select("v").as[Long].collect().toSeq
      assert(vs == vs.sorted, s"file ${f.getName} not sorted: $vs")
    }
  }

  test("append-log dirs sort too; absent sort column is tolerated") {
    val root = tmpDir("graft_sorted_log_")
    implicit val s = spark
    val store = new SnapshotBucketedStore(root, numBuckets = 4,
      sortColumns = Seq("v", "ghost_col"))
    store.append("t", rows(0 until 200))
    parquetFiles(s"$root/t/data").foreach { f =>
      val vs = spark.read.parquet(f.getAbsolutePath)
        .select("v").as[Long].collect().toSeq
      assert(vs == vs.sorted, s"file ${f.getName} not sorted")
    }
    assert(store.read("t").get.count() == 200)
  }
}
