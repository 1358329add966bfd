package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue matches a JVM Morton reference on random points") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val out = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue(Seq($"x", $"y"), 10).as("z"))
      .collect()
    out.foreach(r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1), 10)))
  }

  test("z-layout gives every partition a small bounding box in BOTH dims") {
    // uniform 64x64 grid; compare per-partition bounding-box areas of
    // the z-curve layout vs a single-column sort layout
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def boxes(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max($"x") - min($"x")).as("dx"), (max($"y") - min($"y")).as("dy"))
        .select("dx", "dy").as[(Long, Long)].collect().toSeq
    val zdf = ZOrder.layout(grid, Seq($"x", $"y"), bits = 6, partitions = 16)
    val xdf = grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
    // Partition AREAS are equal by construction (uniform grid); the
    // win is SHAPE: x-sorted partitions are 4x64 slivers spanning all
    // of y, z partitions are ~16x16 boxes bounded in BOTH dims.
    val zBoxes = boxes(zdf)
    val xBoxes = boxes(xdf)
    assert(xBoxes.forall(_._2 == 63), s"x-layout should span all of y: $xBoxes")
    assert(zBoxes.forall(_._2 < 32), s"z partitions must bound y too: $zBoxes")
    assert(zBoxes.forall(_._1 < 32), s"z partitions must bound x too: $zBoxes")
    // ...which is exactly what zone-map pruning uses: a thin y-slab
    // predicate overlaps every x-sorted partition but only the z
    // partitions whose box intersects it.
    def overlapping(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("p", spark_partition_id())
        .groupBy("p").agg(min($"y").as("lo"), max($"y").as("hi"))
        .filter($"lo" <= 15 && $"hi" >= 8)
        .count()
    val zHit = overlapping(zdf)
    val xHit = overlapping(xdf)
    assert(xHit == 16, s"x-layout prunes nothing on y: $xHit")
    assert(zHit * 2 <= xHit, s"z-layout must prune y-slabs: $zHit vs $xHit")
  }

  test("z-layout files actually SKIP at scan time (parquet row-group pruning metric)") {
    // The missing half of the q40 story: not just that partitions have
    // small bounding boxes, but that a real parquet scan under a
    // single-dimension predicate READS fewer rows. Write both layouts
    // as multi-file parquet (one row group per file at this size), run
    // the same thin-slab predicate on the NON-sort dimension, and
    // compare the scan's numOutputRows metric — rows surviving footer
    // min/max row-group pruning, i.e. rows physically read.
    val grid = (for { x <- 0 until 256; y <- 0 until 256 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val zDir = tmpDir("graft_zskip_z_")
    val xDir = tmpDir("graft_zskip_x_")
    ZOrder.layout(grid, Seq($"x", $"y"), bits = 8, partitions = 64)
      .write.mode("overwrite").parquet(zDir)
    grid.repartitionByRange(64, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(xDir)

    def rowsRead(dir: String): Long = {
      val q = spark.read.parquet(dir).filter($"y" >= 8 && $"y" <= 15)
      // collect() executes THIS queryExecution, so its scan metrics are
      // the ones populated (count() would spawn a separate execution)
      assert(q.collect().length == 8 * 256) // correctness first: same answer both layouts
      val scans = q.queryExecution.executedPlan.collectLeaves()
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val zRead = rowsRead(zDir)
    val xRead = rowsRead(xDir)
    assert(xRead == 256L * 256, s"x-sorted layout cannot prune a y predicate: read $xRead")
    assert(zRead * 4 <= xRead,
      s"z-layout must skip most row groups on a y-only predicate: z=$zRead x=$xRead")
  }

  test("boundedDim folds into the domain without hashing away locality") {
    val out = Seq(5L, 1029L, -3L).toDF("v")
      .select(ZOrder.boundedDim($"v", 10).as("b")).as[Long].collect().toSeq
    assert(out == Seq(5L, 5L, 1021L)) // 1029 % 1024 = 5; pmod keeps -3 positive
  }
}
