package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** FIRST-CLASS k-means — Lloyd's algorithm as a catalog operator with
  * a frozen-model oracle (VERDICT r12 missing #4): embedding
  * clustering exposed directly, not buried inside IVF/PQ training.
  *
  * Determinism — every step is engine-replayable:
  *   - INIT is the k smallest-id vectors, numbered 0..k−1 in id order
  *     (pure arithmetic — no RNG, no hash; any engine picks the same
  *     seeds);
  *   - ASSIGNMENT is the argmin of |v|²−2v·c+|c|² with ties to the
  *     smallest cell — the q21-proven IEEE chain DuckDB's
  *     list_dot_product reproduces bit-for-bit;
  *   - UPDATE means are EXACT DECIMAL sums per (cell, dim) divided by
  *     the count (the q103 centroid recipe) — order-free where a
  *     float mean drifts by partition count, so iteration t's
  *     centroids are a pure function of iteration t−1's.
  * Cells that lose every vector DROP (the standard empty-cell rule);
  * both engines derive the same survivor set, so the model stays
  * hash-matchable.
  *
  * Scale shape (the 100 TB contract): per iteration, assignment is a
  * BROADCAST of the k×dim centroid table + a per-row argmin (no
  * shuffle of vectors), and the update is one positional explode +
  * map-side-combined (cell, dim) aggregate — shuffle payload is
  * k·dim decimals per map task, NOT the corpus. Only the k×dim
  * centroid matrix ever reaches the driver (constant in corpus
  * size). Serving (assign once, cluster ids for downstream
  * grouping/dedup) is the same broadcast-argmin, shuffle-free.
  */
object KMeans {

  /** The frozen fit artifact: (cell, centroid: array<double>, n) —
    * persist through a TableStore like any model (the X49/X134 rule)
    * and serve via [[assign]]. */
  def fit(
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iters: Int = 5,
  ): DataFrame = {
    val (cents, _) = fitWithMeans(df, idCol, embCol, k, iters)
    cents
  }

  /** The fit's final per-(cell, dim) mean table —
    * (cell, dim, centroid, n), the exact flattened view the q122
    * oracle replays (same rows as [[fit]], pre-assembly). */
  def fitFlat(
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iters: Int = 5,
  ): DataFrame = {
    val (_, flat) = fitWithMeans(df, idCol, embCol, k, iters)
    flat
  }

  /** Assign every vector to its nearest centroid — the serve step,
    * shared machinery with [[Ivf.assign]] (broadcast centroids,
    * windowed argmin, ties to the smallest cell). Output: input
    * columns as (id, e) plus `out`. */
  def assign(
      df: DataFrame,
      centroids: DataFrame,
      idCol: String,
      embCol: String,
      out: String = "cell",
  ): DataFrame =
    Ivf.assign(
      df.select(col(idCol).as("id"),
        col(embCol).cast("array<double>").as("e")),
      centroids.select(col("cell"), col("centroid")), out)

  private def fitWithMeans(
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iters: Int,
  ): (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"need at least one iteration, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).as("id"),
      col(embCol).cast("array<double>").as("e"))
    // deterministic seeds: the k smallest ids, cell = id order. The
    // top-k runs distributed (TakeOrdered); k rows reach the driver.
    val seeds = v.orderBy(col("id")).limit(k).collect()
    require(seeds.nonEmpty, "cannot fit k-means on an empty frame")
    var cents = seeds.toSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
      .toDF("cell", "centroid")
      .select(col("cell"), col("centroid").cast("array<double>"))
    var flat: DataFrame = null
    for (_ <- 1 to iters) {
      val assigned = Ivf.assign(v, cents)
      // exact decimal means per (cell, dim) — the q103 recipe: float
      // sources carry ≤ 9 significant decimals, DECIMAL(27,9) sums
      // them exactly and order-free; the final /n is one IEEE divide
      flat = assigned
        .select(col("cell"), posexplode(col("e")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(
          (sum(col("x").cast(DecimalType(27, 9))).cast("double") /
            count(lit(1))).as("centroid"),
          count(lit(1)).as("n"))
        .localCheckpoint() // k·dim rows; also cuts the per-iter lineage
      val byCell = flat.collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          (cell, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq,
            rows.head.getLong(3))
        }
        .toSeq.sortBy(_._1)
      cents = byCell.map { case (c, e, _) => (c, e) }
        .toDF("cell", "centroid")
        .select(col("cell"), col("centroid").cast("array<double>"))
    }
    val model = cents.join(
      flat.groupBy(col("cell")).agg(max(col("n")).as("n")), Seq("cell"))
    (model, flat)
  }
}
