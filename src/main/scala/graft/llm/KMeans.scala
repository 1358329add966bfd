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
  *     seeds), or [[maximinSeeds]] (init = "maximin"): deterministic
  *     farthest-point spreading, q128;
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
      init: String = "min-id",
  ): DataFrame = {
    val (cents, _) = fitWithMeans(df, idCol, embCol, k, iters, init)
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
      init: String = "min-id",
  ): DataFrame = {
    val (_, flat) = fitWithMeans(df, idCol, embCol, k, iters, init)
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

  /** DETERMINISTIC MAXIMIN seeding (the k-means++ idea with the
    * randomized D² draw replaced by the exact farthest-point pick,
    * Gonzalez 1985): seed 0 is the smallest-id vector; each next seed
    * is the vector MAXIMIZING its distance to the nearest chosen
    * seed, ties to the smallest id. Spreads seeds across the data
    * where smallest-id seeding can start k near-duplicates. Cost: one
    * distributed argmax pass per seed (k−1 passes — the published
    * kmeans++ budget; the min-distance column updates map-side with a
    * per-round checkpoint, so pass t does NOT recompute rounds
    * 0..t−1). Every distance is the q21 IEEE chain and the pick is a
    * (dist DESC, id ASC) TakeOrdered — engine-replayable, q128.
    * Output: (cell, centroid), cell = pick order. */
  def maximinSeeds(
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).as("id"),
      col(embCol).cast("array<double>").as("e"))
    val first = v.orderBy(col("id")).limit(1).collect()
    require(first.nonEmpty, "cannot seed k-means on an empty frame")
    var chosen = Seq(first.head.getSeq[Double](1))
    def d2(c: Seq[Double]) = {
      val cl = lit(c.toArray)
      Similarity.dot(col("e"), col("e")) -
        lit(2.0) * Similarity.dot(col("e"), cl) +
        Similarity.dot(cl, cl)
    }
    var minD = v.select(col("id"), col("e"), d2(chosen.head).as("md"))
      .localCheckpoint()
    for (_ <- 1 until k) {
      val next = minD.orderBy(col("md").desc, col("id").asc)
        .limit(1).collect().head.getSeq[Double](1)
      chosen = chosen :+ next
      if (chosen.size < k)
        minD = minD.select(col("id"), col("e"),
          least(col("md"), d2(next)).as("md")).localCheckpoint()
    }
    chosen.zipWithIndex.map { case (e, i) => (i, e) }
      .toDF("cell", "centroid")
      .select(col("cell"), col("centroid").cast("array<double>"))
  }

  /** EXACT within-cluster sum of squares — the cohesion yardstick
    * that makes a trained model judgeable (the X166 modularity move
    * for clustering): per cell, Σ |v − c|² over the members, each
    * squared distance computed by the q21 IEEE chain and summed as
    * floor-quantized integer sums (the q103 recipe — order-free where a float sum
    * drifts by partition count), returned as the identical-in-both-
    * engines double. Lower total = tighter clustering at the same k;
    * comparing min-id vs maximin fits is exactly what this column is
    * for. Output: (cell, n, wcss), one row per surviving cell. */
  def wcssByCell(
      df: DataFrame,
      centroids: DataFrame,
      idCol: String,
      embCol: String,
  ): DataFrame = {
    val assigned = assign(df, centroids, idCol, embCol)
    val d2 = Similarity.dot(col("e"), col("e")) -
      lit(2.0) * Similarity.dot(col("e"), col("centroid")) +
      Similarity.dot(col("centroid"), col("centroid"))
    assigned
      .join(broadcast(centroids.select(col("cell"), col("centroid"))),
        Seq("cell"))
      .select(col("cell"), d2.as("graft_d2_"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        (sum(Similarity.quant9(col("graft_d2_"))).cast("double") /
          lit(1.0e9)).as("wcss"))
  }

  private def fitWithMeans(
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iters: Int,
      init: String = "min-id",
  ): (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"need at least one iteration, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).as("id"),
      col(embCol).cast("array<double>").as("e"))
    var cents = init match {
      case "maximin" => maximinSeeds(df, idCol, embCol, k)
      case "min-id" =>
        // deterministic seeds: the k smallest ids, cell = id order. The
        // top-k runs distributed (TakeOrdered); k rows reach the driver.
        val seeds = v.orderBy(col("id")).limit(k).collect()
        require(seeds.nonEmpty, "cannot fit k-means on an empty frame")
        seeds.toSeq.zipWithIndex
          .map { case (r, i) => (i, r.getSeq[Double](1)) }
          .toDF("cell", "centroid")
          .select(col("cell"), col("centroid").cast("array<double>"))
      case other =>
        throw new IllegalArgumentException(
          s"unknown init '$other' — use 'min-id' or 'maximin'")
    }
    var flat: DataFrame = null
    for (_ <- 1 to iters) {
      val assigned = Ivf.assign(v, cents)
      // exact quantized means per (cell, dim) — the q103 recipe
      // (Similarity.quant9Mean): floor-quantized integer sums, order-
      // free and IEEE-identical in both engines; the former
      // DECIMAL(27,9) cast rounded half-boundaries differently across
      // engines (the r18 sf0.1 audit catch)
      flat = assigned
        .select(col("cell"), posexplode(col("e")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(
          Similarity.quant9Mean(col("x")).as("centroid"),
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
