package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-free table content digest — "is this table over there the
  * same table?" without sorting either side: per-row 60-bit md5
  * fingerprints summed in exact DECIMAL(38,0). Addition commutes, so
  * the digest is independent of partitioning, row order, and merge
  * order — two clusters (or two ENGINES: the q102 oracle replays the
  * digest in DuckDB bit-for-bit) can each digest their copy with one
  * combiner-only pass and compare two numbers. The companion of the
  * X130 diff: the diff tells you WHAT changed, this tells you
  * WHETHER anything did, at 1/row-width the cost.
  *
  * Collision posture: forging equal sums needs structured md5-prefix
  * collisions — fine for replication/migration verification, not a
  * cryptographic commitment. The sum rides decimal(38,0), exact to
  * ~10³⁸, so overflow would need ~10²⁰ rows. NULL and column-order
  * discipline: every column renders through an explicit
  * `coalesce(cast(c as string), '␀')` joined with the 0x1F unit
  * separator in DECLARED order — (null,"a") and ("a",null) digest
  * differently, and so does a column permutation. The 0x1F separator
  * is out-of-band for real data; the NULL marker is NOT — a genuine
  * cell whose rendered value is the literal string "␀" (U+2400) is
  * indistinguishable from NULL in the digest. That marker is printable
  * (so the canonical string replays verbatim in any oracle engine) at
  * the cost of this documented ambiguity; callers with U+2400 in data
  * should pre-map it. Callers pick columns whose STRING RENDERING is
  * engine-stable (integers, strings, dates; doubles/timestamps format
  * differently across engines — cast or round them explicitly first).
  *
  * Scale shape: one map-side projection (md5 + sum partials), one
  * single-row reduce. No shuffle of data, no sort anywhere. */
object Digest {

  private val Sep = "\u001f" // unit separator: not in real data
  private val NullMark = "␀"

  /** The per-row 60-bit fingerprint (md5 prefix, the engine-portable
    * hash family every oracle already replays). */
  def rowFingerprint(cols: Seq[Column]): Column = {
    val canonical = concat_ws(Sep,
      cols.map(c => coalesce(c.cast("string"), lit(NullMark))): _*)
    conv(substring(md5(canonical), 1, 15), 16, 10).cast("decimal(38,0)")
  }

  /** Digest `cols` (declared order) of `df`: one row
    * (row_cnt, digest). Equal digests + equal counts ⇒ same multiset
    * of rendered rows, any order, any partitioning. */
  def tableDigest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "digest needs at least one column")
    df.select(rowFingerprint(cols.map(col)).as("graft_fp_"))
      .agg(count(lit(1)).as("row_cnt"),
        coalesce(sum(col("graft_fp_")), lit(0).cast("decimal(38,0)"))
          .as("digest"))
  }

  /** Per-group digests — the bucket-level form: compare group-by-group
    * to LOCATE divergence (which partition/day/source drifted) before
    * paying for a row-level X130 diff. */
  def tableDigestPerGroup(
      df: DataFrame,
      groupCol: String,
      cols: Seq[String],
  ): DataFrame = {
    require(cols.nonEmpty, "digest needs at least one column")
    df.select(col(groupCol),
        rowFingerprint(cols.map(col)).as("graft_fp_"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("row_cnt"), sum(col("graft_fp_")).as("digest"))
  }
}
