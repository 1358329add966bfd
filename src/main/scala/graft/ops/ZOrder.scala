package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * for scan pruning, the hand-rolled analog of Delta/Iceberg's
  * OPTIMIZE ZORDER (no such lib in this sandbox).
  *
  * Why it matters at 100 TB: min/max zone maps (parquet row-group
  * stats, file-level pruning) only skip data when a file's value RANGE
  * is narrow. Sorting by (a, b) makes `a` ranges narrow but leaves `b`
  * spanning its full domain in every file — predicates on `b` alone
  * prune nothing. Interleaving the bits of both columns into one sort
  * key gives every file a small bounding BOX in (a, b) space, so
  * single-column predicates on EITHER dimension skip most files.
  *
  * [[zValue]] is pure integer bit arithmetic (shifts/masks composed
  * from built-in functions — fully codegen'd, and mirrored digit-for-
  * digit by the q40 DuckDB oracle); [[layout]] applies the standard
  * write path: range-partition by z, sort within partitions by z, so
  * downstream writers produce zone-map-friendly files. Callers bound
  * each column into [0, 2^bits) first ([[boundedDim]] helps).
  */
object ZOrder {

  /** Interleave the low `bits` of each column: result bit (i·k + j) =
    * bit i of cols(j), for k columns — the Morton code. Columns must
    * already be non-negative and < 2^bits. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.length <= 62,
      "need 1+ dims and bits*dims <= 62")
    val k = cols.length
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Clamp an arbitrary long column into the [0, 2^bits) domain by
    * hashing-free modular folding (pmod keeps locality for naturally
    * small/ordinal values, which is what z-order wants — do NOT hash). */
  def boundedDim(c: Column, bits: Int): Column =
    pmod(c.cast("long"), lit(1L << bits))

  /** Physically cluster `df` along the Morton curve of `cols`:
    * range-partition on the z-value (balanced output files via range
    * sampling), then sort within each partition so row groups inside a
    * file are also z-contiguous. One shuffle; every downstream
    * parquet/orc write of the result inherits the layout. */
  def layout(df: DataFrame, cols: Seq[Column], bits: Int, partitions: Int): DataFrame = {
    val z = zValue(cols, bits)
    df.repartitionByRange(partitions, z).sortWithinPartitions(z)
  }
}
