package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO semantics as a relational operator — the general
  * warehouse mutation [[Upsert]] is a special case of: per target row
  * matched by key,
  *
  *   - WHEN MATCHED AND `deleteWhen` → row removed,
  *   - WHEN MATCHED (otherwise)      → columns in `updateSet`
  *     reassigned (expressions may reference both sides: target
  *     columns by name, source columns via `src("col")`),
  *   - WHEN NOT MATCHED (source-only keys, `insertNotMatched`) →
  *     row inserted from `insertSet`,
  *   - target rows with no source match pass through unchanged.
  *
  * Compiled to ONE full-outer join on the key plus per-column CASE
  * projection — no table rewrite beyond the join itself, no driver
  * loops, and the same shape a MERGE-capable table format executes
  * under the hood. Pair with [[graft.io.SnapshotBucketedStore]] to
  * persist the result O(touched-buckets) with an atomic commit.
  *
  * Column reference rules: `updateSet`/`deleteWhen` see target columns
  * under their own names and source columns via [[MergeInto.src]];
  * `insertSet` sees only source columns (via [[MergeInto.src]]).
  * Source must be key-unique (validator-grade precondition, same as
  * upsert).
  */
object MergeInto {

  private val SrcPrefix = "_graft_src_"

  /** Reference a SOURCE column inside merge expressions. */
  def src(name: String): Column = col(s"$SrcPrefix$name")

  def merge(
      target: DataFrame,
      source: DataFrame,
      key: String,
      updateSet: Map[String, Column],
      deleteWhen: Option[Column] = None,
      insertSet: Map[String, Column] = Map.empty,
  ): DataFrame = {
    val targetCols = target.columns.toSeq
    require(updateSet.keys.forall(targetCols.contains), "updateSet must target existing columns")
    require(insertSet.isEmpty || insertSet.keySet == targetCols.toSet,
      "insertSet must cover every target column")
    val s = source.columns.foldLeft(source)((d, c) => d.withColumnRenamed(c, s"$SrcPrefix$c"))
    val joined = target
      .withColumn("_graft_t", lit(1L))
      .join(
        s.withColumn("_graft_s", lit(1L)),
        col(key) === src(key),
        "full_outer")
    val matched = col("_graft_t").isNotNull && col("_graft_s").isNotNull
    val sourceOnly = col("_graft_t").isNull
    // coalesce: a null-valued delete predicate must mean "keep", not
    // silently drop the row through three-valued logic
    val doomed = deleteWhen.map(c => coalesce(matched && c, lit(false))).getOrElse(lit(false))
    val out = targetCols.map { c =>
      ((updateSet.get(c), insertSet.get(c)) match {
        case (Some(u), Some(i)) => when(matched, u).when(sourceOnly, i).otherwise(col(c))
        case (Some(u), None)    => when(matched, u).otherwise(col(c))
        case (None, Some(i))    => when(sourceOnly, i).otherwise(col(c))
        case (None, None)       => col(c)
      }).as(c)
    }
    val kept =
      if (insertSet.isEmpty) joined.filter(!sourceOnly) else joined
    kept.filter(!doomed).select(out: _*)
  }
}
