package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** Entity-resolution join — equi-join two tables whose string keys
  * agree only up to FORMATTING: case, Unicode form (composed vs
  * decomposed, full-width, ligatures), whitespace runs, and word
  * order. The everyday record-linkage case ("ACME  Corp" vs "acme
  * corp" vs "Corp ACME") where a raw equi-join silently loses rows
  * and the naive fix — a similarity cross join — is N².
  *
  * The move: canonicalize each side's key with the X126 normalization
  * chain (compiled Unicode normalize → casefold → Unicode-whitespace
  * collapse) plus a token SORT, then plain equi-join on the canonical
  * key. Canonicalization is map-side (inside the scan projection —
  * the q93 discipline), so the join keeps hash-join shape, shuffles,
  * broadcasts, and AQE exactly as if the keys had been clean — the
  * scale profile IS the equi-join's. What it does NOT catch: typos
  * (that's the X39 edit-distance verifier over LSH candidates — a
  * different cost tier); token-sort also conflates anagram phrases,
  * the standard trade of sort-neutralized matching. */
object FuzzyJoin {

  /** The canonical match key: NFC + casefold + whitespace collapse
    * (NFC, not NFKC, when another engine must replay it — q106), then
    * token sort. A pure projection — usable standalone to persist a
    * match-key column next to the data. */
  def canonicalKey(
      text: Column,
      form: String = "NFC",
  ): Column =
    concat_ws(" ", sort_array(split(
      TextOps.normalize(text,
        graft.llm.TextOps.Normalize(form, caseFold = true, collapseWs = true)),
      " ")))

  /** Equi-join `left` and `right` on the canonical form of their key
    * columns. Output: left columns + right columns (the right key is
    * dropped — it matched the left's canonically), inner by default.
    */
  def onCanonicalKey(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      joinType: String = "inner",
      form: String = "NFC",
  ): DataFrame = {
    require(!left.columns.contains("graft_ck_") &&
        !right.columns.contains("graft_ck_"),
      "input already carries the working column graft_ck_")
    val lk = left.withColumn("graft_ck_", canonicalKey(col(leftKey), form))
    val rk = right.withColumn("graft_ck_", canonicalKey(col(rightKey), form))
      .drop(rightKey)
    lk.join(rk, Seq("graft_ck_"), joinType).drop("graft_ck_")
  }
}
