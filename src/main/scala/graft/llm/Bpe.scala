package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative BPE tokenizer INDUCTION — the merge loop that closes the
  * tokenizer story: [[CorpusStats.bpePairCounts]] computes the
  * statistic ONE merge round maximizes; this object runs the loop —
  * count pairs, take the argmax merge, rewrite, repeat — and emits
  * the induced vocabulary [[TextOps.subwordCount]] consumes, so a
  * pipeline no longer needs an external vocab file
  * ([[TextOps.loadVocab]] remains the deployment path for real
  * exports).
  *
  * Semantics (Sennrich et al. 2016, the standard algorithm):
  * words start as character sequences; each round counts ADJACENT
  * symbol pairs over the corpus (overlapping — "aaa" holds (a,a)
  * twice) weighted by word frequency, merges the most frequent pair
  * everywhere it occurs left-to-right non-overlapping ("aaaa" →
  * (aa)(aa), "aaa" → (aa)(a)), and repeats. Ties break (count DESC,
  * left ASC, right ASC) — fully deterministic, so re-runs, other
  * clusters, and the DuckDB oracle (q79) produce the identical merge
  * sequence.
  *
  * Scale shape — the loop never touches corpus-sized data after the
  * first aggregate:
  *   - ONE corpus pass builds the DISTINCT-WORD frequency table;
  *     every round thereafter works on that table (Heaps' law: the
  *     vocabulary grows ~sqrt of corpus size — at 100 TB the word
  *     table is GBs, and it only shrinks as merges fuse symbols).
  *   - each round is one partial-aggregated groupBy over exploded
  *     symbol pairs plus a 1-ROW argmax collect (the same bounded
  *     driver-hop contract as the IVF centroid table) and a pure
  *     map-side rewrite of the symbol arrays.
  *   - rounds localCheckpoint the (small) word table so round r's
  *     plan does not nest r lambda rewrites deep.
  */
object Bpe {

  /** One induced merge: `left`+`right` fused into `merged` at round
    * `round` (1-based) because the pair occurred `cnt` times
    * (word-frequency-weighted) in the round's corpus. */
  final case class Merge(round: Int, lhs: String, rhs: String, merged: String, cnt: Long)

  /** The (word, freq, symbol-array) working table: one corpus pass. */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame = {
    val w = col("w")
    docs
      .select(explode(split(coalesce(col(textCol), lit("")), " ")).as("w"))
      .groupBy(w)
      .agg(count(lit(1)).as("freq"))
      // chars via explicit substr, NOT split(w, "") — Java's split
      // keeps a trailing empty string under Spark's limit=-1
      .withColumn("syms",
        transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))))
      .filter(length(w) > 0)
  }

  /** Adjacent-pair counts (overlapping, frequency-weighted) of the
    * current symbol table — the [[CorpusStats.bpePairCounts]]
    * statistic lifted to arbitrary symbol sequences. */
  private[llm] def pairCounts(words: DataFrame): DataFrame = {
    val syms = col("syms")
    val pairs = when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("lhs"),
          element_at(syms, i + 1).as("rhs"))))
      .otherwise(array().cast("array<struct<lhs:string,rhs:string>>"))
    words
      .select(col("freq"), explode(pairs).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Left-to-right non-overlapping merge of adjacent (a, b) in a
    * symbol array: a matched pair consumes both symbols, and the scan
    * resumes after them — so an odd run of equal symbols keeps its
    * last one unmerged. One `aggregate` walk over the indices,
    * carrying (rebuilt array, skip-next flag); the `i < n` guard is
    * evaluated before the lookahead so the walk never indexes past
    * the array (ANSI mode throws on out-of-bounds element_at). */
  private[llm] def applyMerge(syms: Column, a: String, b: String): Column =
    applyMerge(syms, a, b, a + b)

  /** As above with an explicit fused symbol — [[WordPiece]] fuses
    * `a + b.stripPrefix("##")`, BPE plain `a + b`; the walk itself is
    * identical. */
  private[llm] def applyMerge(
      syms: Column, a: String, b: String, merged: String): Column = {
    val n = size(syms)
    val walked = aggregate(
      sequence(lit(1), n),
      struct(array().cast("array<string>").as("out"), lit(false).as("skip")),
      (acc, i) => {
        val out = acc.getField("out")
        val skip = acc.getField("skip")
        val cur = element_at(syms, i)
        val isMatch = !skip && (i < n) && (cur === lit(a)) &&
          (element_at(syms, i + 1) === lit(b))
        struct(
          when(skip, out)
            .when(isMatch, concat(out, array(lit(merged))))
            .otherwise(concat(out, array(cur)))
            .as("out"),
          (!skip && isMatch).as("skip"))
      },
      acc => acc.getField("out"))
    when(n < 2, syms).otherwise(walked)
  }

  /** Run `rounds` merge rounds over the corpus; returns the merge
    * sequence in order. Stops early when no pair reaches `minCount`
    * (a fully-fused or empty corpus has nothing left to merge). */
  def induceMerges(
      docs: DataFrame,
      textCol: String = "text",
      rounds: Int,
      minCount: Long = 1L,
  ): Seq[Merge] =
    induceFrom(wordTable(docs, textCol), rounds, minCount)

  /** BYTE-LEVEL [[induceMerges]] (GPT-2 lineage, Radford et al. 2019):
    * words decompose to UTF-8 BYTES mapped through the fixed
    * [[ByteToUnicode]] bijection instead of to characters, so the
    * base alphabet is exactly 256 symbols and NO out-of-vocabulary
    * tail exists — any UTF-8 input, any script, decomposes fully.
    * The merge loop itself is unchanged (same argmax, same ties, same
    * rewrite); only the initial symbol table differs. Char-level
    * remains the default because its merges are directly readable and
    * the q79 oracle replays it; byte-level is the production shape
    * for multilingual corpora (q109 replays it on a mixed-script
    * corpus — byte map and all — in DuckDB). */
  def induceMergesBytes(
      docs: DataFrame,
      textCol: String = "text",
      rounds: Int,
      minCount: Long = 1L,
  ): Seq[Merge] =
    induceFrom(wordTableBytes(docs, textCol), rounds, minCount)

  private def induceFrom(
      words0: DataFrame,
      rounds: Int,
      minCount: Long,
  ): Seq[Merge] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    var words = words0.localCheckpoint(false)
    val out = Seq.newBuilder[Merge]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      // 1-row driver hop: the argmax pair of this round
      val best = pairCounts(words)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1)
        .collect()
      if (best.isEmpty || best(0).getLong(2) < minCount) {
        dry = true
      } else {
        val (a, bSym, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += Merge(r, a, bSym, a + bSym, cnt)
        words = words
          .withColumn("syms", applyMerge(col("syms"), a, bSym))
          .localCheckpoint(false)
        r += 1
      }
    }
    out.result()
  }

  /** BATCHED-ARGMAX variant of [[induceMerges]] — same merge
    * sequence, ~`batch`× fewer driver round-trips. One pair-count
    * aggregate per ROUND takes the top-M merges that are provably
    * safe to apply together, by the standard frequency-gap argument:
    *
    * walking pairs in (cnt DESC, lhs, rhs) order, accept while the
    * pair shares no symbol with any already-accepted merge (its lhs,
    * rhs, or fused symbol). At the FIRST interacting pair — count B —
    * stop and keep only accepted pairs with cnt STRICTLY > B (plus
    * the head, which is the exact sequential argmax): applying an
    * accepted merge (a,b) leaves every disjoint pair's count
    * untouched (adjacency changes only at the merge site), and any
    * NEW pair it creates — (x,ab) or (ab,y) — is a subset of the old
    * interacting pair (x,a)/(b,y), so its count is ≤ B; with every
    * kept count > B, the sequential loop would have picked exactly
    * these pairs in exactly this order before any interacting or
    * newly-created pair could surface. Ties at B stay sequential
    * (only the head survives a tie). When the fetched top-K list
    * ends without an interactor, the last fetched count bounds the
    * unseen tail the same way; a fully-exhausted list accepts
    * everything.
    *
    * Each round then applies the accepted merges as one chained
    * map-side rewrite and ONE localCheckpoint — the driver exchange
    * drops from one 1-row hop per merge to one ≤`fetch`-row hop per
    * batch. [[induceMerges]] remains the oracle reference; the
    * equivalence is spec-pinned including adversarial interaction/tie
    * fixtures. */
  def induceMergesBatched(
      docs: DataFrame,
      textCol: String = "text",
      rounds: Int,
      minCount: Long = 1L,
      batch: Int = 8,
  ): Seq[Merge] =
    induceBatchedFrom(wordTable(docs, textCol), rounds, minCount, batch)

  /** Batched-argmax twin of [[induceMergesBytes]] — the byte-level
    * word table through the frequency-gap batching proof. */
  def induceMergesBytesBatched(
      docs: DataFrame,
      textCol: String = "text",
      rounds: Int,
      minCount: Long = 1L,
      batch: Int = 8,
  ): Seq[Merge] =
    induceBatchedFrom(wordTableBytes(docs, textCol), rounds, minCount, batch)

  private def induceBatchedFrom(
      words0: DataFrame,
      rounds: Int,
      minCount: Long,
      batch: Int,
  ): Seq[Merge] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(batch >= 1, s"batch must be >= 1, got $batch")
    val fetch = math.max(batch * 4, 16)
    var words = words0.localCheckpoint(false)
    val out = Seq.newBuilder[Merge]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val top = pairCounts(words)
        .filter(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(fetch)
        .collect()
        .map(row => (row.getString(0), row.getString(1), row.getLong(2)))
      if (top.isEmpty) dry = true
      else {
        val sawAll = top.length < fetch
        // greedy non-interacting prefix (symbol-disjoint from every
        // accepted lhs/rhs/fused), bounded by the remaining round
        // budget; B = the first interactor's (or list tail's) count
        val budget = math.min(batch, rounds - r + 1)
        val accepted = Seq.newBuilder[(String, String, Long)]
        val seen = scala.collection.mutable.Set.empty[String]
        var bound = Long.MinValue
        var bounded = !sawAll // unseen tail bounds by the last fetched cnt
        var taken = 0
        var i = 0
        var stop = false
        while (i < top.length && !stop) {
          val (a, b, c) = top(i)
          if (taken == budget) { bound = c; bounded = true; stop = true }
          else if (seen(a) || seen(b) || seen(a + b)) {
            bound = c; bounded = true; stop = true
          } else {
            accepted += ((a, b, c)); taken += 1
            seen += a; seen += b; seen += (a + b)
          }
          i += 1
        }
        if (!stop && !sawAll) bound = top.last._3
        val safe0 = accepted.result()
        val safe =
          if (!bounded && sawAll && !stop) safe0
          else safe0.head +: safe0.tail.filter(_._3 > bound)
        safe.foreach { case (a, b, c) => out += Merge(r, a, b, a + b, c); r += 1 }
        words = safe
          .foldLeft(words) { case (w, (a, b, _)) =>
            w.withColumn("syms", applyMerge(col("syms"), a, b))
          }
          .localCheckpoint(false)
      }
    }
    out.result()
  }

  /** [[induceMerges]] as a catalog-friendly DataFrame:
    * (round, lhs, rhs, merged, cnt), round ascending. */
  def induce(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String = "text",
      rounds: Int,
      minCount: Long = 1L,
  ): DataFrame = {
    import spark.implicits._
    induceMerges(docs, textCol, rounds, minCount).toDF()
  }

  /** The GPT-2 byte-to-unicode bijection (public `bytes_to_unicode`
    * construction): the 188 "printable" latin bytes map to themselves;
    * the remaining 68 (controls, space, DEL, 0x7F-0xA0, 0xAD) map to
    * codepoints 256+n in ascending byte order. Every byte gets a
    * VISIBLE single character, so merged symbols are plain strings,
    * string concat is symbol fusion, and a vocab file round-trips
    * through ordinary text I/O. */
  val ByteToUnicode: IndexedSeq[String] = {
    val keep = (('!'.toInt to '~'.toInt) ++ (0xA1 to 0xAC) ++ (0xAE to 0xFF)).toSet
    val out = Array.ofDim[String](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = b.toChar.toString
      else { out(b) = (256 + n).toChar.toString; n += 1 }
      b += 1
    }
    out.toIndexedSeq
  }

  private val UnicodeToByte: Map[Char, Byte] =
    ByteToUnicode.zipWithIndex.map { case (c, i) => c.charAt(0) -> i.toByte }.toMap

  /** Driver-side inverse of the byte map: a merged byte-level symbol
    * (or whole tokenized string) back to real UTF-8 text — for vocab
    * inspection and exports. Symbols that split a multi-byte
    * character render as replacement chars, faithfully: byte-level
    * merges are under no obligation to respect char boundaries. */
  def byteDecode(s: String): String =
    new String(s.map(UnicodeToByte).toArray, java.nio.charset.StandardCharsets.UTF_8)

  /** The byte-mapped symbol array of one word: hex the UTF-8 bytes
    * once, then slice two hex chars per byte and look the value up in
    * the (tiny, literal-embedded) table. All codegen'd builtins,
    * map-side; mirrored hex-slice-for-hex-slice by the q109 oracle. */
  private def byteSyms(w: Column): Column = {
    val hx = hex(encode(w, "UTF-8"))
    transform(sequence(lit(1), octet_length(w)),
      i => element_at(typedlit(ByteToUnicode),
        conv(substr(hx, i * 2 - 1, lit(2)), 16, 10).cast("int") + 1))
  }

  private def wordTableBytes(docs: DataFrame, textCol: String): DataFrame = {
    val w = col("w")
    docs
      .select(explode(split(coalesce(col(textCol), lit("")), " ")).as("w"))
      .groupBy(w)
      .agg(count(lit(1)).as("freq"))
      .withColumn("syms", byteSyms(w))
      .filter(length(w) > 0)
  }

  /** Map every whitespace-separated word of `text` through the byte
    * table (words rejoined with real spaces): the columnar encode
    * that makes [[TextOps.subwordCount]] a BYTE-LEVEL tokenizer when
    * fed a [[vocabFromMerges]] vocab from [[induceMergesBytes]] —
    * greedy longest-match over mapped symbols, single mapped bytes as
    * the universal fallback, hence zero OOV on any input. */
  def byteEncodeWords(text: Column): Column =
    array_join(
      transform(split(coalesce(text, lit("")), " "),
        w => array_join(byteSyms(w), "")),
      " ")

  /** [[induceMergesBytes]] as a catalog-friendly DataFrame:
    * (round, lhs, rhs, merged, cnt), round ascending. */
  def induceBytes(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String = "text",
      rounds: Int,
      minCount: Long = 1L,
  ): DataFrame = {
    import spark.implicits._
    induceMergesBytes(docs, textCol, rounds, minCount).toDF()
  }

  /** The vocabulary the merge sequence induces, ready for
    * [[TextOps.subwordCount]]: every merged symbol, longest first so
    * greedy longest-match-first consumes full merges before their
    * halves (single characters are the tokenizer's built-in
    * fallback, exactly as with the hand-written default vocab). */
  def vocabFromMerges(merges: Seq[Merge]): Seq[String] =
    merges.map(_.merged).distinct.sortBy(m => (-m.length, m))
}
