package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Columnar text-analysis primitives for LLM training-data pipelines:
  * tokenization, n-gram shingling, token counting, language-ID
  * heuristics, quality scoring, and document fingerprinting.
  *
  * Everything here is a pure Catalyst column expression (built-in
  * functions + higher-order array functions) — no UDFs, no collects —
  * so all of it stays inside whole-stage codegen (except the
  * higher-order functions, which are still JVM-native and
  * partition-local). Every op is embarrassingly parallel map-side work:
  * at 100 TB these scale linearly with input splits and introduce no
  * shuffle of their own.
  *
  * Determinism: the hash family used for fingerprints/minhash is
  * md5-based (see [[hash60]]) specifically so the DuckDB oracle can
  * reproduce it bit-for-bit; xxhash64 variants exist for production
  * speed where cross-engine equality is not needed.
  */
object TextOps {

  /** Tokenization mode for scripts the whitespace convention
    * under-serves. Every text op in the repo tokenizes on `' '` —
    * correct for space-separated corpora, but a CJK/Thai document has
    * no spaces and degenerates to ONE token per line, silently
    * weakening dedup, repetition, and surprisal signals.
    * [[Codepoint]] mode treats each non-whitespace codepoint as a
    * token — the standard character-grain fallback when no segmenter
    * model is available (char n-grams are what CJK dedup pipelines
    * ship with). */
  sealed trait TokenMode
  /** Tokens are maximal runs between whitespace (the default). */
  case object Whitespace extends TokenMode
  /** Each non-whitespace codepoint is one token. */
  case object Codepoint extends TokenMode

  /** SEGMENTATION PREPROCESSOR — re-expresses `text` so the
    * whitespace pipeline applies unchanged: [[Codepoint]] mode joins
    * the non-whitespace codepoints with single spaces (a segmenter
    * emitting space-separated units, exactly how production CJK
    * pipelines front a whitespace-tokenized stack), [[Whitespace]] is
    * the identity. Running ANY downstream op — shingles, minhash,
    * suffix repeats, chunking, packing — in codepoint mode is
    * `op(segment(text))`; operators with a `mode` parameter just do
    * this internally. Pure map-side projection (substr walk, no
    * regex-dialect dependence — the DuckDB mirror is the same
    * generate_series/substr walk).
    *
    * Whitespace here is Java-regex `\s` (ASCII) PLUS U+3000
    * IDEOGRAPHIC SPACE — the space character CJK text (this mode's
    * whole audience) actually uses; without it the ideographic space
    * would survive as a content codepoint and pollute char-gram
    * dedup/repetition signals. The q80 oracle strips the identical
    * class (`[\s\x{3000}]` in RE2). Other exotic Unicode spaces are
    * the [[normalize]] preprocessor's job (NFKC folds most of them
    * to U+0020), not the segmenter's. */
  def segment(text: Column, mode: TokenMode): Column = mode match {
    case Whitespace => text
    case Codepoint =>
      // bind the whitespace-stripped text ONCE as a lambda variable
      // (the shingleHashesHof trick): Spark does no common-
      // subexpression elimination inside lambdas, so referencing the
      // regexp_replace subtree from the per-character substr would
      // re-run it PER CHARACTER — O(len²) per document
      val compact = regexp_replace(coalesce(text, lit("")), "[\\s\u3000]+", "")
      array_join(
        element_at(
          transform(array(compact), c =>
            when(length(c) === 0, array().cast("array<string>"))
              .otherwise(transform(sequence(lit(1), length(c)),
                i => c.substr(i, lit(1))))),
          1),
        " ")
  }

  /** UNICODE NORMALIZATION PREPROCESSOR — the CCNet/C4
    * normalize-before-dedup step the hash family otherwise lacks:
    * every dedup/fingerprint op keys on raw codepoints, so a
    * full-width, ligature, combining-mark, or NBSP variant of a
    * document defeats exact dedup, MinHash, and line dedup while
    * reading identically to a human. Threads exactly like [[segment]]
    * threads [[TokenMode]]: running any op normalized is
    * `op(normalize(text, norm))`, and the dedup entry points
    * ([[Dedup.exactKeepers]], [[Dedup.nearDupPairs]],
    * [[Corpus.dedupLines]]) take a `norm` parameter that does this
    * internally. */
  sealed trait NormMode
  /** Raw codepoints (the default — every frozen oracle hash keys on
    * this). */
  case object NormNone extends NormMode
  /** Unicode-normalize (`form` ∈ NFC/NFKC/NFD/NFKD), then optionally
    * lowercase, then optionally collapse every Unicode-whitespace run
    * to one space and trim. NFC is the oracle-checkable form (DuckDB
    * `nfc_normalize` implements the same published algorithm — q93);
    * NFKC additionally folds compatibility variants (full-width
    * `Ａ`→`A`, ligature `ﬁ`→`fi`, NBSP→space) and is the production
    * corpus-hygiene default, pinned by NormalizeSpec. */
  final case class Normalize(
      form: String = "NFKC",
      caseFold: Boolean = true,
      collapseWs: Boolean = true,
  ) extends NormMode

  /** The Unicode whitespace class the collapse step folds to one
    * space: Java-regex `\s` (ASCII) plus NBSP, OGHAM SPACE MARK, the
    * U+2000–200A space family, LINE/PARAGRAPH SEPARATOR, NARROW
    * NBSP, MATH SPACE, and IDEOGRAPHIC SPACE. The DuckDB mirror is
    * the same class in RE2 spelling
    * (`[\s\x{00A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]`). */
  val UnicodeWsClass: String =
    "[\\s\u00A0\u1680\u2000-\u200A\u2028\u2029\u202F\u205F\u3000]"

  /** Apply a [[NormMode]] to a text column. [[NormNone]] is the
    * identity; [[Normalize]] runs the compiled
    * [[graft.expr.UnicodeNormalize]] node (codegen'd, map-side, ASCII
    * fast path), then `lower`, then the whitespace collapse — in that
    * fixed order, which the q93 oracle mirrors step for step
    * (`nfc_normalize` → `lower` → `regexp_replace` → `trim`).
    * Case-folding is the engines' simple lowercase; exotic one-to-many
    * foldings (Turkish dotted İ, ß) can differ across engines and are
    * deliberately outside the oracled surface. */
  def normalize(text: Column, norm: NormMode): Column = norm match {
    case NormNone => text
    case Normalize(form, caseFold, collapseWs) =>
      val unicode = org.apache.spark.sql.GraftBridge.toColumn(
        graft.expr.UnicodeNormalize(
          org.apache.spark.sql.GraftBridge.toExpr(text), form))
      val folded = if (caseFold) lower(unicode) else unicode
      if (collapseWs) trim(regexp_replace(folded, UnicodeWsClass + "+", " "))
      else folded
  }

  /** Whitespace tokenization (the reference corpus is space-separated;
    * `\s+` keeps it robust to runs of whitespace). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Mode-switched tokenization: [[Whitespace]] is [[tokens]],
    * [[Codepoint]] tokenizes the [[segment]]ed text — so
    * `shingles(tokens(t, mode), n)` builds character n-grams under
    * codepoint mode with no other change. */
  def tokens(text: Column, mode: TokenMode): Column = mode match {
    case Whitespace => tokens(text)
    case Codepoint => tokens(segment(text, Codepoint))
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy count: alpha runs, digit runs, and single
    * punctuation marks each count as one token — a cheap, deterministic
    * stand-in for a real BPE vocab (which would need a model file). */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0)))

  /** Distinct word n-gram shingles of an already-tokenized array.
    * `transform(sequence(...))` is per-row array work — no shuffle.
    * Docs shorter than n tokens yield an empty array (guarded: Spark's
    * `sequence(0, -1)` would count DOWN, not produce empty). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        array_distinct(
          transform(
            sequence(lit(0), size(toks) - n),
            i => array_join(slice(toks, i + 1, lit(n)), " "),
          )
        )
      )

  /** 60-bit deterministic hash of a string via md5 — the first 15 hex
    * digits parsed base-16. Chosen (over xxhash64) because DuckDB can
    * compute the identical value (`('0x'||substr(md5(s),1,15))::BIGINT`),
    * making minhash/fingerprint queries oracle-checkable. 60 bits keeps
    * the value positive in a signed 64-bit long in both engines. */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** 28-bit md5-derived hash (first 7 hex digits): the cheap base hash
    * for the minhash affine family — small enough that (a·h+b) stays
    * below 2^62 for 31-bit a,b, so the SAME arithmetic is overflow-free
    * in both Spark (Long) and DuckDB (BIGINT, which errors on
    * overflow rather than wrapping). */
  def hash28(s: Column): Column =
    conv(substring(md5(s), 1, 7), 16, 10).cast("long")

  /** Shingle-combination constants (fixed odd constants near 1e6;
    * h·C term sums stay far below 2^62 for 28-bit h even at width 16)
    * and modulus — shared with the DuckDB mirrors. The first three are
    * frozen (q13/q24/q30 oracles depend on them); the tail extends the
    * family for wide passage windows (q33). */
  val ShingleC: Seq[Long] = Seq(
    1000003L, 999983L, 999979L, 999961L, 999959L, 999953L, 999931L,
    999917L, 999907L, 999883L, 999863L, 999841L, 999809L, 999773L,
    999769L, 999763L,
    // extension (r5): 8 more primes so window widths up to 24 are
    // expressible (the multi-w segment sweep runs w=20). Appending
    // preserves every existing take(n) prefix, so all frozen hashes
    // (q13/q33/q38/q44 oracles) are unchanged.
    999749L, 999727L, 999721L, 999683L, 999671L, 999667L, 999653L,
    999631L)
  val ShingleM: Long = 2147483647L

  /** Hashed word-n-gram shingles: one 28-bit md5 per TOKEN, then each
    * n-gram's hash is the arithmetic combination
    * (h_i·C1 + h_{i+1}·C2 + … ) mod M — no shingle strings are ever
    * materialized. Production path is the compiled
    * [[graft.expr.ShingleHashes]] expression (one tight loop per row);
    * [[shingleHashesHof]] is the equivalent column-composition form
    * the DuckDB oracle mirrors and the equivalence test cross-checks.
    * Output: distinct array<long>, empty below n tokens. */
  def shingleHashes(text: Column, n: Int): Column = {
    require(n <= ShingleC.length, s"n <= ${ShingleC.length} supported")
    org.apache.spark.sql.GraftBridge.toColumn(
      graft.expr.ShingleHashes(
        org.apache.spark.sql.GraftBridge.toExpr(text),
        n,
        ShingleC.take(n),
        ShingleM))
  }

  /** Position-preserving window hashes: element i is the hash of the
    * w-token window STARTING at token i (0-based), duplicates kept —
    * the form segment mining needs ([[Dedup.repeatedSegments]]), where
    * [[shingleHashes]]'s set form would lose run structure. */
  def windowHashesPositional(text: Column, w: Int): Column = {
    require(w <= ShingleC.length, s"w <= ${ShingleC.length} supported")
    org.apache.spark.sql.GraftBridge.toColumn(
      graft.expr.ShingleHashes(
        org.apache.spark.sql.GraftBridge.toExpr(text),
        w,
        ShingleC.take(w),
        ShingleM,
        distinct = false))
  }

  /** WINNOWING fingerprints (Schleimer/Wilkerson/Aiken 2003 — the
    * MOSS fingerprint selection): over the positional k-gram hashes,
    * slide a w-wide window and keep each window's MINIMUM; the
    * distinct selected values are the document's fingerprint set.
    * The two properties the paper proves and sparse sampling alone
    * lacks: GUARANTEE — any shared token run of length ≥ w + k − 1
    * contributes at least one shared fingerprint (the shared run
    * holds a full window; both docs keep that window's minimum) —
    * and DENSITY ~ 2/(w+1) of positions, so the inverted index is a
    * w-fold smaller posting table than full shingle sets at a known
    * detection floor. Value-set form: tied minima collapse (the set
    * is what the pairing join keys on). Docs with fewer than k
    * tokens fingerprint empty; with fewer than w windows, the single
    * global minimum. O(L·w) per row, all inside one projection. */
  def winnowHashes(text: Column, k: Int, w: Int): Column = {
    require(w >= 1, s"window w must be >= 1, got $w")
    val th = windowHashesPositional(text, k)
    when(size(th) === 0, array().cast("array<bigint>"))
      .when(size(th) < w, array(array_min(th)))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(th) - w),
        i => array_min(slice(th, i + 1, lit(w))))))
  }

  /** Hashes of the ONE-DELETION neighborhood of the text's n-gram
    * shingles (each window's n (n−1)-token deletion variants, affine
    * family, distinct) — the join key for near-miss decontamination:
    * windows that differ by a single inserted/dropped/substituted
    * token still collide. Compiled loop ([[graft.expr.
    * ShingleDeletionHashes]]); coefficient k multiplies the k-th
    * surviving token, so the DuckDB mirror is the same arithmetic
    * unrolled per deletion position. */
  def shingleDeletionHashes(text: Column, n: Int): Column = {
    require(n >= 2 && n - 1 <= ShingleC.length,
      s"2 <= n <= ${ShingleC.length + 1} supported, got $n")
    org.apache.spark.sql.GraftBridge.toColumn(
      graft.expr.ShingleDeletionHashes(
        org.apache.spark.sql.GraftBridge.toExpr(text),
        n,
        ShingleC.take(n - 1),
        ShingleM))
  }

  /** DEFLATE output length of the text's UTF-8 bytes (level 6, raw) —
    * the compression-ratio quality signal's numerator (see
    * [[graft.expr.DeflateLen]]): deflate_len / byte_len ≪ 1 flags
    * degenerate repeated text. Not DuckDB-replayable; spec-pinned. */
  def deflateLen(text: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      graft.expr.DeflateLen(
        org.apache.spark.sql.GraftBridge.toExpr(text)))

  /** 60-bit md5 hashes of the text's distinct n-gram shingle STRINGS
    * (compiled loop; equals `transform(shingles(tokens(t),n), hash60)`
    * but one digest per shingle instead of an interpreted expression
    * chain — the SimHash-pipeline (q44) workhorse). */
  def shingleHash60s(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      graft.expr.ShingleHash60s(
        org.apache.spark.sql.GraftBridge.toExpr(text), n))

  /** HOF reference form of [[shingleHashes]] (see its doc). The
    * token-hash array is bound ONCE via a single-element `transform`
    * wrapper: Spark does no common-subexpression elimination inside
    * interpreted lambdas, so referencing it three times directly would
    * re-run the md5 pass three times. */
  def shingleHashesHof(text: Column, n: Int): Column = {
    require(n <= ShingleC.length, s"n <= ${ShingleC.length} supported")
    val toks = tokens(text)
    val tokHashes = transform(toks, t => hash28(t))
    val hashed = element_at(
      transform(
        array(tokHashes), // bind the hash array once as a lambda var
        th =>
          transform(
            sequence(lit(0), size(th) - n),
            i =>
              (0 until n)
                .map(k => element_at(th, i + k + 1) * ShingleC(k))
                .reduce(_ + _) % ShingleM,
          ),
      ),
      1,
    )
    when(size(toks) < n, array().cast("array<long>"))
      .otherwise(array_distinct(hashed))
  }

  /** Default subword vocabulary for [[subwordCount]]: a hand-written
    * list of common English affixes, digraphs and function words
    * (morpheme knowledge, no external model). Single characters are
    * deliberately absent — the per-char fallback consumes them at the
    * same cost, so listing them would be pure noise. Frozen: the q37
    * oracle embeds the same list as a VALUES table. */
  val SubwordVocab: Seq[String] = Seq(
    "the", "and", "ing", "ion", "tion", "ation", "able", "ible",
    "ness", "ment", "ful", "less", "ous", "ive", "ize", "ise",
    "ate", "ure", "age", "ance", "ence", "ant", "ent", "ism",
    "ist", "ity", "est", "ly", "ed", "er", "or", "ar", "al",
    "ic", "un", "re", "in", "ex", "pre", "pro", "con", "com",
    "de", "dis", "en", "anti", "sub", "inter", "over", "under",
    "out", "up", "of", "to", "as", "is", "it", "on", "an", "at",
    "th", "ch", "sh", "qu", "ck", "ph", "wh", "ea", "ou", "ai",
    "oo", "ee", "st", "tr", "pl",
  )

  /** Vocab-driven subword token count over a whole text column —
    * greedy longest-match-first per lowercased word, per-char
    * fallback (see [[graft.expr.SubwordCount]]). Pure map-side;
    * compiled loop with codegen. */
  def subwordCount(text: Column, vocab: Seq[String] = SubwordVocab): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      graft.expr.SubwordCount(
        org.apache.spark.sql.GraftBridge.toExpr(text),
        vocab))

  /** Load a vocabulary file (one entry per line, blank lines and
    * duplicates dropped, longest-entry cap none) for [[subwordCount]] —
    * the deployment path for real BPE/WordPiece vocab exports. The
    * file is read ONCE on the driver and shipped inside the expression
    * (vocabularies are KBs; they ride the task closure, not a join) —
    * which is exactly why the read is BOUNDED: a path that turns out
    * to be a corpus, not a vocab export, must refuse loudly here, not
    * OOM the driver or bloat every task closure
    * ([[DriverArtifact.collectBounded]]). Real tokenizer vocabs are
    * 30k–256k entries; the default bound leaves generous headroom. */
  def loadVocab(spark: org.apache.spark.sql.SparkSession, path: String,
      maxEntries: Int = 1000000): Seq[String] =
    DriverArtifact.collectBounded(
        spark.read.textFile(path).toDF("line"),
        maxEntries, s"vocabulary file $path")
      .map(_.getString(0).trim).filter(_.nonEmpty).distinct.toSeq

  /** Canonical form for exact-match hygiene ops (decontamination):
    * lowercase, collapse every non-alphanumeric run to one space,
    * trim. Cosmetic edits — case, punctuation, extra whitespace —
    * must not hide an n-gram match (leaked eval questions routinely
    * differ from their source only this way). Map-side regex chain,
    * zero shuffle. */
  def normalizeForMatching(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  // -----------------------------------------------------------------
  // Markup stripping (WET-style text extraction)
  // -----------------------------------------------------------------

  /** Markup-stripping patterns — like the PII tier, restricted to the
    * Java∩RE2 dialect subset (inline `(?is)` flags, lazy `.*?`, `\b`,
    * no backreferences — which is also why script and style blocks
    * get separate patterns instead of `<(script|style)>.*?</\1>`). */
  val scriptBlockPattern = "(?is)<script\\b[^>]*>.*?</script\\s*>"
  val styleBlockPattern = "(?is)<style\\b[^>]*>.*?</style\\s*>"
  val htmlCommentPattern = "(?s)<!--.*?-->"

  /** A tag opens with `<` or `</` followed by a letter or `!`
    * (doctype) — a lone `<` in prose ("a < b") is NOT a tag and
    * survives. The documented tag-soup trade: an unquoted `>` inside
    * an attribute value ends the tag early (every regex-grade
    * extractor shares this; a conformant HTML5 tokenizer is the
    * escalation path, not a regex). */
  val htmlTagPattern = "</?[A-Za-z!][^>]*>"

  /** The entity subset every corpus actually carries; `&amp;` decodes
    * LAST so `&amp;lt;` single-decodes to `&lt;` (never to `<`) —
    * the standard one-pass rule. */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** WET-style text extraction from HTML-ish markup — the step that
    * turns a crawl dump into trainable prose: script/style blocks and
    * comments go first (their CONTENT is not text), remaining tags
    * become spaces, entities decode (after tag removal, so a decoded
    * `<` can never resurrect a tag), and whitespace collapses to
    * single spaces. Pure `regexp_replace`/`replace` chain — map-side,
    * codegen'd, zero shuffle, and DuckDB-replayable from the same
    * pattern constants (q133). The whitespace class is spelled out
    * (`[ \t\n\r\f]`) because Java's `\s` and RE2's disagree on
    * U+000B. */
  def stripMarkup(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(text, scriptBlockPattern, " "),
      styleBlockPattern, " ")
    val noTags = regexp_replace(
      regexp_replace(noBlocks, htmlCommentPattern, " "),
      htmlTagPattern, " ")
    val decoded = htmlEntities.foldLeft(noTags) {
      case (c, (e, r)) => replace(c, lit(e), lit(r))
    }
    trim(regexp_replace(decoded, "[ \\t\\n\\r\\f]+", " "))
  }

  /** Fraction of characters that stripping removed — the markup-density
    * quality signal (a page that is 95% tags is navigation chrome, not
    * prose). Fixed two-op IEEE chain (divide, subtract) mirrored
    * expression-for-expression in the oracle; empty input scores 0. */
  def markupRatio(text: Column): Column =
    when(coalesce(length(text), lit(0)) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        length(stripMarkup(text)).cast("double") / length(text))

  // -----------------------------------------------------------------
  // Sentence segmentation
  // -----------------------------------------------------------------

  /** Sentence boundary: a terminator run `[.!?]+` followed by
    * whitespace (the terminator stays WITH its sentence; "What?!"
    * is one boundary). Java∩RE2 subset like every pattern here.
    * Deliberately rule-based and deterministic — the documented
    * trade is abbreviation splits ("Dr. Smith" breaks): a corpus
    * pipeline needs the same boundaries on every engine and every
    * run more than it needs linguistic nuance. */
  val sentenceBoundaryPattern = "([.!?]+)[ \\t\\n\\r\\f]+"

  /** Rewrite sentence boundaries to newlines — the PREPROCESSOR form
    * (the X117 `segment` pattern): any downstream line-grain op
    * (Corpus.dedupLines, line hashing) becomes a sentence-grain op
    * unchanged. Pre-existing newlines already read as line breaks
    * downstream, which is the coherent contract (a hard break is a
    * sentence break). Map-side, zero shuffle, q136-replayable. */
  def sentencesToLines(text: Column): Column =
    regexp_replace(text, sentenceBoundaryPattern, "$1\n")

  /** The sentence array itself (empties from terminator-at-end or
    * consecutive breaks dropped). */
  def sentences(text: Column): Column =
    filter(split(sentencesToLines(text), "\n"), s => length(s) > 0)

  /** PII redaction patterns, restricted ON PURPOSE to the regex
    * subset Java (Spark) and RE2 (DuckDB) execute identically, so
    * the whole scrub chain is oracle-replayable (q132):
    *   - no lookaround (RE2 has none) — word boundaries are CONSUMED
    *     capture groups `(\A|[^\w.])` / `([^\w.]|\z)` instead;
    *   - no bare `\s` in classes (Java's includes U+000B, RE2's does
    *     not) — the separator class spells its members out;
    *   - `\A`/`\z`, `\b`, `\d`, `\w` (all ASCII) and greedy
    *     quantifiers mean the same thing in both dialects, and both
    *     replace leftmost-first, scanning on from the end of each
    *     match.
    * The phone tier: 7–15 digits, optional `+`, each gap at most two
    * separator chars (covers `") "` after an area code); plain long
    * digit ids match by intent — ids are PII-adjacent. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phonePattern =
    "(\\A|[^\\w.])(\\+?\\d(?:[ \\t\\n\\r\\f().-]{0,2}\\d){6,14})([^\\w.]|\\z)"

  /** PII redaction for training corpora — the standard pre-training
    * scrub: emails, phone-number-shaped digit runs, and IPv4 literals
    * are replaced with typed placeholder tokens (so downstream token
    * statistics stay stable and the redaction is auditable by
    * counting placeholders). Pure `regexp_replace` chain — map-side,
    * codegen'd, zero shuffle. Patterns are deliberately conservative
    * (precision over recall): a corpus scrubber that eats prose is
    * worse than one that misses an exotic phone format.
    *
    * The phone pass runs TWICE: its boundaries are consumed capture
    * groups (see [[phonePattern]]), so when two phones are separated
    * by a single boundary char the first match consumes it and hides
    * the second from that pass — the placeholder's `]` then serves as
    * the boundary on the next pass. Both engines scan-continue the
    * same way, so the two-pass result is still a bit-exact mirror
    * (q132; longer adjacency chains than two are out of scope and
    * spec-documented). */
  def redactPii(text: Column): Column = {
    def phone(c: Column): Column =
      regexp_replace(c, phonePattern, "$1[PHONE]$3")
    phone(phone(
      regexp_replace(
        regexp_replace(text, emailPattern, "[EMAIL]"),
        ipv4Pattern, "[IP]")))
  }

  /** Production-speed 64-bit hash (no cross-engine mirror). */
  def hash64(s: Column): Column = xxhash64(s)

  /** Whole-document fingerprint: 60-bit content hash of the exact text.
    * Equal fingerprint ⇔ equal text (mod 2^-60 collisions). */
  def fingerprint(text: Column): Column = hash60(text)

  /** Head fingerprint: hash of the first k tokens — a cheap near-dup
    * blocking key (documents that share a long prefix collide). */
  def headFingerprint(text: Column, k: Int): Column =
    hash60(array_join(slice(tokens(text), 1, k), " "))

  // -----------------------------------------------------------------
  // Language ID (n-gram/stopword heuristic)
  // -----------------------------------------------------------------

  /** Tiny per-language stopword lists (public common function words).
    * A real system would use char-n-gram profiles; the *shape* is the
    * same: per-language evidence ratio, argmax — all map-side. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "les"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "you", "ta", "zhe", "men", "hao"),
  )

  /** Fraction of tokens that are stopwords of `lang` (0 when empty). */
  def stopwordRatio(toks: Column, lang: String): Column = {
    val hits = size(filter(toks, t => t.isInCollection(stopwords(lang))))
    hits.cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  /** Heuristic language guess: argmax stopword ratio with a fixed
    * precedence order (en,es,de,fr,zh) for ties; "und" (undetermined)
    * when no stopword hits at all. Deterministic by construction. */
  def langGuess(toks: Column): Column = {
    val order = Seq("en", "es", "de", "fr", "zh")
    val ratios = order.map(l => l -> stopwordRatio(toks, l))
    val best = ratios.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = ratios.foldRight(lit("und")) { case ((l, r), els) =>
      when(r === best && best > 0.0, lit(l)).otherwise(els)
    }
    // foldRight gives the FIRST match in precedence order priority:
    // en's `when` wraps outermost.
    pick
  }

  // -----------------------------------------------------------------
  // Quality scoring
  // -----------------------------------------------------------------

  /** Fraction of characters that are ASCII letters or spaces. */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Mean token length in characters (0 for empty docs). */
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Gopher-style keep/drop flag: token-count window, mean-word-length
    * window, and alpha-ratio floor. Pure boolean algebra over exact
    * counts → bit-stable across engines. */
  /** Sliding-window DOCUMENT CHUNKING — the long-doc splitting op
    * (RAG indexing, context-length-bounded training rows): each doc
    * yields chunks of up to `chunkTokens` whitespace tokens starting
    * every `strideTokens` (stride < chunk ⟹ overlapping chunks).
    * Chunk starts run 0, stride, 2·stride, … until the remaining
    * tail fits in one chunk — every token lands in at least one
    * chunk, short docs yield exactly one.
    *
    * Shape: the token array never explodes to rows — chunk starts
    * come from one `sequence` per doc (#chunks values, not #tokens)
    * and each chunk is a `slice` + `array_join` on the doc's own
    * array. Map-side only: no shuffle, no window, no join; at 100 TB
    * this is a pure projection pipelined into whatever reads it.
    * Output: (idCol, chunk_id [0-based], chunk_pos [start token],
    * textCol, n_tokens). */
  def chunkDocs(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      strideTokens: Int,
  ): org.apache.spark.sql.DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(strideTokens >= 1 && strideTokens <= chunkTokens,
      s"strideTokens must be in [1, chunkTokens], got $strideTokens")
    val toks = split(coalesce(col(textCol), lit("")), " ")
    // last start K·stride: smallest K with K·stride + chunk >= n,
    // i.e. K = ceil(max(n - chunk, 0) / stride)
    val lastK = ceil(
      greatest(size(toks) - chunkTokens, lit(0)).cast("double") / strideTokens)
      .cast("int")
    docs
      .select(col(idCol), toks.as("graft_toks_"), lastK.as("graft_lastk_"))
      .select(col(idCol), col("graft_toks_"),
        explode(sequence(lit(0), col("graft_lastk_"))).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        (col("chunk_id") * strideTokens).as("chunk_pos"),
        array_join(
          slice(col("graft_toks_"), col("chunk_id") * strideTokens + 1,
            lit(chunkTokens)), " ").as(textCol),
        least(
          size(col("graft_toks_")) - col("chunk_id") * strideTokens,
          lit(chunkTokens)).as("n_tokens"))
  }

  def qualityKeep(
      text: Column,
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      minMeanLen: Double = 2.0,
      maxMeanLen: Double = 12.0,
      minAlpha: Double = 0.6,
  ): Column = {
    val tc = tokenCount(text)
    tc.geq(minTokens) && tc.leq(maxTokens) &&
    meanTokenLen(text).geq(minMeanLen) && meanTokenLen(text).leq(maxMeanLen) &&
    alphaRatio(text).geq(minAlpha)
  }
}
