package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // A raw pool with two dialects: "db" docs share the target's bigram
  // vocabulary, "cook" docs share none of it. DSIR must rank every db
  // doc above every cook doc without ever being told the labels.
  private def corpora = {
    val target = Seq(
      (100L, "select rows from table where key matches index"),
      (101L, "scan table rows by key with index lookup"),
      (102L, "join rows from table on key using index"),
    ).toDF("doc_id", "text")
    val raw = Seq(
      (0L, "select rows from table where key matches index quickly"),
      (1L, "scan table rows by key with index lookup plan"),
      (2L, "whisk eggs with sugar until fluffy then fold flour"),
      (3L, "simmer onions in butter then add cream slowly"),
      (4L, "x"), // single token: zero bigrams, must score 0 and survive
    ).toDF("doc_id", "text")
    (raw, target)
  }

  test("target-like docs outscore off-target docs; featureless doc scores 0") {
    val (raw, target) = corpora
    val w = Dsir.importanceWeights(raw, target)
    val scored = Dsir.scoreDocs(raw, w, Dsir.defaultWeightOf(raw, target))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(scored.keySet == Set(0L, 1L, 2L, 3L, 4L), "every raw doc present")
    assert(scored(4L) == ((0L, 0L)), s"featureless doc: ${scored(4L)}")
    // per-feature mean keeps the comparison length-free
    def mean(id: Long) = scored(id)._2.toDouble / scored(id)._1
    val dbMin = Seq(0L, 1L).map(mean).min
    val cookMax = Seq(2L, 3L).map(mean).max
    assert(dbMin > cookMax,
      s"db docs must outscore cook docs: dbMin $dbMin cookMax $cookMax")
  }

  test("weights are scaled integer ratios: shared bigram above Scale, unseen below") {
    val (raw, target) = corpora
    val w = Dsir.importanceWeights(raw, target).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // a bucket counted in target and raw equally often has ratio ≈
    // (rawTot+B)/(tgtTot+B) adjusted by counts — just pin the ordering:
    // every weight is positive, and some exceed the smoothed default
    // (target-favored) while raw-only buckets sit below it
    val default = Dsir.defaultWeightOf(raw, target)
    assert(w.values.forall(_ > 0L))
    assert(w.values.exists(_ > default), "target-favored buckets exist")
    assert(w.values.exists(_ < default), "raw-only buckets exist")
  }

  test("scoring is partition-count invariant (exact long sums)") {
    val (raw, target) = corpora
    val w = Dsir.importanceWeights(raw, target)
    val d = Dsir.defaultWeightOf(raw, target)
    val a = Dsir.scoreDocs(raw, w, d).orderBy("doc_id").collect().toSeq
    val b = Dsir.scoreDocs(raw.repartition(7), w, d)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("select composes scoring with systematic PPS: proportional, deterministic") {
    val (raw, target) = corpora
    // step = ~1/3 of total mass → ~3 picks, weighted toward db docs
    val total = Dsir.scoreDocs(raw,
        Dsir.importanceWeights(raw, target),
        Dsir.defaultWeightOf(raw, target))
      .agg(sum("score")).head.getLong(0)
    val picked = Dsir.select(raw, target, step = total / 3)
    val rows = picked.select("doc_id", "picks").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.values.sum >= 3L && rows.values.sum <= 4L, rows.toString)
    assert(!rows.contains(4L), "zero-mass doc cannot be picked")
    val again = Dsir.select(raw, target, step = total / 3)
      .select("doc_id", "picks").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == again, "zero randomness: identical re-run")
  }

  test("unseen-bucket default weight applies when scoring docs outside the fit") {
    val (raw, target) = corpora
    val w = Dsir.importanceWeights(raw, target)
    val d = Dsir.defaultWeightOf(raw, target)
    val novel = Seq((9L, "quantum flux capacitor harmonics resonate")).toDF("doc_id", "text")
    val scored = Dsir.scoreDocs(novel, w, d).head
    // 4 bigram occurrences, none fitted → exactly 4·default
    assert(scored.getLong(1) == 4L)
    assert(scored.getLong(2) == 4L * d, s"expected 4·$d, got ${scored.getLong(2)}")
  }
}
