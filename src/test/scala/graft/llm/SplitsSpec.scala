package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("leakageSafeSplit keeps near-dup clusters on one side of every cut") {
    val docs = spark.range(200).toDF("doc_id")
    val naive = Splits.withSplit(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the per-doc rule provably leaks on this corpus: find an id pair
    // the naive assignment separates (exists by proportion: ~10% of
    // 200 ids land off-train)
    val offTrain = naive.collect { case (id, s) if s != "train" => id }.toSeq.sorted
    assert(offTrain.nonEmpty)
    val b = offTrain.head
    val a = naive.collect { case (id, "train") => id }.min
    // near-dup edges: the leaky pair (a,b), plus a 3-chain, plus
    // isolated docs (everything else)
    val pairs = Seq((a, b), (100L, 101L), (101L, 102L)).toDF("id_a", "id_b")
    val out = Splits.leakageSafeSplit(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // the pair lands together, on the min-id member's naive split
    assert(out(a) == out(b))
    assert(out(a)._2 == naive(math.min(a, b)))
    // the transitive chain shares one key and one split
    assert(out(100L) == out(101L) && out(101L) == out(102L))
    assert(out(100L)._1 == 100L)
    // isolated docs are untouched: exact refinement of withSplit
    docs.collect().map(_.getLong(0))
      .filterNot(Set(a, b, 100L, 101L, 102L))
      .foreach { id => assert(out(id) == ((id, naive(id))), s"doc $id moved") }
  }

  test("split is total, stable across runs, and roughly proportioned") {
    val df = spark.range(10000).toDF("id")
    val a = Splits.withSplit(df, "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Splits.withSplit(df, "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b) // deterministic
    assert(a.values.sum == 10000)
    assert(math.abs(a("train") - 9000) < 300, a.toString) // hash-uniformity
    assert(math.abs(a("val") - 500) < 150 && math.abs(a("test") - 500) < 150, a)
  }

  test("different salts give independent splits; same salt identical") {
    val df = spark.range(2000).toDF("id")
    val s1 = Splits.withSplit(df, "id", salt = "a").select("id", "split")
      .as[(Long, String)].collect().toMap
    val s1b = Splits.withSplit(df, "id", salt = "a").select("id", "split")
      .as[(Long, String)].collect().toMap
    val s2 = Splits.withSplit(df, "id", salt = "b").select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(s1 == s1b)
    val agree = s1.count { case (k, v) => s2(k) == v }.toDouble / s1.size
    assert(agree < 0.95, s"salted splits should differ: agreement $agree")
  }

  test("stratifiedSample: per-stratum rates, deterministic membership") {
    val df = spark.range(4000)
      .withColumn("lang", when($"id" % 2 === 0, "en").otherwise("fr"))
      .withColumnRenamed("id", "doc_id")
    val s1 = Splits.stratifiedSample(df, "doc_id", "lang", Map("en" -> 0.1), 0.9)
    val s2 = Splits.stratifiedSample(df, "doc_id", "lang", Map("en" -> 0.1), 0.9)
    val c = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(c("en") - 200) < 80, c.toString)   // 10% of 2000
    assert(math.abs(c("fr") - 1800) < 120, c.toString) // 90% of 2000
    assert(s1.collect().map(_.getLong(0)).toSet == s2.collect().map(_.getLong(0)).toSet)
  }

  test("weights normalize and honor order") {
    val df = spark.range(5000).toDF("id")
    val counts = Splits.withSplit(df, "id", weights = Seq("x" -> 3.0, "y" -> 1.0))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("x") - 3750) < 200, counts.toString)
  }

  test("tokenBudgetSample fills each group's budget to bucket granularity") {
    // 3 langs × 400 docs of 5 tokens each = 2000 tokens per lang
    val docs = spark.range(1200)
      .select($"id".as("doc_id"),
        element_at(array(lit("en"), lit("fr"), lit("xx")), ($"id" % 3 + 1).cast("int")).as("lang"),
        lit("t1 t2 t3 t4 t5").as("text"))
    val out = Splits.tokenBudgetSample(docs, "doc_id", "text", "lang",
      budgets = Map("en" -> 600L, "fr" -> 99999L))
    val kept = out.groupBy("lang").agg(sum(size(split($"text", " "))).as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // en: filled to AT LEAST the budget, within one bucket's overshoot
    // (5-token docs → the boundary bucket adds a handful of tokens)
    assert(kept("en") >= 600L && kept("en") < 600L + 100L, kept.toString)
    // fr: budget exceeds the corpus — whole group kept
    assert(kept("fr") == 2000L, kept.toString)
    // xx: no budget, defaultBudget 0 — dropped entirely
    assert(!kept.contains("xx"), kept.toString)
    // deterministic: same keep set on a re-run
    val again = Splits.tokenBudgetSample(docs, "doc_id", "text", "lang",
      budgets = Map("en" -> 600L, "fr" -> 99999L))
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
    // the schema is untouched (internal columns dropped)
    assert(out.columns.toSeq == docs.columns.toSeq)
  }

  test("tokenBudgetSample treats a NULL group as a real stratum with defaultBudget") {
    val docs = spark.range(300)
      .select($"id".as("doc_id"),
        when($"id" % 3 === 0, lit(null).cast("string")).otherwise(lit("en")).as("lang"),
        lit("t1 t2 t3 t4 t5").as("text"))
    val out = Splits.tokenBudgetSample(docs, "doc_id", "text", "lang",
      budgets = Map("en" -> 99999L), defaultBudget = 100L)
    val kept = out.groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // en: whole group (1000 tokens < budget); NULL group: ~100 tokens
    // at 5/doc → around 20 docs, never zero, never the whole group
    assert(kept(Some("en")) == 200L, kept.toString)
    val nulls = kept.getOrElse(None, 0L)
    assert(nulls > 0L && nulls < 100L,
      s"null stratum must fill defaultBudget, got $nulls docs")
  }

  test("packSequences: gapless offsets, correct chunk spans, partition-count invariant") {
    // 1000 docs with varied token counts spread over many input
    // partitions — the distributed prefix sum must equal the
    // sequential definition regardless of layout
    val docs = spark.range(1000)
      .select($"id".as("doc_id"),
        concat_ws(" ", (0 until 7).map(i => lit(s"t$i")): _*).as("base"))
      .withColumn("text",
        // doc i has 1 + (i % 13) tokens
        expr("concat_ws(' ', slice(split(concat(base, ' ', base), ' '), 1, 1 + doc_id % 13))"))
      .drop("base")
      .repartition(16)
    val out = Splits.packSequences(docs, "doc_id", "text", seqLen = 64)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "offset", "first_seq", "last_seq")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length == 1000)
    // sequential reference
    var off = 0L
    out.foreach { case (id, n, o, fs, ls) =>
      assert(n == 1 + id % 13, s"doc $id token count")
      assert(o == off, s"doc $id offset $o, expected $off — stream has a gap or overlap")
      assert(fs == o / 64 && ls == math.max((o + n - 1) / 64, o / 64), s"doc $id spans")
      off += n
    }
    // some doc must straddle a sequence boundary (first_seq < last_seq)
    assert(out.exists { case (_, _, _, fs, ls) => fs < ls },
      "fixture should contain boundary-spanning docs")
    // identical output from a different partitioning
    val out1 = Splits.packSequences(docs.coalesce(1), "doc_id", "text", seqLen = 64)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "offset", "first_seq", "last_seq")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out1.toSeq == out.toSeq, "layout must not depend on input partitioning")
  }

  test("packedSequenceText round-trips the token stream exactly") {
    val docs = spark.range(200)
      .select($"id".as("doc_id"),
        // doc i: 1 + i%7 copies of its own id-token — recognizable slices
        expr("concat_ws(' ', transform(sequence(0, id % 7), j -> concat('d', id, '_', j)))")
          .as("text"))
      .repartition(8)
    val seqs = Splits.packedSequenceText(docs, "doc_id", "text", seqLen = 32)
      .orderBy("seq_id")
      .select("seq_id", "text", "n_tokens")
      .as[(Long, String, Long)].collect()
    // every sequence is exactly seqLen tokens, except possibly the last
    seqs.dropRight(1).foreach { case (id, _, n) => assert(n == 32, s"seq $id has $n tokens") }
    assert(seqs.last._3 <= 32 && seqs.last._3 > 0)
    // seq ids are dense from 0
    assert(seqs.map(_._1).toSeq == seqs.indices.map(_.toLong))
    // the concatenation of sequences IS the concatenation of docs:
    // nothing dropped, nothing duplicated, split docs reassemble
    val streamFromSeqs = seqs.map(_._2).mkString(" ")
    val streamFromDocs = docs.orderBy("doc_id").select("text").as[String]
      .collect().mkString(" ")
    assert(streamFromSeqs == streamFromDocs, "packed stream must equal the doc stream")
  }

  test("sampleKPerGroup takes exactly min(k, |group|) rows, deterministically") {
    val df = ((1L to 100L).map(i => (i, "big")) ++ Seq((200L, "tiny"), (201L, "tiny")))
      .toDF("doc_id", "source")
    val out = Splits.sampleKPerGroup(df, "doc_id", "source", k = 5, salt = "t")
    val counts = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(counts == Map("big" -> 5L, "tiny" -> 2L))
    // same salt, different partitioning → identical selection
    val again = Splits.sampleKPerGroup(df.repartition(13), "doc_id", "source", k = 5, salt = "t")
      .orderBy("source", "rank").as[(String, Long, Int)].collect().toSeq
    val first = out.orderBy("source", "rank").as[(String, Long, Int)].collect().toSeq
    assert(first == again)
    // a different salt draws a different sample from the big group
    val other = Splits.sampleKPerGroup(df, "doc_id", "source", k = 5, salt = "u")
      .filter($"source" === "big").select("doc_id").as[Long].collect().toSet
    assert(other != first.filter(_._1 == "big").map(_._2).toSet)
  }

  test("repeatFactorSample: floor copies + deterministic fractional epoch, 0 drops") {
    val df = spark.range(10000).toDF("id")
      .withColumn("g", when(col("id") % 3 === 0, "up")
        .when(col("id") % 3 === 1, "down").otherwise("drop"))
    val out = Splits.repeatFactorSample(df, "id", "g",
      Map("up" -> 2.5, "down" -> 0.3, "drop" -> 0.0), defaultFactor = 1.0)
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // up: ~3334 docs × (2 + ~half) ≈ 8335; down: ~30% of 3333; drop: none
    assert(!byG.contains("drop"))
    assert(math.abs(byG("up") - 3334 * 2.5) < 300, byG.toString)
    assert(math.abs(byG("down") - 3333 * 0.3) < 150, byG.toString)
    // epochs are dense per kept doc: 0..copies-1
    val eps = out.filter(col("g") === "up").groupBy("id")
      .agg(sort_array(collect_list(col("epoch"))).as("eps"),
        max(col("epoch")).as("mx"), count(lit(1)).as("n"))
    assert(eps.filter(col("mx") =!= col("n") - 1).count() === 0)
    // integer factors replicate every doc exactly; determinism
    val twice = Splits.repeatFactorSample(df, "id", "g", Map.empty, 2.0)
    assert(twice.count() === 20000L)
    val a = out.orderBy("id", "epoch").collect().toSeq
    val b = Splits.repeatFactorSample(df.repartition(11), "id", "g",
      Map("up" -> 2.5, "down" -> 0.3, "drop" -> 0.0), 1.0)
      .orderBy("id", "epoch").collect().toSeq
    assert(a === b)
    // the appended output column must not silently shadow an existing
    // one: an input already carrying `epoch` is rejected at call time
    val clash = df.withColumn("epoch", lit(0))
    val e = intercept[IllegalArgumentException] {
      Splits.repeatFactorSample(clash, "id", "g", Map.empty, 1.0)
    }
    assert(e.getMessage.contains("epoch"))
  }

  test("deterministicShuffle: a reproducible permutation, seed-keyed, partition-invariant") {
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val once = Splits.deterministicShuffle(docs, seed = "s1")
      .select("doc_id").as[Long].collect().toSeq
    // permutation: same rows, decorrelated order
    assert(once.sorted == (1L to 200L))
    assert(once != (1L to 200L), "seeded order must not be the input order")
    // identical on re-run and under a different input partitioning
    val again = Splits.deterministicShuffle(docs.repartition(13), seed = "s1")
      .select("doc_id").as[Long].collect().toSeq
    assert(once == again, "same seed must give the same global order")
    // a new seed is an independent permutation
    val other = Splits.deterministicShuffle(docs, seed = "s2")
      .select("doc_id").as[Long].collect().toSeq
    assert(other.sorted == (1L to 200L))
    assert(other != once, "different seeds must permute differently")
  }
  test("systematic sample: hand-checked grid picks, heavy rows pick multiply") {
    // weights 3,4,5 / step 5 / offset 5: grid {5, 10} -> rows 2 and 3
    val df = Seq((1L, 3L), (2L, 4L), (3L, 5L)).toDF("id", "w")
    val out = Splits.systematicWeightedSample(df, "w", Seq("id"), step = 5L,
        offset = 5L)
      .select("id", "picks").as[(Long, Long)].collect().toMap
    assert(out == Map(2L -> 1L, 3L -> 1L), out.toString)

    // one row heavier than the step straddles two grid points
    val heavy = Seq((1L, 12L)).toDF("id", "w")
    val h = Splits.systematicWeightedSample(heavy, "w", Seq("id"), 5L, 5L)
      .select("picks").as[Long].collect()
    assert(h.toSeq == Seq(2L))
  }

  test("systematic sample: exact totals, per-row proportionality, offset rotation") {
    val df = (1 to 300).map(i => (i.toLong, (i * 7 % 23 + 1).toLong)).toDF("id", "w")
    val total = df.agg(sum("w")).head().getLong(0)
    val step = 50L
    for (offset <- Seq(1L, 17L, 50L)) {
      val s = Splits.systematicWeightedSample(df, "w", Seq("id"), step, offset)
      val picks = s.agg(sum("picks")).head().getLong(0)
      val expected = if (total >= offset) (total - offset) / step + 1 else 0L
      assert(picks == expected, s"offset $offset: $picks vs $expected")
      // each row within 1 of its proportional share
      s.select("w", "picks").as[(Long, Long)].collect().foreach { case (w, p) =>
        assert(math.abs(p - w.toDouble / step) <= 1.0, s"w=$w picks=$p")
      }
    }
    // different offsets rotate the selection (not identical sets)
    val a = Splits.systematicWeightedSample(df, "w", Seq("id"), step, 1L)
      .select("id").as[Long].collect().toSet
    val b = Splits.systematicWeightedSample(df, "w", Seq("id"), step, 26L)
      .select("id").as[Long].collect().toSet
    assert(a != b, "offset is the seed; rotation must move the grid")
    // and the draw is a pure function: same args, same rows
    val a2 = Splits.systematicWeightedSample(df, "w", Seq("id"), step, 1L)
      .select("id").as[Long].collect().toSet
    assert(a == a2)
  }

  test("systematic sample: zero-mass rows drop, guards hold") {
    val df = Seq((1L, 0L), (2L, -3L), (3L, 10L)).toDF("id", "w")
    val out = Splits.systematicWeightedSample(df, "w", Seq("id"), 4L, 1L)
      .select("id").as[Long].collect()
    assert(out.toSet == Set(3L))
    intercept[IllegalArgumentException] {
      Splits.systematicWeightedSample(df, "w", Seq("id"), 0L)
    }
    intercept[IllegalArgumentException] {
      Splits.systematicWeightedSample(df, "w", Seq("id"), 5L, offset = 6L)
    }
    // a double mass column would truncate silently — refused instead
    val dbl = Seq((1L, 2.5)).toDF("id", "w")
    intercept[IllegalArgumentException] {
      Splits.systematicWeightedSample(dbl, "w", Seq("id"), 4L)
    }
  }

  test("weightedPrioritySample: deterministic, weight-biased, exact edges") {
    val df = (1L to 200L).map(i => (i, if (i <= 20) 50L else 1L))
      .toDF("doc_id", "w")
    // deterministic: same (data, salt) → same set, twice
    val s1 = Splits.weightedPrioritySample(df, "doc_id", "w", k = 30)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Splits.weightedPrioritySample(df, "doc_id", "w", k = 30)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2 && s1.size == 30)
    // Efraimidis–Spirakis bias: across salts, the 50×-weighted tenth
    // is picked far above its uniform share
    val heavyRate = (0 until 8).map { s =>
      val got = Splits.weightedPrioritySample(df, "doc_id", "w", k = 30,
        salt = s"s$s").select("doc_id").as[Long].collect()
      got.count(_ <= 20).toDouble / 30.0
    }.sum / 8
    // uniform share would be 10%; with 50× weight expect well over 30%
    assert(heavyRate > 0.3, s"heavy rows under-sampled: $heavyRate")
    // k >= survivors returns every positive-weight row; nonpositive drop
    val edge = Seq((1L, 5L), (2L, 0L), (3L, -4L), (4L, 2L))
      .toDF("doc_id", "w")
    val all = Splits.weightedPrioritySample(edge, "doc_id", "w", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(all == Set(1L, 4L))
    intercept[IllegalArgumentException] {
      Splits.weightedPrioritySample(edge, "doc_id", "w", k = 0)
    }
  }

  test("weightedSamplePerGroup: k per stratum, short strata unpadded") {
    val df = ((1L to 100L).map(i => (i, "a", 1L)) ++
      (101L to 104L).map(i => (i, "b", 1L)) ++
      Seq((200L, "c", 0L))) // c has NO positive-weight rows
      .toDF("doc_id", "g", "w")
    val got = Splits.weightedSamplePerGroup(df, "doc_id", "w", "g", kPerGroup = 10)
      .select("g", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.length).toMap
    assert(got("a") == 10, s"full stratum must serve k: $got")
    assert(got("b") == 4, "short stratum returns what it has")
    assert(!got.contains("c"), "zero-weight stratum returns nothing")
    // deterministic
    val twice = Splits.weightedSamplePerGroup(df, "doc_id", "w", "g", 10)
      .select("doc_id").as[Long].collect().toSet
    val again = Splits.weightedSamplePerGroup(df, "doc_id", "w", "g", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(twice == again)
  }

  test("isqrt: exact at perfect squares, their neighbors, and the 2^53 boundary") {
    // k²−1 must floor to k−1; k² and k²+1 to k — including the largest
    // k whose square still fits the 53-bit caller guard
    val ks = Seq(1L, 2L, 5L, 1000L, 1000003L, 94906265L)
    val xs = ks.flatMap(k => Seq(k * k - 1, k * k, k * k + 1)) :+ 0L
    val got = xs.toDF("x").select(Splits.isqrt($"x").as("s"))
      .as[Long].collect().toSeq
    val want = xs.map(x => math.sqrt(x.toDouble).toLong match {
      case s if s * s > x => s - 1
      case s if (s + 1) * (s + 1) <= x => s + 1
      case s => s
    })
    assert(got == want, xs.zip(got).zip(want).toString)
    // and they really are integer roots
    for ((x, s) <- xs.zip(got)) assert(s * s <= x && (s + 1) * (s + 1) > x || x == 0 && s == 0)
  }

  test("temperatureSample: group mass ∝ √n — picks follow the α=½ share") {
    // n = 100 vs 400: raw share 1:4, √-share 1:2
    val df = ((1L to 100L).map(i => (i, "small")) ++
      (101L to 500L).map(i => (i, "big"))).toDF("doc_id", "src")
    val out = Splits.temperatureSample(df, "doc_id", "src", step = 1000000000L)
    val picks = out.groupBy("src").agg(sum("picks")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // masses: small 100·(1e6·10000/100)=1e10, big 400·(1e6·20000/400)=2e10
    // → 30 grid points split 10/20 (±1 for grid phase)
    assert(math.abs(picks("small") - 10L) <= 1, picks.toString)
    assert(math.abs(picks("big") - 20L) <= 1, picks.toString)
    // exact per-doc weights from the closed form
    val w = out.select("src", "mix_weight").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w == Map("small" -> 100000000L, "big" -> 50000000L), w.toString)
  }

  test("temperatureSample: deterministic, repartition-invariant, reserved-column guard") {
    val df = ((1L to 50L).map(i => (i, "a")) ++ (51L to 250L).map(i => (i, "b")))
      .toDF("doc_id", "src")
    val a = Splits.temperatureSample(df, "doc_id", "src", step = 500000000L)
      .select("doc_id", "picks").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Splits.temperatureSample(df.repartition(9), "doc_id", "src", step = 500000000L)
      .select("doc_id", "picks").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
    intercept[IllegalArgumentException] {
      Splits.temperatureSample(df.withColumn("mix_weight", lit(1L)),
        "doc_id", "src", step = 10L)
    }
  }
}
