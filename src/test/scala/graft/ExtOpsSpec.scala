package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Quantize, Sampling, Similarity}

/** Round-5 extension operators: chunk dedup, contamination, weighted
  * sampling, PQ, semantic dedup. */
class ExtOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("chunkDupStats flags docs whose chunks repeat corpus-wide") {
    val docs = Seq(
      (1L, "a b c d e f g h"), // 2 chunks, both shared with doc 2
      (2L, "a b c d e f g h"),
      (3L, "p q r s t u v w")) // 2 chunks, unique
      .toDF("doc_id", "text")
    val out = Dedup.chunkDupStats(docs, "text", "doc_id", chunkSize = 4,
        maxDupRatio = 0.5)
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("dup_chunks")).toSeq === Seq(2L, 2L, 0L))
    assert(out.map(_.getAs[Boolean]("keep")).toSeq === Seq(false, false, true))
  }

  test("duplicatedSpans: cross-doc spans merge; same-doc repetition ignored; removal cuts exactly") {
    val docs = Seq(
      (1L, "a b c d e x1 x2 x3 x4 x5"),          // shares "a b c d e" with 2
      (2L, "y1 y2 a b c d e y3 y4 y5"),
      (3L, "z1 z2 m1 m2 m3 m4 m5 m6 z3"),        // shares 6-token run with 4:
      (4L, "m1 m2 m3 m4 m5 m6 z4 z5"),           //   two 5-windows merge
      (5L, "u1 u2 u3 u4 u5 u1 u2 u3 u4 u5"))     // repeats only WITHIN itself
      .toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "text", "doc_id", k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(spans === Map(
      1L -> ((0L, 5L)), 2L -> ((2L, 7L)),
      3L -> ((2L, 8L)), 4L -> ((0L, 6L))))      // doc 5 absent: nd = 1
    val cleaned = Dedup.removeDuplicatedSpans(docs, "text", "doc_id", k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(cleaned(1L) === (("x1 x2 x3 x4 x5", 10L, 5L)))
    assert(cleaned(2L) === (("y1 y2 y3 y4 y5", 10L, 5L)))
    assert(cleaned(3L) === (("z1 z2 z3", 9L, 6L)))
    assert(cleaned(4L) === (("z4 z5", 8L, 6L)))
    assert(cleaned(5L) === (("u1 u2 u3 u4 u5 u1 u2 u3 u4 u5", 10L, 0L)))
  }

  test("selfRepeatedSpans: later in-doc occurrences trimmed, first kept, cross-doc ignored") {
    val docs = Seq(
      // "u1..u5" repeats at pos 5: window pos5 is occurrence 2 → [5,10)
      (1L, "u1 u2 u3 u4 u5 u1 u2 u3 u4 u5"),
      // pure stutter: every window after pos0 re-hits "a a a a a" → [1,6)
      (2L, "a a a a a a"),
      // no in-doc repeat, even though it shares a 5-gram with doc 4 —
      // cross-doc sharing is duplicatedSpans' business, not this one's
      (3L, "s1 s2 s3 s4 s5 t1"),
      (4L, "s1 s2 s3 s4 s5 t2"))
      .toDF("doc_id", "text")
    val spans = Dedup.selfRepeatedSpans(docs, "text", "doc_id", k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(spans === Map(1L -> ((5L, 10L)), 2L -> ((1L, 6L))))
    val out = Dedup.trimSelfRepeats(docs, "text", "doc_id", k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(3))).toMap
    assert(out(1L) === (("u1 u2 u3 u4 u5", 5L)))
    assert(out(2L) === (("a", 5L)))
    assert(out(3L) === (("s1 s2 s3 s4 s5 t1", 0L)))
    assert(out(4L) === (("s1 s2 s3 s4 s5 t2", 0L)))
  }

  test("gramNovelty: shared and self-repeated windows lower the score, unique text scores 1") {
    val docs = Seq(
      (1L, "a b c d e f"),             // 2 windows, both unique → 1.0
      (2L, "a b c d e z"),             // shares window "a b c d e" with 1
      (3L, "r r r r r r"))             // both windows identical → 0.0
      .toDF("doc_id", "text")
    val out = Dedup.gramNovelty(docs, "text", "doc_id", k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) === ((2L, 1L, 0.5)))  // "b c d e f" unique, "a b c d e" shared
    assert(out(2L) === ((2L, 1L, 0.5)))
    assert(out(3L) === ((2L, 0L, 0.0)))  // self-repeat counts against novelty
  }

  test("ngramContamination flags only train docs sharing a test n-gram") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),  // test doc (id % 2 == 0)
      (1L, "zzz alpha beta gamma yyy"), // train, shares "alpha beta gamma"
      (3L, "one two three four"))       // train, clean
      .toDF("doc_id", "text")
    val out = Dedup.ngramContamination(docs, "text", "doc_id",
      col("doc_id") % 2 === 0, n = 3).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("id") === 1L)
    assert(out.head.getAs[Long]("n_shared") === 1L)
  }

  test("cluster-keyed split: near-dup cluster members never straddle splits") {
    // crafted clusters: {1,2,3} chained near-dups, {10,11}, singletons 20/21
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val comp = graft.ext.Graph.connectedComponents(edges, "id_a", "id_b")
      .withColumnRenamed("id", "doc_id")
    val split = docs.join(comp, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split", Sampling.deterministicSplit(col("cluster_id"),
        Seq("train" -> 80, "valid" -> 90, "test" -> 100)))
    // the leakage guarantee: each cluster maps to exactly ONE split
    val straddling = split.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddling === 0L)
    // members of the same cluster share the split label of the cluster id
    val bySplit = split.select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    assert(bySplit(1L) === bySplit(2L) && bySplit(2L) === bySplit(3L))
    assert(bySplit(10L) === bySplit(11L))
  }

  test("esKey is deterministic and weight-monotone for a fixed id") {
    val df = Seq((7L, 1.0), (7L, 10.0)).toDF("id", "w")
      .withColumn("k", Sampling.esKey(col("id"), col("w")))
    val ks = df.select("k").as[Double].collect()
    assert(ks.forall(k => k < 0.0)) // ln(u) < 0
    assert(ks(1) > ks(0), "larger weight must yield larger ES key")
    val again = df.select("k").as[Double].collect()
    assert(ks.toSeq === again.toSeq)
  }

  test("pqCodes encodes a vector sitting on a centroid with zero error") {
    // two labels; all vectors of a label identical => label mean == vector
    val emb = Seq(
      (1L, Array.fill(8)(1.0f), 0),
      (2L, Array.fill(8)(1.0f), 0),
      (3L, Array.fill(8)(-1.0f), 1),
      (4L, Array.fill(8)(-1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = Similarity.centroids(emb, "label", 8)
    val out = Quantize.pqCodes(emb, cents, m = 2, dim = 8)
      .orderBy("id").collect()
    assert(out.map(_.getAs[Int]("code0")).toSeq === Seq(0, 0, 1, 1))
    assert(out.map(_.getAs[Int]("code1")).toSeq === Seq(0, 0, 1, 1))
    assert(out.forall(_.getAs[Double]("recon_mse") === 0.0))
  }

  test("semanticDedup flags the higher id of a within-cell near-dup pair") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0), // exact dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1)) // other cell
      .toDF("vec_id", "embedding", "label")
    val cents = Similarity.centroids(emb, "label", 4)
    val out = Similarity.semanticDedup(emb, cents, threshold = 0.9).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("vec_id") === 2L)
    assert(out.head.getAs[Long]("dup_of") === 1L)
    assert(out.head.getAs[Double]("max_cos") > 0.99)
  }

  test("incrementalExactDedup drops index dups and within-batch dups") {
    val history = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val index = Dedup.survivorFingerprints(history, "text").distinct()
    val batch = Seq(
      (10L, "alpha beta"),   // dup of history doc 1 → dropped by anti join
      (11L, "epsilon zeta"), // new → kept
      (12L, "epsilon zeta"), // within-batch dup of 11 → dropped (higher id)
      (13L, "Alpha   Beta")) // normalization catches case/whitespace → dropped
      .toDF("doc_id", "text")
    val out = Dedup.incrementalExactDedup(batch, "text", "doc_id", index)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out === Seq(11L))
    // the index delta is exactly the survivors' fingerprints
    assert(Dedup.survivorFingerprints(
      Dedup.incrementalExactDedup(batch, "text", "doc_id", index), "text")
      .count() === 1)
  }

  test("mixWeights: q sums to 1 and temperature compresses toward uniform") {
    val df = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).toDF("src")
    val m = Sampling.mixWeights(df, Seq("src"), alpha = 0.5)
      .collect().map(r => r.getAs[String]("src") ->
        (r.getAs[Double]("p"), r.getAs[Double]("q"))).toMap
    assert(math.abs(m.values.map(_._2).sum - 1.0) < 1e-12)
    val (pBig, qBig) = m("big")
    val (pSmall, qSmall) = m("small")
    assert(pBig === 0.9 && pSmall === 0.1)
    // alpha<1 moves mass from the dominant group to the rare one
    assert(qBig < pBig && qSmall > pSmall)
    // alpha=1 keeps natural proportions exactly
    val nat = Sampling.mixWeights(df, Seq("src"), alpha = 1.0)
      .collect().map(r => r.getAs[String]("src") -> r.getAs[Double]("q")).toMap
    assert(math.abs(nat("big") - 0.9) < 1e-12 && math.abs(nat("small") - 0.1) < 1e-12)
  }

  test("epochShuffle: valid permutation per epoch, independent across epochs") {
    val df = spark.range(1000).toDF("id")
    val e1 = Sampling.epochShuffle(df, "id", epoch = 1, shards = 8)
    // shards partition the corpus; positions are contiguous 1..n per shard
    val perShard = e1.groupBy("epoch_shard")
      .agg(count(lit(1)).as("n"), min("epoch_pos").as("lo"),
        max("epoch_pos").as("hi"))
      .collect()
    assert(perShard.length === 8)
    perShard.foreach { r =>
      assert(r.getAs[Int]("lo") === 1 &&
        r.getAs[Int]("hi").toLong === r.getAs[Long]("n"))
    }
    assert(e1.count() === 1000)
    // deterministic: recomputing gives the identical assignment
    val again = Sampling.epochShuffle(df, "id", epoch = 1, shards = 8)
      .select("id", "epoch_shard", "epoch_pos").orderBy("id")
    assert(again.collect().toSeq ===
      e1.select("id", "epoch_shard", "epoch_pos").orderBy("id")
        .collect().toSeq)
    // a different epoch is a genuinely different permutation
    val e2 = Sampling.epochShuffle(df, "id", epoch = 2, shards = 8)
    val moved = e1.select(col("id"), col("epoch_shard").as("s1"))
      .join(e2.select(col("id"), col("epoch_shard").as("s2")), "id")
      .filter(col("s1") =!= col("s2")).count()
    assert(moved > 500, s"epoch 2 must reshuffle most rows, moved only $moved")
  }

  test("mixtureOrder: bucketed two-pass rank == plain window rank; prefixes hold q proportions") {
    val df = ((1 to 600).map(i => (i.toLong, "big")) ++
      (601 to 800).map(i => (i.toLong, "small"))).toDF("id", "src")
    val out = Sampling.mixtureOrder(df, "src", "id", alpha = 1.0, epoch = 3)
    // the scalable rank must equal the plain per-source window rank
    val plain = df
      .withColumn("r", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy("src")
        .orderBy(Sampling.epochKey(col("id"), 3), col("id"))))
    val mismatches = out.select(col("id"), col("src_rank"))
      .join(plain.select(col("id"), col("r")), "id")
      .filter(col("src_rank") =!= col("r")).count()
    assert(mismatches === 0, "bucketed rank diverged from the window rank")
    // low-discrepancy: every prefix of the stride order holds each source
    // within 1 of its q share (alpha=1 → q = natural proportions .75/.25)
    val ordered = out.orderBy("mix_stride", "src", "id")
      .select("src").collect().map(_.getString(0))
    Seq(40, 100, 400, 800).foreach { l =>
      val nBig = ordered.take(l).count(_ == "big")
      assert(math.abs(nBig - 0.75 * l) <= 1,
        s"prefix $l holds $nBig big vs expected ${0.75 * l}")
    }
  }

  test("mixAllocation: largest-remainder quotas sum exactly to the budget") {
    // alpha=1 keeps natural proportions: p = .5/.3/.2 of budget 7 →
    // raw 3.5/2.1/1.4, base 3/2/1, leftover 1 goes to the largest
    // remainder (a) → 4/2/1
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("src")
    val out = Sampling.mixAllocation(df, Seq("src"), alpha = 1.0, budget = 7L)
      .collect().map(r => r.getAs[String]("src") -> r.getAs[Long]("alloc"))
      .toMap
    assert(out === Map("a" -> 4L, "b" -> 2L, "c" -> 1L))

    // temperature-scaled on skewed data: still sums exactly to budget,
    // and the rare group gets strictly more than its natural share
    val skew = (Seq.fill(970)("big") ++ Seq.fill(30)("rare")).toDF("src")
    val a = Sampling.mixAllocation(skew, Seq("src"), alpha = 0.5,
        budget = 1000L)
      .collect().map(r => r.getAs[String]("src") -> r.getAs[Long]("alloc"))
      .toMap
    assert(a.values.sum === 1000L)
    assert(a("rare") > 30L)
  }

  test("normalizedDedup absorbs case/punct/digit/whitespace variants into " +
    "the lowest-id survivor") {
    val docs = Seq(
      (1L, "release version 2 of the parser"),
      (2L, "Release   Version 7, of the PARSER!!"), // digits+case+punct+ws
      (3L, "release version two of the parser"),    // genuinely different
      (4L, "  release -- version 9 :: of the parser  ")) // another variant
      .toDF("doc_id", "text")
    val got = Dedup.normalizedDedup(docs, "text", "doc_id")
      .select("doc_id", "n_dups").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 3L), (3L, 1L)))
    // and the robust fingerprint is insensitive to each mutation class
    val fps = docs.select(
        graft.ext.TextAnalysis.robustFingerprint(col("text")).as("fp"))
      .as[String].collect()
    assert(fps(0) === fps(1) && fps(1) === fps(3))
    assert(fps(0) !== fps(2))
  }

  test("adaptiveQualityGate cuts each source at its own quantile") {
    import graft.ext.{Curate, TextAnalysis}
    // graded, per-doc-distinct qualities in BOTH sources so the p25
    // cutoff lands strictly between the 2nd and 3rd lowest scores:
    // 'clean' is uniformly better than 'noisy', yet each source must
    // lose exactly its own bottom quartile (a global threshold would
    // instead pass all of clean and gut noisy)
    val clean = (1 to 8).map(i =>
      (i.toLong, "clean",
        ("the quick brown fox jumps over the lazy dog and " * i).trim))
    val noisy = (11 to 18).map(i =>
      (i.toLong, "noisy", ("word " * (i - 10)).trim)) // no stopwords: low q
    val docs = (clean ++ noisy).toDF("doc_id", "source", "text")
    val kept = Curate.adaptiveQualityGate(docs, "source", "text", 0.25)
    val bySrc = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // every kept doc clears its OWN source's cutoff
    assert(kept.filter(col("quality") < col("cutoff")).count() === 0L)
    // with 8 distinct scores per source, p25 interpolates between the
    // 2nd and 3rd lowest → each source loses exactly its bottom two
    assert(bySrc === Map("clean" -> 6L, "noisy" -> 6L))
    // cutoffs differ by source (the point of the adaptive form)
    val cuts = kept.select("source", "cutoff").distinct()
      .as[(String, Double)].collect().toMap
    assert(cuts("clean") > cuts("noisy"))
  }

  test("tokenBudgetSelect: quality-ordered prefix, budget never exceeded, " +
    "boundary doc excluded") {
    import graft.ext.TextAnalysis
    // distinct qualities via distinct lengths; tokens per doc known
    val docs = (1 to 12).map(i =>
      (i.toLong, ("the and of to in is word " * i).trim))
      .toDF("doc_id", "text")
    val picked = Sampling.tokenBudgetSelect(docs, "text", "doc_id", 0.25)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val scored = docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"),
        round(TextAnalysis.qualityScore(col("text")) + lit(1e-9), 4)
          .as("q"))
      .as[(Long, Long, Double)].collect()
    val budget = math.floor(0.25 * scored.map(_._2).sum).toLong
    // reference: plain sort + running sum
    val order = scored.sortBy { case (id, _, q) => (-q, id) }
    var cum = 0L
    val want = order.takeWhile { case (_, n, _) =>
      cum += n; cum <= budget }.map(_._1).toSet
    assert(picked.map(_._1).toSet === want)
    assert(picked.map(_._2).sum <= budget, "budget must never be exceeded")
    // cum_tokens is the true running total in quality order
    assert(picked.map(_._3).max === picked.map(_._2).sum)
    // degenerate regimes: full budget selects everything; tiny budget
    // selects at most the single best doc
    assert(Sampling.tokenBudgetSelect(docs, "text", "doc_id", 1.0)
      .count() === 12L)
    val tiny = Sampling.tokenBudgetSelect(docs, "text", "doc_id", 0.01)
    assert(tiny.count() <= 1L)
  }

  test("tokenBudgetSelect: adversarial all-same-quality corpus — fat tie " +
    "blocks range-split on frozen id boundaries, selection unchanged") {
    import graft.ext.TextAnalysis
    // every doc identical quality → ONE 4-dp tie block holds the whole
    // corpus (the skew regime the two-level kernel exists for); a tiny
    // maxBucketRows forces the fat path at test scale
    val same = (1 to 300).map(i => (i.toLong, "the and of to in is word"))
      .toDF("doc_id", "text")
    def ref(docs: org.apache.spark.sql.DataFrame, frac: Double): Set[Long] = {
      val scored = docs.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n"),
          round(TextAnalysis.qualityScore(col("text")) + lit(1e-9), 4)
            .as("q"))
        .as[(Long, Long, Double)].collect()
      val budget = math.floor(frac * scored.map(_._2).sum).toLong
      var cum = 0L
      scored.sortBy(t => (-t._3, t._1)).iterator
        .map { t => cum += t._2; (t._1, cum) }
        .takeWhile(_._2 <= budget).map(_._1).toSet
    }
    for (frac <- Seq(0.25, 0.5, 0.9)) {
      val fatPath = Sampling.tokenBudgetSelect(same, "text", "doc_id",
        frac, maxBucketRows = 32L)
      assert(fatPath.select("doc_id").as[Long].collect().toSet ===
        ref(same, frac), s"fat path diverged at frac=$frac")
      // the split must actually bound the per-window data: with 300 rows
      // and maxBucketRows=32 the plan's window partitions by (_rqi,_sub)
      // over ≥10 sub-ranges, but the OUTPUT is identical to the default
      // (thin) path — the whole exactness claim of the range split
      val thinPath = Sampling.tokenBudgetSelect(same, "text", "doc_id", frac)
        .as[(Long, Long, Long)].collect().toSet
      assert(fatPath.as[(Long, Long, Long)].collect().toSet === thinPath)
    }
    // mixed regime: one fat tie block + thin blocks around it, budget
    // boundary landing INSIDE the fat block's sub-ranges
    val mixed = ((1 to 200).map(i => (i.toLong, "the and of to in is word"))
      ++ (201 to 210).map(i =>
        (i.toLong, ("the and of to in is word " * (i - 199)).trim)))
      .toDF("doc_id", "text")
    for (frac <- Seq(0.3, 0.6)) {
      val got = Sampling.tokenBudgetSelect(mixed, "text", "doc_id",
          frac, maxBucketRows = 16L)
        .select("doc_id").as[Long].collect().toSet
      assert(got === ref(mixed, frac), s"mixed regime diverged at frac=$frac")
    }
    // regression: STRING ids that PARSE as numbers sort lexicographically
    // in the contract order ("100" < "2" < "20" < "9"). The r17 kernel
    // gated these out of the split entirely (a numeric cast would have
    // composed cum_tokens in the wrong order); the r18 kernel range-splits
    // them on frozen STRING boundaries compared with string `>`, so the
    // fat path now ENGAGES here and must still reproduce the exact
    // lexicographic global order
    val numericStrIds = (1 to 300)
      .map(i => ((i * 7919 % 100000).toString, "the and of to in is word"))
      .toDF("doc_id", "text")
    def refStr(docs: org.apache.spark.sql.DataFrame,
               frac: Double): Set[String] = {
      val scored = docs.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n"),
          round(TextAnalysis.qualityScore(col("text")) + lit(1e-9), 4)
            .as("q"))
        .as[(String, Long, Double)].collect()
      val budget = math.floor(frac * scored.map(_._2).sum).toLong
      var cum = 0L
      scored.sortBy(t => (-t._3, t._1)).iterator
        .map { t => cum += t._2; (t._1, cum) }
        .takeWhile(_._2 <= budget).map(_._1).toSet
    }
    for (frac <- Seq(0.25, 0.5)) {
      val got = Sampling.tokenBudgetSelect(numericStrIds, "text", "doc_id",
          frac, maxBucketRows = 32L)
        .select("doc_id").as[String].collect().toSet
      assert(got === refStr(numericStrIds, frac),
        s"numeric-string ids diverged from lexicographic order at frac=$frac")
    }
    // string ids in the REALISTIC shape (hex-hash-like, all one quality
    // value → one fat tie block over the whole corpus): the string-id
    // split must bound the work AND stay exact, including duplicated
    // cum_tokens values, against both the driver reference and the
    // single-range (thin) path
    val hexIds = (1 to 300).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (h, ("the and of to in is word " * (1 + i % 5)).trim)
    }.toDF("doc_id", "text")
    for (frac <- Seq(0.25, 0.6)) {
      val fatStr = Sampling.tokenBudgetSelect(hexIds, "text", "doc_id",
          frac, maxBucketRows = 24L)
        .as[(String, Long, Long)].collect().toSet
      val thinStr = Sampling.tokenBudgetSelect(hexIds, "text", "doc_id", frac)
        .as[(String, Long, Long)].collect().toSet
      assert(fatStr === thinStr,
        s"string-id fat path diverged from single-range path at frac=$frac")
      assert(fatStr.map(_._1) === refStr(hexIds, frac),
        s"string-id fat path diverged from global order at frac=$frac")
    }
    // conf-independence: under spark.sql.legacy.sizeOfNull=true,
    // size(NULL) is -1 — a coalesce-shaped sub-bucket assignment would
    // pass -1 through for every THIN bucket and the offset join (which
    // carries _sub = 0 there) would silently drop those rows. The
    // mixed corpus has both fat and thin tie blocks, so a wrong thin
    // branch changes the selection here.
    // (the legacy conf only takes effect with ANSI off, so flip both —
    // and restore both — to actually drive size(NULL) to -1)
    val ansi0 = spark.conf.get("spark.sql.ansi.enabled")
    val sizeOfNull0 = spark.conf.get("spark.sql.legacy.sizeOfNull")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try {
      val gotLegacy = Sampling.tokenBudgetSelect(mixed, "text", "doc_id",
          0.6, maxBucketRows = 16L)
        .select("doc_id").as[Long].collect().toSet
      assert(gotLegacy === ref(mixed, 0.6),
        "selection must not depend on spark.sql.legacy.sizeOfNull")
    } finally {
      spark.conf.set("spark.sql.legacy.sizeOfNull", sizeOfNull0)
      spark.conf.set("spark.sql.ansi.enabled", ansi0)
    }
  }

  test("shardManifest: bucketed two-pass assignment == reference global " +
    "order; shards contiguous and budget-shaped") {
    import graft.ext.TextAnalysis
    val docs = (1 to 60).map(i =>
      (i.toLong, ("tok " * (1 + i % 17)).trim)).toDF("doc_id", "text")
    val got = Sampling.shardManifest(docs, "text", "doc_id",
        epoch = 3, tokensPerShard = 40L)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // reference: plain sort by the same epoch key + running start offset
    val keyed = docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"),
        Sampling.epochKey(col("doc_id"), 3).as("k"))
      .as[(Long, Long, String)].collect()
    var cum = 0L
    val want = keyed.sortBy(t => (t._3, t._1)).map { case (id, n, _) =>
      val start = cum; cum += n; (id, n, start / 40L)
    }.sortBy(_._1)
    assert(got.toSeq === want.toSeq)
    // shards are contiguous 0..max and every doc appears exactly once
    val shards = got.map(_._3).distinct.sorted
    assert(shards.toSeq === (0L to shards.max).toSeq)
    assert(got.length === 60 && got.map(_._1).distinct.length === 60)
    // greedy start-based budgets: every shard except the last holds at
    // least the budget minus its last doc's spillover
    val perShard = got.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val maxDoc = got.map(_._2).max
    perShard.filterKeys(_ < shards.max).values.foreach(tot =>
      assert(tot >= 40L - maxDoc && tot <= 40L + maxDoc, s"shard total $tot"))
  }

  test("property: bucketed prefix-sum operators equal the plain global-order " +
    "reference on random corpora (tie and bucket-boundary pressure)") {
    import org.scalacheck.Prop.{forAllNoShrink, propBoolean, AnyOperators}
    import org.scalacheck.{Gen, Test => SCTest}
    import graft.ext.TextAnalysis
    // repeated small lengths make quality ties and same-bucket/adjacent-
    // bucket collisions routine — the regime where a wrong bucket edge
    // or tie-break in the two-pass form diverges from the global order
    val docsGen = Gen.choose(5, 40).flatMap(n => Gen.listOfN(n,
      Gen.choose(1, 12))).map(_.zipWithIndex.map { case (k, i) =>
        (i.toLong, ("the and of word w " * k).trim) })
    val fracGen = Gen.oneOf(0.1, 0.25, 0.5, 0.9)
    val prop = forAllNoShrink(docsGen, fracGen) { (rows, frac) =>
      val docs = rows.toDF("doc_id", "text")
      val scored = docs.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n"),
          round(TextAnalysis.qualityScore(col("text")) + lit(1e-9), 4)
            .as("q"),
          Sampling.epochKey(col("doc_id"), 2).as("k"))
        .as[(Long, Long, Double, String)].collect()
      // --- tokenBudgetSelect vs reference prefix
      val budget = math.floor(frac * scored.map(_._2).sum).toLong
      var cum = 0L
      val wantSel = scored.sortBy(t => (-t._3, t._1)).iterator
        .map { t => cum += t._2; (t._1, cum) }
        .takeWhile(_._2 <= budget).map(_._1).toSet
      val gotSel = Sampling.tokenBudgetSelect(docs, "text", "doc_id", frac)
        .select("doc_id").as[Long].collect().toSet
      // --- shardManifest vs reference running offsets
      var off = 0L
      val wantShard = scored.sortBy(t => (t._4, t._1)).map { t =>
        val s = off / 7L; off += t._2; (t._1, s) }.toMap
      val gotShard = Sampling.shardManifest(docs, "text", "doc_id",
          epoch = 2, tokensPerShard = 7L)
        .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
      ("budget selection" |: (gotSel ?= wantSel)) &&
        ("shard assignment" |: (gotShard ?= wantShard))
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: string-id fat-block split is order-preserving for " +
    "ARBITRARY unicode ids (surrogates, PUA, mixed scripts) — fat path " +
    "equals the single-range path exactly") {
    import org.scalacheck.Prop.{forAllNoShrink, propBoolean, AnyOperators}
    import org.scalacheck.{Gen, Test => SCTest}
    // both arms run in-engine, so NO driver reference is needed (a
    // driver sortBy would compare UTF-16 code units and disagree with
    // the engine's UTF8 binary order on non-BMP ids — exactly the trap
    // this property must not fall into): the single-range arm is the
    // trivially correct execution of the same total order, and fat ≡
    // thin IS the order-preservation claim of the sampled boundaries
    val idChar = Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("é", "ß", "中", "ю", "ع"),
      1 -> Gen.oneOf("😀", "🤖"), // non-BMP surrogate pairs
      1 -> Gen.oneOf("", "")) // private-use BMP: AFTER the
      // surrogates in UTF-16 code-unit order, BEFORE them in UTF-8
    val idGen = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, idChar)).map(_.mkString)
    val docsGen = Gen.choose(10, 50).flatMap { n =>
      Gen.listOfN(n, Gen.zip(idGen, Gen.choose(1, 8)))
    }.map(_.zipWithIndex.map { case ((id, k), i) =>
      // suffix with the index so ids stay distinct without disturbing
      // the random prefix that drives the boundary comparisons
      (s"$id#$i", ("the and of word w " * k).trim)
    })
    val fracGen = Gen.oneOf(0.25, 0.5, 0.9)
    val prop = forAllNoShrink(docsGen, fracGen) { (rows, frac) =>
      val docs = rows.toDF("doc_id", "text")
      val fat = Sampling.tokenBudgetSelect(docs, "text", "doc_id", frac,
          maxBucketRows = 4L)
        .as[(String, Long, Long)].collect().toSet
      val thin = Sampling.tokenBudgetSelect(docs, "text", "doc_id", frac)
        .as[(String, Long, Long)].collect().toSet
      "fat split == single range" |: (fat ?= thin)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("upsampleByFactor: deterministic copy counts, factor-weighted " +
    "volumes, downsampling and zero-factor regimes") {
    val docs = (1 to 400).map(i =>
      (i.toLong, if (i <= 200) "rare" else "big", s"text $i"))
      .toDF("doc_id", "source", "text")
    val up = Sampling.upsampleByFactor(docs, "source", "doc_id",
      Map("rare" -> 2.5, "big" -> 0.25))
    val bySrc = up.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // md5-uniform fractional draws: realized volume within a loose
    // binomial envelope of f*n (200*2.5=500, 200*0.25=50)
    assert(bySrc("rare") >= 440 && bySrc("rare") <= 560, bySrc.toString)
    assert(bySrc("big") >= 25 && bySrc("big") <= 80, bySrc.toString)
    // every rare doc appears at least floor(2.5)=2 times; copy_idx dense
    val perDoc = up.filter(col("source") === "rare")
      .groupBy("doc_id").count().as[(Long, Long)].collect()
    assert(perDoc.length === 200 && perDoc.forall(c => c._2 == 2 || c._2 == 3))
    val idx = up.filter(col("source") === "rare")
      .groupBy("doc_id").agg(max("copy_idx").as("m"), count(lit(1)).as("c"))
      .filter(col("m") =!= col("c") - 1).count()
    assert(idx === 0L, "copy_idx must be dense 0..n-1")
    // pure function of identity: a re-run is byte-identical
    val again = Sampling.upsampleByFactor(docs, "source", "doc_id",
      Map("rare" -> 2.5, "big" -> 0.25))
      .select("doc_id", "copy_idx").as[(Long, Long)].collect().sorted.toSeq
    assert(again === up.select("doc_id", "copy_idx")
      .as[(Long, Long)].collect().sorted.toSeq)
    // factor 0 drops the source entirely; unlisted sources default 1.0
    val zeroed = Sampling.upsampleByFactor(docs, "source", "doc_id",
      Map("rare" -> 0.0))
    assert(zeroed.filter(col("source") === "rare").count() === 0L)
    assert(zeroed.filter(col("source") === "big").count() === 200L)
  }

  test("property: normalizedDedup is invariant under random presentation " +
    "mutations (case/punct/digit/whitespace) of pool texts") {
    import org.scalacheck.Prop.{forAllNoShrink, AnyOperators}
    import org.scalacheck.{Gen, Test => SCTest}
    val pool = Seq(
      "release version 2 of the parser today",
      "a different document about number 9 entirely",
      "third text with value 5 inside it",
      "fourth entry mentioning item 3 here")
    // a random presentation mutation: any composition of these must map
    // to the SAME robust fingerprint as the original
    val mutGen: Gen[String => String] = Gen.someOf(Seq[String => String](
      _.toUpperCase,
      s => s"  $s  ",
      _.replace(" ", "   "),
      s => s + " !!!",
      s => s.replace(",", "").replace("2", "7").replace("9", "4")
        .replace("5", "0").replace("3", "8"),
      _.replace(" ", " -- "))).map(fs => fs.foldLeft(identity[String] _)(_ andThen _))
    val rowsGen = Gen.choose(4, 16).flatMap(n => Gen.listOfN(n, for {
      ti <- Gen.choose(0, pool.size - 1)
      mut <- mutGen
    } yield (ti, mut)))
    val prop = forAllNoShrink(rowsGen) { picks =>
      val rows = picks.zipWithIndex.map { case ((ti, mut), i) =>
        (i.toLong, ti.toLong, mut(pool(ti)))
      }
      val got = graft.ext.Dedup
        .normalizedDedup(rows.toDF("doc_id", "pool_id", "text"),
          "text", "doc_id")
        .select("pool_id", "n_dups").as[(Long, Long)].collect()
      val wantCounts = picks.groupBy(_._1)
        .map { case (ti, ps) => ti.toLong -> ps.size.toLong }
      ("one survivor per pool text" |:
        (got.map(_._1).sorted.toSeq ?= wantCounts.keys.toSeq.sorted)) &&
        ("dup counts" |: (got.map(t => t._1 -> t._2).toMap ?= wantCounts))
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: upsampleByFactor copy counts are floor/ceil of the factor " +
    "and deterministic under random factor maps") {
    import org.scalacheck.Prop.{forAllNoShrink, propBoolean, AnyOperators}
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val srcs = Seq("s0", "s1", "s2")
    val factorsGen = Gen.listOfN(3, Gen.choose(0.0, 3.0))
      .map(fs => srcs.zip(fs.map(f => math.round(f * 100) / 100.0)).toMap)
    val rowsGen = Gen.choose(6, 30).flatMap(n => Gen.listOfN(n,
      Gen.choose(0, 2))).map(_.zipWithIndex.map { case (s, i) =>
        (i.toLong, srcs(s)) })
    val prop = forAllNoShrink(rowsGen, factorsGen) { (rows, factors) =>
      val docs = rows.toDF("doc_id", "source")
      val up = Sampling.upsampleByFactor(docs, "source", "doc_id", factors)
        .select("doc_id", "source", "copy_idx")
        .as[(Long, String, Long)].collect()
      val perDoc = up.groupBy(_._1).view
        .mapValues(_.map(_._3).sorted.toSeq).toMap
      val srcOf = rows.toMap
      val floorCeil = rows.forall { case (id, s) =>
        val f = factors(s)
        val n = perDoc.get(id).map(_.size).getOrElse(0)
        (n == math.floor(f).toInt || n == math.ceil(f).toInt) &&
          perDoc.getOrElse(id, Seq.empty) == (0L until n.toLong)
      }
      val again = Sampling.upsampleByFactor(docs, "source", "doc_id",
          factors).select("doc_id", "copy_idx")
        .as[(Long, Long)].collect().sorted.toSeq
      ("floor/ceil + dense idx" |: Prop(floorCeil)) &&
        ("deterministic" |:
          (again ?= up.map(t => (t._1, t._3)).sorted.toSeq))
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("topKSelect matches the rank-window cut on tie-heavy string payloads") {
    import org.apache.spark.sql.expressions.Window
    // 400 rows over 8 groups; scores collide heavily ((i % 5) only) so
    // the string tie-break decides most of the keep-set — and 16 input
    // partitions force partial buffers through serialize/merge
    val df = (1 to 400).map { i =>
      (i % 8, f"t${i % 40}%03d", (i % 5).toDouble, i.toLong)
    }.toDF("g", "term", "score", "v").repartition(16)
      .groupBy("g", "term").agg(max("score").as("score"), max("v").as("v"))
      .persist()
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("term").asc)
    val win = df.withColumn("r", row_number().over(w)).filter(col("r") <= 3)
      .select("g", "term", "score", "v", "r")
      .collect().map(_.toSeq).toSet
    val agg = df.groupBy("g")
      .agg(graft.functions.TopKSelectFunctions.topKSelect(
        col("score"), col("term"), Seq(col("v")), 3).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("p", "s")))
      .select(col("g"), col("s.payload").as("term"), col("s.score"),
        col("s.c0").as("v"), (col("p") + 1).as("r"))
      .collect().map(_.toSeq).toSet
    df.unpersist()
    assert(agg.nonEmpty && agg === win)
  }

  test("topKSelect ascending keeps the smallest scores (per-source cap shape)") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 300).map(i => (s"src${i % 3}", i.toLong))
      .toDF("source", "doc_id").repartition(8)
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val win = df.withColumn("r", row_number().over(w)).filter(col("r") <= 15)
      .select("source", "doc_id").collect().map(_.toSeq).toSet
    val agg = df.groupBy("source")
      .agg(graft.functions.TopKSelectFunctions.topKSelect(
        md5(col("doc_id").cast("string")), col("doc_id"), Nil, 15,
        scoreDesc = false).as("tk"))
      .select(col("source"), explode(col("tk.payload")).as("doc_id"))
      .collect().map(_.toSeq).toSet
    assert(agg.size === 45 && agg === win)
  }
}
