package graft

import org.apache.spark.sql.functions._
import graft.ext.Bpe

/** BPE tokenizer induction: the two learn arms agree merge-for-merge,
  * the greedy rewrite is correct on crafted corpora, and the encode
  * replay reconstructs every word exactly. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("learn: classic abab corpus merges in frequency order with tie-break") {
    // "abab" x3, "abc" x2: pairs ab=8 (2 per abab + 1 per abc), ba=3, bc=2
    val docs = corpus((1L, "abab abab abab abc abc"))
    val m = Bpe.learn(docs, "text", 2)
    // round 1: ab wins (freq 8); round 2 pairs over {ab,ab}/{ab,c}:
    // abab=3, abc=2 -> (ab,ab) wins
    assert(m.mergeList === Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L)))
    val vocab = m.vocab.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(vocab("abab") === Seq("abab"))
    assert(vocab("abc") === Seq("ab", "c"))
    m.release()
  }

  test("greedy left-to-right: overlapping pair aaa merges leftmost first") {
    val docs = corpus((1L, "aaa aaa"))
    val m = Bpe.learn(docs, "text", 1)
    // pairs in "aaa": (a,a) twice per word -> freq 4; greedy rewrite
    // fuses positions 1-2 then cannot reuse the middle 'a': aa|a
    assert(m.mergeList === Seq((1, "a", "a", 4L)))
    val syms = m.vocab.select("syms").as[Seq[String]].collect().head
    assert(syms === Seq("aa", "a"))
    m.release()
  }

  test("learn and learnLocal agree merge-for-merge on a mixed corpus") {
    val docs = corpus(
      (1L, "low low low low low lower lower newest newest"),
      (2L, "newest newest newest newest widest widest widest"))
    val dist = Bpe.learn(docs, "text", 6)
    val (local, localVocab) = Bpe.learnLocal(docs, "text", 6)
    assert(dist.mergeList === local)
    val distVocab = dist.vocab.select("word", "freq", "syms")
      .as[(String, Long, Seq[String])].collect()
      .map { case (w, f, s) => w -> ((f, s)) }.toMap
    assert(distVocab === localVocab)
    dist.release()
  }

  test("learnAuto routes by the vocabulary gate: driver arm under it, " +
    "batched distributed arm over it, identical merge tables") {
    val docs = corpus(
      (1L, "low low low low low lower lower newest newest"),
      (2L, "newest newest newest newest widest widest widest"))
    // vocab (4 words) within the gate → the driver arm's exact table
    val (local, _) = Bpe.learnLocal(docs, "text", 6)
    assert(Bpe.learnAuto(docs, "text", 6) === local)
    // gate forced below the vocab size → the batched distributed arm;
    // batch=1 degenerates to strict learn(), so the facade's fallback
    // is pinned against the strict table too
    val strict = Bpe.learn(docs, "text", 6)
    assert(Bpe.learnAuto(docs, "text", 6, maxVocab = 2, batch = 1) ===
      strict.mergeList)
    val batched = Bpe.learnBatched(docs, "text", 6, batch = 4)
    assert(Bpe.learnAuto(docs, "text", 6, maxVocab = 2, batch = 4) ===
      batched.mergeList)
    strict.release(); batched.release()
  }

  test("learn and learnLocal agree on non-BMP text (surrogate pairs, CJK ties)") {
    // 😀 (U+1F600) is a surrogate pair: a per-code-UNIT local split would
    // make it two symbols and diverge from the distributed arm at round
    // 1. The private-use char  vs 😀 also pins the tie-break
    // order: UTF-16 code-unit order ranks  AFTER the surrogate
    // pair, UTF-8/code-point order (the distributed arm's) BEFORE it.
    val emoji = "😀" // 😀
    val pua = ""
    val docs = corpus(
      (1L, s"${emoji}a ${emoji}a ${pua}a ${pua}a x${emoji} x$pua"))
    val dist = Bpe.learn(docs, "text", 4)
    val (local, localVocab) = Bpe.learnLocal(docs, "text", 4)
    assert(dist.mergeList === local,
      s"arms diverged: ${dist.mergeList} vs $local")
    val distVocab = dist.vocab.select("word", "freq", "syms")
      .as[(String, Long, Seq[String])].collect()
      .map { case (w, f, s) => w -> ((f, s)) }.toMap
    assert(distVocab === localVocab)
    // the surrogate pair stayed ONE symbol end-to-end
    assert(localVocab(s"${emoji}a")._2.forall(_.nonEmpty))
    assert(localVocab.keySet.contains(s"x$emoji"))
    dist.release()
  }

  test("property: learn and learnLocal agree on random small corpora") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    // small alphabets (incl. a surrogate pair) concentrate pair
    // frequencies, exercising the pair-indexed loop's incremental count
    // maintenance and tie-breaking far harder than natural text
    val wordGen = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "😀")).map(_.mkString))
    val corpusGen = Gen.choose(3, 10).flatMap(k => Gen.listOfN(k, wordGen))
    val prop = forAll(corpusGen, Gen.choose(1, 5)) { (words, m) =>
      val docs = corpus((1L, words.mkString(" ")))
      val dist = Bpe.learn(docs, "text", m)
      val (local, localVocab) = Bpe.learnLocal(docs, "text", m)
      val distVocab = dist.vocab.select("word", "freq", "syms")
        .as[(String, Long, Seq[String])].collect()
        .map { case (w, f, s) => w -> ((f, s)) }.toMap
      dist.release()
      dist.mergeList == local && distVocab == localVocab
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("learnBatched: batch=1 degenerates to learn exactly; disjoint " +
    "corpora agree at any batch; the cut rule preserves strict order " +
    "through conflicts") {
    // mixed natural corpus: batch=1 must be the SAME algorithm
    val docs = corpus(
      (1L, "low low low low low lower lower newest newest"),
      (2L, "newest newest newest newest widest widest widest"))
    val strict = Bpe.learn(docs, "text", 6)
    val b1 = Bpe.learnBatched(docs, "text", 6, batch = 1)
    assert(b1.mergeList === strict.mergeList)
    val v = (m: Bpe.BpeModel) => m.vocab.select("word", "freq", "syms")
      .as[(String, Long, Seq[String])].collect().toSet
    assert(v(b1) === v(strict))
    strict.release(); b1.release()
    // symbol-disjoint alphabets with descending freqs: one round of
    // batch=3 applies all three merges, in the strict order, and the
    // table equals the strict arm's merge-for-merge (no creations can
    // outrank: 2-symbol words vanish into single symbols)
    val disjoint = corpus((1L,
      (Seq.fill(5)("ab") ++ Seq.fill(4)("cd") ++ Seq.fill(3)("ef"))
        .mkString(" ")))
    val sD = Bpe.learn(disjoint, "text", 3)
    val bD = Bpe.learnBatched(disjoint, "text", 3, batch = 3)
    assert(bD.mergeList === sD.mergeList)
    assert(bD.mergeList === Seq(
      (1, "a", "b", 5L), (2, "c", "d", 4L), (3, "e", "f", 3L)))
    sD.release(); bD.release()
    // conflict chain: (a,b) 5, (b,c) 4, (c,d) 3 all share symbols — the
    // cut rule forces one merge per round and the result must STILL be
    // the strict sequence (a skip rule would have jumped (c,d) over
    // (b,c) in round 1)
    val chain = corpus((1L,
      (Seq.fill(5)("ab") ++ Seq.fill(4)("bc") ++ Seq.fill(3)("cd"))
        .mkString(" ")))
    val sC = Bpe.learn(chain, "text", 3)
    val bC = Bpe.learnBatched(chain, "text", 3, batch = 3)
    assert(bC.mergeList === sC.mergeList,
      s"cut rule diverged: ${bC.mergeList} vs ${sC.mergeList}")
    sC.release(); bC.release()
    // encode replay consistency under a batched table
    val bModel = Bpe.learnBatched(docs, "text", 5, batch = 4)
    val ms = bModel.mergeList.map { case (_, l, r, _) => (l, r) }
    val enc = Bpe.encodedVocab(docs, "text", ms)
    assert(enc.filter(concat_ws("", col("syms")) =!= col("word"))
      .count() === 0L)
    bModel.release()
  }

  test("merge table runs dry on a single-char vocabulary") {
    val docs = corpus((1L, "a b a b c"))
    val m = Bpe.learn(docs, "text", 5)
    assert(m.mergeList.isEmpty)
    assert(m.merges.count() === 0L)
    m.release()
  }

  test("encode replay: subwords concatenate back to each original word") {
    val docs = corpus(
      (1L, "hugging hugging hugging bugging bugging mugging"),
      (2L, "jogging jogging bogging"))
    val (merges, _) = Bpe.learnLocal(docs, "text", 5)
    val enc = Bpe.encodedVocab(docs, "text",
      merges.map { case (_, l, r, _) => (l, r) })
    val bad = enc.filter(concat_ws("", col("syms")) =!= col("word")).count()
    assert(bad === 0L)
    // at least one multi-char subword must have formed from 5 merges
    // over a -gging-heavy corpus
    val maxLen = enc.select(max(array_max(transform(col("syms"), length(_)))))
      .as[Int].collect().head
    assert(maxLen > 1)
  }

  test("per-document encode emits ordered subwords under the learned table") {
    val docs = corpus((1L, "abab abc"))
    val (merges, _) = Bpe.learnLocal(docs, "text", 1) // just (a,b)
    val out = Bpe.encode(docs, "text", "doc_id",
        merges.map { case (_, l, r, _) => (l, r) })
      .select("id", "word_pos", "sym_pos", "subword")
      .as[(Long, Int, Int, String)].collect().sortBy(r => (r._1, r._2, r._3))
    assert(out.toSeq === Seq(
      (1L, 1, 1, "ab"), (1L, 1, 2, "ab"), (1L, 2, 1, "ab"), (1L, 2, 2, "c")))
  }

  test("a token containing the U+001F fold separator fails loudly") {
    val docs = corpus((1L, "ok ok bad\u001Ftoken"))
    val ex = intercept[Exception] { Bpe.learn(docs, "text", 1) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("separator")))
    val ex2 = intercept[Exception] { Bpe.learnLocal(docs, "text", 1) }
    assert(msgs(ex2).exists(_.contains("separator")))
  }
}
