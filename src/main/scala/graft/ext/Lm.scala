package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Smoothed n-gram language-model scoring for corpus quality filtering.
  *
  * The CCNet-style model-based filter (train a small LM on a trusted
  * corpus, score every candidate document, gate on perplexity) needs a
  * SMOOTHED model: the unsmoothed MLE bigram score (`x_doc_perplexity`)
  * assigns probability zero to any bigram absent from training, so
  * out-of-domain documents — exactly the ones the filter exists to
  * catch — score as missing rows instead of as high-perplexity rows.
  * This module implements interpolated Kneser–Ney (the KenLM default;
  * Chen & Goodman 1998), the standard remedy.
  *
  * Reference behavior: the reference pipeline gates documents on simple
  * quality scores (src/processors/transformations.py quality flags);
  * this extends that gate with the model-based scorer LLM-scale
  * pipelines use alongside it.
  *
  * Model (bigram, absolute discount D):
  *   p(w2 | w1) = max(c(w1 w2) − D, 0) / c(w1 ·)
  *              + [D · N1+(w1 ·) / c(w1 ·)] · pc(w2)        c(w1 ·) > 0
  *   p(w2 | w1) = pc(w2)                                    unseen history
  *   pc(w2)     = (N1+(· w2) + 1) / (T + V + 1)
  * where c(w1 ·) = Σ_w c(w1 w) (history mass), N1+(w1 ·) = distinct
  * continuations of w1, N1+(· w2) = distinct histories preceding w2,
  * T = distinct bigram types, V = distinct training unigrams. The +1 in
  * pc is add-one smoothing over an implicit <unk> continuation type, so
  * every token — including ones never seen in training — gets strictly
  * positive mass and every document gets a finite score.
  *
  * Scale shape (100 TB corpus, training slice of any size):
  *  - training = two hash aggregations over exploded bigrams (map-side
  *    combined; the shuffle carries (bigram, count) pairs, bounded by
  *    bigram TYPES, not tokens);
  *  - the history and continuation tables are vocabulary-bounded and the
  *    totals frame is one row (explicit broadcast);
  *  - scoring shuffles only (doc bigram, key) pairs for the model join
  *    and one per-doc aggregation — texts never shuffle. The bigram-type
  *    join is a plain hash join (vocabulary² upper bound rules out a
  *    blind broadcast; AQE may still choose one when the model is small).
  */
object Lm {

  /** Interpolated-KN bigram model tables from a training corpus:
    * (bigrams(w1, w2, c2), hist(w1, c1, n1p_fwd), cont(w2, n1p_bwd),
    * totals(tt = bigram types, vv = unigram vocab) — one row).
    * The TYPE table is persisted (it is vocabulary-bounded — disk-backed
    * cache, tiny next to the corpus) so the derived tables aggregate it
    * instead of each re-reading the training text; call [[release]]
    * when the model is no longer needed. */
  case class KnModel(bigrams: DataFrame, hist: DataFrame, cont: DataFrame,
                     totals: DataFrame,
                     private val cached: Seq[DataFrame] = Nil) {
    def release(): Unit = {
      (if (cached.isEmpty) Seq(bigrams) else cached).foreach(_.unpersist())
      ()
    }
  }

  /** Count the model tables in ONE pass over the training text (r21):
    * unigram and bigram TYPE counts share the explode and the hash
    * aggregation — a whitespace token can never contain the shingle
    * separator, so "g contains a space" IS the bigram discriminator.
    * The old shape tokenized the corpus twice (bigram pass + unigram-
    * vocabulary pass); at 100 TB that is the difference between one
    * read of the training slice and two. Every other table is an
    * aggregate of the persisted gram TYPE table — vocabulary-sized,
    * never corpus-sized. */
  def knBigramTrain(train: DataFrame, textCol: String): KnModel = {
    val par = train.sparkSession.sparkContext.defaultParallelism
    val toks = Par.fanOut(train, par)
      .select(TextAnalysis.tokens(col(textCol)).as("toks"))
    val grams = toks
      .select(explode(concat(col("toks"),
        TextAnalysis.shinglesFromTokens(col("toks"), 2))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val isBg = col("g").contains(" ")
    val bigrams = grams.filter(isBg)
      .select(split(col("g"), " ").getItem(0).as("w1"),
        split(col("g"), " ").getItem(1).as("w2"), col("c").as("c2"))
    val hist = bigrams.groupBy("w1")
      .agg(sum("c2").as("c1"), count(lit(1)).as("n1p_fwd"))
    val cont = bigrams.groupBy("w2")
      .agg(count(lit(1)).as("n1p_bwd"))
    // tt = bigram types, vv = distinct unigrams — one aggregate of the
    // shared gram cache (the split/filter re-derivations of `bigrams`
    // per consumer are string ops over vocabulary-bounded cached rows,
    // paid so the CORPUS is only ever read once)
    val totals = grams.agg(count_if(isBg).as("tt"),
      count_if(!isBg).as("vv"))
    KnModel(bigrams, hist, cont, totals, cached = Seq(grams))
  }

  /** Score every document under the model: (id, n_bigrams, avg_nll)
    * with avg_nll = mean −log2 p_KN over the document's bigrams.
    * Documents with fewer than 2 tokens have no bigrams and are
    * excluded (no event to score). UNLIKE the MLE scorer, every
    * document with at least one bigram gets a finite score — unseen
    * histories and unseen continuations fall through to the smoothed
    * continuation distribution instead of vanishing. */
  def knScore(docs: DataFrame, idCol: String, textCol: String,
              model: KnModel, discount: Double = 0.75): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // pre-aggregate to per-doc bigram TYPES with counts before the model
    // joins: natural text repeats its bigrams heavily (Zipf), so the
    // join shuffles carry (id, type, cnt) rows instead of one row per
    // instance — the weighted average below is exact
    val db = Par.fanOut(docs, par)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.shinglesFromTokens(
          TextAnalysis.tokens(col(textCol)), 2)).as("bg"))
      .select(col("id"), split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"))
      .groupBy("id", "w1", "w2").agg(count(lit(1)).as("cnt"))
    val d = lit(discount)
    val pc = (coalesce(col("n1p_bwd"), lit(0L)) + lit(1.0)) /
      (col("tt") + col("vv") + lit(1.0))
    val pSeen = greatest(coalesce(col("c2"), lit(0L)).cast("double") - d,
      lit(0.0)) / col("c1") +
      (d * col("n1p_fwd") / col("c1")) * pc
    val p = when(col("c1").isNotNull, pSeen).otherwise(pc)
    db.join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.hist, Seq("w1"), "left")
      .join(model.cont, Seq("w2"), "left")
      .crossJoin(broadcast(model.totals))
      .groupBy("id")
      .agg(sum("cnt").as("n_bigrams"),
        (sum(col("cnt") * -log(2.0, p)) / sum("cnt")).as("avg_nll"))
  }

  /** Trigram interpolated-KN model. The lower (bigram) order is built
    * from CONTINUATION counts of the trigram table — the defining KN
    * move: p_kn2 asks "in how many distinct contexts does this bigram
    * continue a history", not "how often does it occur" — so a bigram
    * frequent only inside one fixed phrase stops inflating its backoff
    * mass. Tables:
    *   tri(w1,w2,w3,c3); h3(w1,w2, c12=Σc3, fwd3=|{w3}|);
    *   m2(w2,w3, n1p=|{w1: c(w1 w2 w3)>0}|); h2(w2, tot2=Σn1p, fwd2=|{w3}|);
    *   cont(w3, n1p_bwd=|{w2: (w2,w3)∈m2}|); totals(tt=|m2|, vv=|vocab|).
    * All are aggregates of the trigram TYPE table — vocabulary-bounded,
    * never corpus-bounded. */
  case class Kn3Model(tri: DataFrame, h3: DataFrame, m2: DataFrame,
                      h2: DataFrame, cont: DataFrame, totals: DataFrame,
                      private val cached: Seq[DataFrame] = Nil) {
    def release(): Unit = {
      (if (cached.isEmpty) Seq(tri, m2) else cached).foreach(_.unpersist())
      ()
    }
  }

  def knTrigramTrain(train: DataFrame, textCol: String): Kn3Model = {
    val par = train.sparkSession.sparkContext.defaultParallelism
    val toks = Par.fanOut(train, par)
      .select(TextAnalysis.tokens(col(textCol)).as("toks"))
    // ONE corpus pass (r21, same move as [[knBigramTrain]]): unigram and
    // trigram TYPE counts share the explode and the aggregation (a
    // unigram has no space; a trigram has two), where the old shape paid
    // a second full tokenize pass for the vocabulary countDistinct.
    // The gram table and m2 (which h2/cont/totals re-derive) stay
    // persisted so the five model aggregates read cache, not corpus —
    // at 100 TB that is the difference between 1 corpus pass and 6.
    val grams = toks
      .select(explode(concat(col("toks"),
        TextAnalysis.shinglesFromTokens(col("toks"), 3))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val isTri = col("g").contains(" ")
    val tri = grams.filter(isTri)
      .select(split(col("g"), " ").getItem(0).as("w1"),
        split(col("g"), " ").getItem(1).as("w2"),
        split(col("g"), " ").getItem(2).as("w3"), col("c").as("c3"))
    val h3 = tri.groupBy("w1", "w2")
      .agg(sum("c3").as("c12"), count(lit(1)).as("fwd3"))
    val m2 = tri.groupBy("w2", "w3")
      .agg(countDistinct("w1").as("n1p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val h2 = m2.groupBy("w2")
      .agg(sum("n1p").as("tot2"), count(lit(1)).as("fwd2"))
    val cont = m2.groupBy("w3").agg(count(lit(1)).as("n1p_bwd"))
    val vocab = grams.agg(count_if(!isTri).as("vv"))
    val totals = m2.agg(count(lit(1)).as("tt")).crossJoin(vocab)
    Kn3Model(tri, h3, m2, h2, cont, totals, cached = Seq(grams, m2))
  }

  /** Score documents under the trigram model: (id, n_trigrams, avg_nll),
    * avg −log2 p(w3 | w1 w2) with the full interpolation chain
    * trigram → continuation-bigram → smoothed unigram. Unseen (w1,w2)
    * histories back off to the bigram level; unseen w2 to the unigram
    * continuation floor — every ≥3-token document scores finite. */
  def kn3Score(docs: DataFrame, idCol: String, textCol: String,
               model: Kn3Model, discount: Double = 0.75): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // per-doc trigram TYPES with counts — see [[knScore]]'s shuffle note
    val db = Par.fanOut(docs, par)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.shinglesFromTokens(
          TextAnalysis.tokens(col(textCol)), 3)).as("tg"))
      .select(col("id"), split(col("tg"), " ").getItem(0).as("w1"),
        split(col("tg"), " ").getItem(1).as("w2"),
        split(col("tg"), " ").getItem(2).as("w3"))
      .groupBy("id", "w1", "w2", "w3").agg(count(lit(1)).as("cnt"))
    val d = lit(discount)
    val pc = (coalesce(col("n1p_bwd"), lit(0L)) + lit(1.0)) /
      (col("tt") + col("vv") + lit(1.0))
    val p2Seen = greatest(coalesce(col("n1p"), lit(0L)).cast("double") - d,
      lit(0.0)) / col("tot2") +
      (d * col("fwd2") / col("tot2")) * pc
    val p2 = when(col("tot2").isNotNull, p2Seen).otherwise(pc)
    val p3Seen = greatest(coalesce(col("c3"), lit(0L)).cast("double") - d,
      lit(0.0)) / col("c12") +
      (d * col("fwd3") / col("c12")) * p2
    val p3 = when(col("c12").isNotNull, p3Seen).otherwise(p2)
    db.join(model.tri, Seq("w1", "w2", "w3"), "left")
      .join(model.h3, Seq("w1", "w2"), "left")
      .join(model.m2, Seq("w2", "w3"), "left")
      .join(model.h2, Seq("w2"), "left")
      .join(model.cont, Seq("w3"), "left")
      .crossJoin(broadcast(model.totals))
      .groupBy("id")
      .agg(sum("cnt").as("n_trigrams"),
        (sum(col("cnt") * -log(2.0, p3)) / sum("cnt")).as("avg_nll"))
  }
}
