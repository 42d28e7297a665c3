package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer induction, learned in-engine — the
  * vocabulary-construction step of a training-data pipeline (learn the
  * merge table on the corpus the model will train on, then encode with
  * it). Word-internal merges over whitespace tokens, greedy
  * left-to-right application, ties broken (pair_freq desc, left asc,
  * right asc) so the merge table is deterministic and any external
  * oracle replaying the same rounds reproduces it exactly.
  *
  * Shape at scale (100 TB): the corpus TEXT is touched exactly once —
  * the initial tokenize + word-count aggregation (one shuffle keyed by
  * word, map-side combined). Everything after runs on the WORD-FREQUENCY
  * table, which is vocabulary-sized (Heaps' law: sublinear in corpus
  * size — millions of rows at web scale, independent of TB read). Each
  * merge round is one vocab-sized pair-count aggregation plus a ONE-ROW
  * driver fetch of the winning pair replayed as literals (the PageRank
  * dangling-mass pattern); the rewrite is a narrow per-row fold. Rounds
  * checkpoint/release generation-by-generation like the CC loop.
  *
  * Two arms, identical semantics (spec-pinned equal):
  *  - [[learn]]: fully distributed, one round per merge — exact at any
  *    vocabulary size; right when numMerges is moderate (hundreds).
  *  - [[learnLocal]]: aggregate the word table distributed, then run the
  *    merge loop on the driver at memory speed — the SentencePiece/HF
  *    production shape (word tables fit in memory once counted), right
  *    for real tokenizer budgets (30k+ merges) where a shuffle per merge
  *    would dominate. Size-gated like [[Graph.connectedComponents]]'s
  *    driver arm: refuses vocabularies above `maxVocab` instead of
  *    silently collecting unbounded state.
  */
object Bpe {

  /** Unit separator: joins fold state; never occurs in tokens (tokens
    * are whitespace-split, and U+001F is whitespace-class in neither
    * engine's tokenizer — it survives into no token of a sane corpus;
    * the learn arms fail loudly if it does). */
  private val Sep = "\u001F"

  /** `merges` is a LOCAL frame (merge_rank, lhs, rhs, merged, pair_freq)
    * — merge tables are numMerges-bounded by construction; `mergeList`
    * is the same table as driver values for replay. `vocab` is the final
    * encoded word table, checkpoint-backed: call [[BpeModel.release]]
    * once done with it. */
  final case class BpeModel(merges: DataFrame,
                            mergeList: Seq[(Int, String, String, Long)],
                            vocab: DataFrame) {
    /** Free the checkpoint generation behind `vocab` once published. */
    def release(): Unit = Graph.freeCheckpoint(vocab)
  }

  /** (word, freq) over the corpus — the one corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Greedy left-to-right single-merge rewrite of a symbol array, as a
    * fold over a Sep-joined string: appending the right symbol WITHOUT
    * the separator fuses it onto the trailing left symbol. The empty
    * string is the fold's start sentinel (symbols are never empty —
    * tokens are non-empty and char-split), so `syms` is referenced
    * exactly ONCE: replaying k merges as nested folds grows the
    * expression tree linearly in k, not 3^k as a slice/size/element_at
    * head-tail formulation would (each of those re-roots the whole
    * inner tree; at 8 merges that is a ~20 MiB task binary and a
    * codegen OOM — measured before this shape). */
  private def applyMergeOnce(syms: Column, l: String, r: String): Column =
    split(
      aggregate(syms, lit(""),
        (acc, s) => when(acc === "", s).otherwise(
          when((acc === l || acc.endsWith(Sep + l)) && s === r,
            concat(acc, s))
            .otherwise(concat(acc, lit(Sep), s)))),
      Sep)

  /** Adjacent-pair frequencies of the current symbol table. */
  private def pairCounts(cur: DataFrame): DataFrame =
    cur.filter(size(col("syms")) > 1)
      .select(col("freq"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("pair_freq"))

  /** Initial per-character symbol split, failing loudly on a token that
    * contains the fold separator (would silently corrupt the rewrite). */
  private def charSyms(word: Column): Column =
    when(word.contains(Sep),
      raise_error(concat(lit("BPE: token contains the U+001F separator: "),
        word)))
      .otherwise(split(word, ""))

  /** Learn `numMerges` merges distributed — one vocab-sized round per
    * merge. Returns the merge table (merge_rank, lhs, rhs, merged,
    * pair_freq; fewer rows than numMerges if the corpus runs dry) and
    * the final encoded vocabulary (word, freq, syms). */
  def learn(docs: DataFrame, textCol: String, numMerges: Int): BpeModel =
    learnFromWordCounts(wordCounts(docs, textCol), numMerges)

  /** The merge loop alone, over an already-computed (word, freq) table —
    * everything below here is vocabulary-sized, independent of the
    * corpus bytes behind `wc` (ScaleProbe bpe measures the two stages
    * through this seam). */
  def learnFromWordCounts(wc: DataFrame, numMerges: Int): BpeModel = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = wc.sparkSession
    // localCheckpoint per generation, NOT persist: an iterative plan
    // otherwise nests one fold expression per round and the optimizer
    // re-analyzes the whole history each action (the CC-loop rationale,
    // Graph.connectedComponents).
    var cur = wc
      .withColumn("syms", charSyms(col("word")))
      .localCheckpoint(true)
    val merges = Vector.newBuilder[(Int, String, String, Long)]
    var r = 1
    var dry = false
    while (r <= numMerges && !dry) {
      // the argmax pair is ONE row — bring it to the driver and replay
      // it as literals (the PageRank dangling-mass pattern); a cross
      // join of a 1-row frame would shuffle the same information around
      val top = pairCounts(cur)
        .orderBy(col("pair_freq").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (l, rr, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, l, rr, c))
        val next = cur
          .select(col("word"), col("freq"),
            applyMergeOnce(col("syms"), l, rr).as("syms"))
          .localCheckpoint(true)
        // next is materialized (eager checkpoint) — the superseded
        // generation is now safe to free
        Graph.freeCheckpoint(cur)
        cur = next
      }
      r += 1
    }
    val mergeSeq = merges.result()
    val mergesDf = spark.createDataFrame(mergeSeq.map {
      case (rank, l, rr, c) => (rank, l, rr, l + rr, c)
    }).toDF("merge_rank", "lhs", "rhs", "merged", "pair_freq")
    BpeModel(mergesDf, mergeSeq, cur)
  }

  /** [[learn]] on the driver: the word table is counted distributed,
    * then collected (size-gated) and merged at memory speed — the right
    * arm for real tokenizer budgets where merges number tens of
    * thousands. Spec-pinned to agree with [[learn]] merge-for-merge. */
  def learnLocal(docs: DataFrame, textCol: String, numMerges: Int,
                 maxVocab: Int = 2000000): (Seq[(Int, String, String, Long)],
                                            Map[String, (Long, Seq[String])]) = {
    val wc = wordCounts(docs, textCol)
    val n = wc.count()
    require(n <= maxVocab,
      s"vocabulary $n exceeds maxVocab=$maxVocab: raise the gate or use learn()")
    var vocab: Map[String, (Long, Vector[String])] = wc.collect()
      .map { row =>
        val w = row.getString(0)
        require(!w.contains(Sep),
          s"BPE: token contains the U+001F separator: $w")
        w -> (row.getLong(1), w.map(_.toString).toVector)
      }
      .toMap
    val merges = Vector.newBuilder[(Int, String, String, Long)]
    var r = 1
    var dry = false
    while (r <= numMerges && !dry) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.valuesIterator.foreach { case (freq, syms) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + freq
          i += 1
        }
      }
      if (counts.isEmpty) dry = true
      else {
        // max by (freq desc, l asc, r asc) — same total order as learn()
        val ((l, rr), c) = counts.minBy { case ((a, b), f) => (-f, a, b) }
        merges += ((r, l, rr, c))
        vocab = vocab.map { case (w, (freq, syms)) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == rr) {
              out += (l + rr); i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> (freq, out.result())
        }
      }
      r += 1
    }
    (merges.result(), vocab.map { case (w, (f, s)) => w -> (f, s: Seq[String]) })
  }

  /** Replay a learned merge table in rank order over a word column —
    * numMerges narrow per-row folds; the merges ride along as literals
    * (tokenizer merge tables are bounded by construction). */
  private def applyMerges(word: Column,
                          merges: Seq[(String, String)]): Column =
    merges.foldLeft(charSyms(word)) { case (s, (l, r)) =>
      applyMergeOnce(s, l, r)
    }

  /** The corpus vocabulary encoded with a learned merge table:
    * (word, freq, syms) — pure lazy plan, no caches (the per-word
    * encoding any downstream token pipeline joins against). */
  def encodedVocab(docs: DataFrame, textCol: String,
                   merges: Seq[(String, String)]): DataFrame =
    wordCounts(docs, textCol)
      .select(col("word"), col("freq"),
        applyMerges(col("word"), merges).as("syms"))

  /** Encode a corpus document-by-document with a learned merge table:
    * one (id, word_pos, sym_pos, subword) row per emitted subword,
    * positions 1-based — the deterministic token stream a downstream
    * packing/shuffling stage keys on (no reliance on row order, which a
    * shuffle would destroy). */
  def encode(docs: DataFrame, textCol: String, idCol: String,
             merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("wp", "word")))
      .select(col("id"), (col("wp") + 1).as("word_pos"),
        posexplode(applyMerges(col("word"), merges)).as(Seq("sp", "subword")))
      .select(col("id"), col("word_pos").cast("int"),
        (col("sp") + 1).cast("int").as("sym_pos"), col("subword"))
}
