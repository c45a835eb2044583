package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding surface for token accounting: the pair-statistics
  * pass a BPE trainer iterates (distributed, oracled), a deterministic
  * driver-side trainer over the collected word-count vocabulary (the
  * bounded-artifact discipline of `TextAnalysis.writeVocabArtifact` —
  * the corpus is touched once, training runs on vocabulary-sized data),
  * and a greedy encoder for counting post-tokenization training tokens.
  *
  * Scale shape: the ONLY corpus-sized work anywhere here is one token
  * explode → (word, count) aggregate; everything downstream (pair
  * statistics, merge training) operates on the vocabulary, which is the
  * classic trainer layout (word counts in, merges out; Sennrich et al.
  * 2016). Encoding is a row-local codec boundary (same category as the
  * multimodal decode): greedy rank-priority merging is inherently
  * iterative, so it runs as a typed map with the merge table broadcast
  * — no shuffle, no state, corpus touched once.
  */
object Bpe {

  /** Corpus word counts: one explode + one keyed aggregate; the output
    * is vocabulary-sized. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  /** One BPE training step's statistics: adjacent character-pair
    * frequencies weighted by word frequency. The argmax row IS the
    * trainer's next merge; iterating this primitive over a contracting
    * symbol sequence is exactly [[trainMerges]]. Pure int64 counts.
    *
    * Scale shape: pair generation is ARRAY-SIDE per DISTINCT word
    * (`Column.substr` over the word, never a corpus-positions explode),
    * so the pair aggregate's input is vocabulary-sized × word length,
    * not corpus-sized. */
  def pairStats(df: DataFrame, textCol: String): DataFrame =
    wordCounts(df, textCol)
      .filter(length(col("word")) >= 2)
      .select(col("n"), explode(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => struct(
          col("word").substr(i, lit(1)).as("a"),
          col("word").substr(i + 1, lit(1)).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("pair_count"))

  /** Train `nMerges` BPE merges. One distributed pass builds
    * (word, count); training then iterates on the driver over the
    * top-`maxVocab` words (count desc, then word asc — fully
    * deterministic), at each step contracting the highest-count pair
    * (ties: lexicographically smallest), the reference BPE trainer
    * loop. Stops early when no pair repeats. Returns ranked merges,
    * index = rank (0 = first merge). */
  def trainMerges(df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 50000): Seq[(String, String)] = {
    require(nMerges >= 1 && maxVocab >= 1, "need nMerges >= 1, maxVocab >= 1")
    var vocab: Seq[(Vector[String], Long)] = wordCounts(df, textCol)
      .orderBy(col("n").desc, col("word"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0).map(_.toString).toVector, r.getLong(1)))
      .toSeq
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var step = 0
    while (step < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty || counts.valuesIterator.max < 2) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, n) => (contract(syms, best), n) }
        step += 1
      }
    }
    merges.result()
  }

  /** Contract every left-to-right occurrence of `p` in a symbol
    * sequence (the trainer's and encoder's shared merge move). */
  private def contract(syms: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += (p._1 + p._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Greedy BPE encoding of one word: repeatedly contract the
    * lowest-rank mergeable pair until none applies — the standard
    * inference rule matching how [[trainMerges]] built the table. */
  def encodeWord(w: String, rank: Map[(String, String), Int]): Vector[String] = {
    var syms = w.map(_.toString).toVector
    var cont = true
    while (cont && syms.length >= 2) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) cont = false else syms = contract(syms, best)
    }
    syms
  }

  /** Per-document post-BPE token counts under a trained merge table:
    * (id, n_words, n_bpe_tokens) — the number the data-budget planner
    * needs (tokens under the REAL tokenizer, not whitespace words).
    * Row-local codec boundary: a typed map with the broadcast merge
    * ranks; the corpus streams through once, nothing shuffles. */
  def countBpeTokens(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap: Map[(String, String), Int])
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = text.split(" ", -1)
        var total = 0L
        words.foreach(w => total += encodeWord(w, bc.value).length.toLong)
        (id, words.length.toLong, total)
      }
      .toDF(idCol, "n_words", "n_bpe_tokens")
  }
}
