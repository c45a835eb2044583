package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{PortableHash, PortableRound}

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, n-gram-heuristic language ID, and document
  * fingerprinting. All Catalyst-native (split / filter / aggregate
  * higher-order functions + regexp_count) — whole-stage codegen, no
  * UDFs, scale-free narrow projections except the trivial per-doc aggs.
  */
object TextAnalysis {

  /** Tiny public stopword lists per language — the n-gram/stopword
    * heuristic signal for [[langScores]]. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "y", "que", "los"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo"))

  def tokens(text: Column): Column = Dedup.tokens(text) // ONE canonical tokenizer

  /** Whitespace token count (long). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword proxy: count of maximal alnum runs. */
  def alnumRunCount(text: Column): Column = regexp_count(text, lit("[a-z0-9]+")).cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Occurrences (with multiplicity) of any word in `words`. */
  def wordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words))).cast("long")

  /** Mean token length via a codegen'd sum over token lengths. */
  def avgTokenLen(text: Column): Column = {
    val totalLen = aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t).cast("long"))
    PortableRound.round4(totalLen.cast("double") / tokenCount(text))
  }

  /** Per-language stopword-density scores, 4dp. */
  def langScores(text: Column): Map[String, Column] =
    stopwords.map { case (lang, words) =>
      lang -> PortableRound.round4(wordHits(text, words).cast("double") / tokenCount(text))
    }

  /** Argmax language with deterministic tie-break: highest score wins,
    * ties resolve to the lexically GREATEST language code (mirrors the
    * engine-wide argmax-struct tie-break, SURVEY.md §2.5 A3). */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    // lang L wins iff score(L) >= score(M) for all M != L, evaluated in
    // reverse-lexical order so ties resolve to the greatest code.
    val ordered = scores.keys.toSeq.sorted.reverse
    val chain = ordered.map { lang =>
      val cond = scores.collect { case (m, s) if m != lang => scores(lang) >= s }
        .reduce(_ && _)
      (cond, lang)
    }
    val winner = chain.init.foldRight(lit(chain.last._2): Column) {
      case ((cond, lang), els) => when(cond, lit(lang)).otherwise(els)
    }
    // null text must predict null, not fall through every null condition
    // into the chain's terminal literal (the lexically smallest code)
    when(text.isNull, lit(null)).otherwise(winner)
  }

  /** Heuristic quality score in [0,1]: length saturation, lexical
    * diversity, and English stopword density. 4dp for oracle parity. */
  def qualityScore(text: Column): Column = {
    // One-walk native token stats ([[graft.functions.TokenStats]]):
    // the composed form re-tokenized three times and paid an
    // interpreted stopword filter per token; the three counts are
    // exact integers, so the double algebra below is bit-identical.
    // The three getFields share the single walk through codegen
    // subexpression elimination.
    val st = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.TokenStats(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(tokens(text)),
        stopwords("en")))
    val n = st.getField("n").cast("double")
    val lengthScore = least(lit(1.0), n / lit(100.0))
    val diversity = st.getField("nd").cast("double") / n
    val stopDensity = least(lit(1.0),
      st.getField("hits").cast("double") / n * lit(5.0))
    PortableRound.round4(lit(0.4) * lengthScore + lit(0.3) * diversity + lit(0.3) * stopDensity)
  }

  /** The three-pass composition [[qualityScore]] replaced (tokenize ×3
    * + interpreted stopword filter) — the parity reference
    * TextAnalysisSpec pins the fused form against. */
  private[graft] def qualityScoreComposed(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lengthScore = least(lit(1.0), n / lit(100.0))
    val diversity = distinctTokenCount(text).cast("double") / n
    val stopDensity = least(lit(1.0),
      wordHits(text, stopwords("en")).cast("double") / n * lit(5.0))
    PortableRound.round4(lit(0.4) * lengthScore + lit(0.3) * diversity + lit(0.3) * stopDensity)
  }

  /** Order-independent bag-of-tokens fingerprint: sum of md5-derived
    * token hashes (with multiplicity) mod P. Content-sensitive, cheap,
    * reproducible in the SQL oracle. */
  def bagFingerprint(text: Column): Column = {
    val hs = transform(tokens(text), t => PortableHash.md5Hash32(t) % lit(PortableHash.P))
    aggregate(hs, lit(0L), (acc, h) => (acc + h) % lit(PortableHash.P))
  }

  /** Canonical text normalization: lowercase, strip everything but
    * [a-z0-9 ], squeeze runs of spaces, trim. The standard pre-dedup /
    * pre-tokenization cleanup; all regexp ops are codegen'd and
    * replace-all on both engines. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Top-`k` characteristic terms per document by a tf/df density score.
    *
    * score1m = tf·10⁶ ÷ df (integer division) — tf with multiplicity,
    * df = number of docs containing the term. Integer arithmetic makes
    * the ranking bit-portable across engines (a float idf would make
    * top-k membership flip on last-ulp log() differences); ties break on
    * the term itself. Plan: explode → two hash aggregates (term stats
    * are built once, partial-combined) → broadcast-joined df counts →
    * per-doc ranking window. At corpus scale the df frame is the only
    * global structure and it's |vocabulary|-sized, not corpus-sized. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    // document frequency as a count over the term-partitioned window of
    // the tf frame — same value as the former groupBy(tok) + join back
    // (each tf row is one distinct (doc, term)), one exchange fewer and
    // no join (guide §2.4: two operations keyed the same way share one
    // exchange; the per-doc ranking window is the only other shuffle)
    val wTok = Window.partitionBy(col("tok"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score1m").desc, col("tok").asc)
    tf.withColumn("df_t", count(lit(1)).over(wTok))
      .withColumn("score1m", expr("(tf * 1000000) DIV df_t"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("tok"), col("tf"), col("df_t"), col("score1m"))
  }

  /** Corpus vocabulary: the `topN` terms by document frequency with
    * stable integer ids — the vocab-building pass of tokenizer/feature
    * pipelines. Term stats build in two partial-aggregated hash
    * aggregates (per-doc tf, then global tf/df — the q41 shape); topN
    * selection is orderBy+limit, which Catalyst plans as
    * TakeOrderedAndProject (per-partition heaps, only topN rows move).
    * The ranking window that assigns vocab_id then runs over the
    * ALREADY-REDUCED topN rows — the unpartitioned window is topN-sized
    * by construction, never corpus-sized. Ordering is fully
    * deterministic: df desc, then term asc. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val perDoc = toks.groupBy(col("tok"), col(idCol)).agg(count(lit(1)).as("tf_d"))
    val stats = perDoc.groupBy(col("tok"))
      .agg(sum(col("tf_d")).as("tf"), count(lit(1)).as("df_t"))
    val top = stats.orderBy(col("df_t").desc, col("tok").asc).limit(topN)
    val w = Window.orderBy(col("df_t").desc, col("tok").asc)
    top.withColumn("vocab_id", row_number().over(w).cast("long"))
      .select(col("vocab_id"), col("tok"), col("tf"), col("df_t"))
  }

  /** Fixed-size sequence chunking: split each document into consecutive
    * `chunkSize`-token windows — the context-window packing step that
    * turns variable-length documents into training sequences. Narrow
    * per-row expansion (slice + posexplode), no shuffle; the last chunk
    * is the remainder (shorter than `chunkSize`). */
  def chunk(df: DataFrame, idCol: String, textCol: String, chunkSize: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    // let-bound so split() runs once per row, not once per chunk
    // (codegen CSE does not reach inside the transform lambda)
    val chunks = graft.functions.ArrayOps.bind(tokens(col(textCol))) { toks =>
      val nChunks = floor((size(toks) + lit(chunkSize - 1)) / lit(chunkSize)).cast("int")
      transform(
        sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(toks, i * chunkSize + 1, lit(chunkSize))))
    }
    // null text: size(null) = -1 makes sequence(0, -1) count DOWN and
    // emit phantom empty chunks — filter like the cdcChunks sibling
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "chunk_text")))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        tokenCount(col("chunk_text")).as("n_tokens"),
        col("chunk_text"))
  }

  /** CONTENT-DEFINED chunking (rolling-hash boundaries, the CDC scheme
    * storage dedup systems use): a chunk ends after every token whose
    * md5-derived hash ≡ 0 (mod `m`), so boundaries depend only on local
    * content — insert or delete a token and only the chunk containing
    * the edit (and at most its neighbor) changes digest, where
    * [[chunk]]'s fixed windows shift EVERY downstream chunk. Expected
    * chunk length is `m` tokens (geometric); chunk-digest dedup over
    * this output is the insertion-robust sub-document dedup unit.
    *
    * Output: (id, chunk_id, n_tokens, chunk_digest) — digests, not
    * text, keep the frame narrow; a dedup consumer groups by digest.
    *
    * Scale shape: boundary positions, segment bounds, and chunk digests
    * are all computed ARRAY-SIDE in one row-local projection (the text
    * is never exploded token-wise and never shuffles); the only
    * exchange in a typical consumer is its own digest groupBy. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String, m: Int): DataFrame = {
    require(m >= 2, s"modulus must be >= 2, got $m")
    import graft.functions.ArrayOps
    val segs = ArrayOps.bind(tokens(col(textCol))) { toks =>
      transform(cdcSpans(toks, m), st =>
        struct(
          (st.getField("e") - st.getField("s") + 1).cast("long").as("n"),
          md5(concat_ws(" ", slice(toks, st.getField("s"),
            st.getField("e") - st.getField("s") + 1))).as("d")))
    }
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), posexplode(segs).as(Seq("_c0", "_ch")))
      .select(col(idCol),
        (col("_c0") + 1).cast("long").as("chunk_id"),
        col("_ch.n").as("n_tokens"),
        col("_ch.d").as("chunk_digest"))
  }

  /** Non-empty 1-based CDC segment bounds `(s, e)` for a token array:
    * a segment ends after every token whose md5-derived hash ≡ 0
    * (mod `m`), plus the array end. Shared by [[cdcChunks]] and
    * [[dedupCdcChunks]] so both see identical boundaries. */
  private def cdcSpans(toks: Column, m: Int): Column = {
    import graft.functions.ArrayOps
    ArrayOps.bind(filter(sequence(lit(1), size(toks)),
        i => PortableHash.md5Hash32(element_at(toks, i)) % m === 0)) { bpos =>
      ArrayOps.bind(concat(array(lit(1)), transform(bpos, x => x + 1))) { starts =>
        ArrayOps.bind(concat(bpos, array(size(toks)))) { ends =>
          filter(
            transform(sequence(lit(1), size(starts)), j =>
              struct(element_at(starts, j).as("s"), element_at(ends, j).as("e"))),
            st => st.getField("s") <= st.getField("e"))
        }
      }
    }
  }

  /** Corpus-wide CHUNK-LEVEL exact dedup over [[cdcChunks]] segments,
    * keep-first: a chunk whose digest already occurred at a smaller
    * (id, chunk_id) anywhere in the corpus is cut; every first
    * occurrence stays. The sub-document complement of whole-doc exact
    * dedup — repeated quotes, license blocks, and syndicated passages
    * collapse to one stored copy while each document keeps its unique
    * remainder (the C4 line-dedup move, on insertion-robust CDC units
    * instead of lines). Returns one row per input document:
    * (id, n_chunks, n_cut_chunks, n_kept_tokens, clean_digest) with
    * `clean_digest` = md5 of the rebuilt (kept-chunks-only) text.
    *
    * Scale shape: the only corpus-sized exchange is the digest-keyed
    * window over the (id, chunk_id, digest) SHADOW — text never
    * explodes and never shuffles with the digests. Losing chunks are
    * dup-rate-sized; they fold to one per-doc cut-set whose join-back
    * into the corpus is a doc-keyed equi join (AQE broadcasts it when
    * small), and the rebuild itself is one array-side projection over
    * the already-resident token array. */
  def dedupCdcChunks(df: DataFrame, idCol: String, textCol: String, m: Int): DataFrame = {
    require(m >= 2, s"modulus must be >= 2, got $m")
    import graft.functions.ArrayOps
    import org.apache.spark.sql.expressions.Window
    val docs = df.filter(col(textCol).isNotNull)
    val chunks = cdcChunks(docs, idCol, textCol, m)
      .select(col(idCol).as("_did"), col("chunk_id"), col("chunk_digest"))
    val cut = chunks
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("chunk_digest")).orderBy(col("_did"), col("chunk_id"))))
      .filter(col("_rn") > 1)
      .groupBy(col("_did"))
      .agg(collect_set(col("chunk_id")).as("_cut"))
    docs
      .select(col(idCol).as("_did"), tokens(col(textCol)).as("_toks"))
      .join(cut, Seq("_did"), "left")
      .select(col("_did"),
        ArrayOps.bind(coalesce(col("_cut"), array().cast("array<bigint>"))) { cutIds =>
          ArrayOps.bind(col("_toks")) { toks =>
            ArrayOps.bind(cdcSpans(toks, m)) { spans =>
              ArrayOps.bind(flatten(transform(
                  filter(sequence(lit(1), size(spans)),
                    j => !array_contains(cutIds, j.cast("long"))),
                  j => ArrayOps.bind(element_at(spans, j)) { st =>
                    slice(toks, st.getField("s"),
                      st.getField("e") - st.getField("s") + 1)
                  }))) { kt =>
                struct(
                  size(spans).cast("long").as("n_chunks"),
                  size(cutIds).cast("long").as("n_cut_chunks"),
                  size(kt).cast("long").as("n_kept_tokens"),
                  md5(concat_ws(" ", kt)).as("clean_digest"))
              }
            }
          }
        }.as("_r"))
      .select(col("_did").as(idCol),
        col("_r.n_chunks").as("n_chunks"),
        col("_r.n_cut_chunks").as("n_cut_chunks"),
        col("_r.n_kept_tokens").as("n_kept_tokens"),
        col("_r.clean_digest").as("clean_digest"))
  }

  /** Tiny public keyword taxonomy over the test vocabulary — the
    * rule-based topic router's default rule set (tag → keyword list).
    * Real pipelines swap in a curated taxonomy; the operator shape is
    * identical at any rule-list size that fits a broadcast. */
  val topicRules: Map[String, Seq[String]] = Map(
    "analytics" -> Seq("agg", "group", "window", "sort"),
    "relational" -> Seq("join", "merge", "table", "row", "column"),
    "retrieval" -> Seq("vector", "query", "scan"),
    "streaming" -> Seq("stream", "batch"))

  /** Rule-based multi-label topic tagging: a document gets every tag
    * whose keyword list intersects its token set. Output (id, tags,
    * n_tags) with `tags` the comma-joined tag list in ascending tag
    * order ('' when none match) — the taxonomy-routing step a training
    * mixture planner runs before per-topic quotas.
    *
    * Scale shape: MAP-ONLY — the rule list folds into one row-local
    * projection (`arrays_overlap` per tag over the bound token array);
    * no shuffle, no join, nothing driver-side; trivially stateless on
    * streams. */
  def tagTopics(df: DataFrame, idCol: String, textCol: String,
      rules: Map[String, Seq[String]] = topicRules): DataFrame = {
    require(rules.nonEmpty && rules.size <= 1000, "1..1000 taxonomy rules")
    import graft.functions.ArrayOps
    val tagged = ArrayOps.bind(tokens(col(textCol))) { toks =>
      ArrayOps.bind(filter(
          array(rules.toSeq.sortBy(_._1).map { case (tag, kws) =>
            when(arrays_overlap(toks, array(kws.map(lit): _*)), lit(tag))
          }: _*), x => x.isNotNull)) { tags =>
        struct(concat_ws(",", tags).as("tags"),
          size(tags).cast("long").as("n_tags"))
      }
    }
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), tagged.as("_t"))
      .select(col(idCol), col("_t.tags").as("tags"), col("_t.n_tags").as("n_tags"))
  }

  /** Boilerplate detection: n-gram shingles appearing in at least
    * `minDocs` DISTINCT documents (headers, footers, license blocks —
    * the cross-document repetition CCNet-style curation removes).
    * Shingles are distinct per document ([[Dedup.distinctShingles]]), so
    * a plain count after the explode IS the document frequency — one
    * partial-aggregated hash aggregate over (gram), no distinct-agg.
    * At corpus scale the aggregate output is vocabulary-sized; the
    * `minDocs` filter applies post-aggregation (HAVING). */
  def repeatedNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Long): DataFrame =
    df.select(explode(Dedup.distinctShingles(col(textCol), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("df_g"))
      .filter(col("df_g") >= minDocs)

  /** Token-budget shard packing: assign each document to a training
    * shard so consecutive (by `orderCol`, within `partCol`) documents
    * fill ~`budgetTokens`-token shards — the document→shard layout pass
    * before sequence serialization. A document lands in the shard its
    * STARTING token offset falls in (documents spanning a boundary are
    * not split; oversized documents own their span).
    *
    * The running total is a rows-frame window per `partCol` — the
    * partition column keeps it parallel (one task per partition value),
    * the idiomatic Spark shape for per-group sequential layout. */
  def packShards(df: DataFrame, partCol: String, orderCol: String,
      textCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(orderCol), col(partCol), tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .withColumn("shard_id",
        floor((col("_cum") - col("n_tokens")) / lit(budgetTokens)).cast("long"))
      .drop("_cum")
  }

  /** [[packShards]] without the per-group serialization: the rows-frame
    * window above caps parallelism at the number of distinct `partCol`
    * values (5 languages = 5 tasks, no matter the cluster). This
    * variant computes the SAME global running total in two passes, with
    * parallelism = shuffle partitions:
    *
    *  1. range-repartition by (partCol, orderCol) — contiguous runs of
    *     the global order land in separate tasks;
    *  2. per-(task, group) token sums → driver (tasks × groups rows, a
    *     plan-stats-sized collect) → prefix offsets per task;
    *  3. within-task windows (partitioned by task id — all parallel)
    *     plus the broadcast offset give each row its global offset.
    *
    * Output equals [[packShards]] row-for-row whenever `orderCol` is
    * unique within each `partCol` (ties make the running total — and so
    * either variant — order-ambiguous). */
  def packShardsScalable(df: DataFrame, partCol: String, orderCol: String,
      textCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val nPart = graft.functions.Plans.shufflePartitions(df)
    // CHECKPOINTED: both passes must see the IDENTICAL partition
    // assignment, but pass 1 (the collect) and pass 2 (the returned
    // plan) would otherwise re-execute the range exchange
    // independently — and nothing pins two executions to the same
    // sampled range bounds, so `_pid` could differ between them and
    // attach offsets to the wrong task (observed at sf0.1: ~1/5 of
    // rows off by one shard). A localCheckpoint (not persist())
    // materializes the assignment once AND stores `_pid` as data in
    // the truncated lineage; executor blocks free when the frame is
    // GC'd. persist() did the same job but left a live cache entry
    // keyed by this logical plan, so a caller re-running the operator
    // over the same input (Bench's warm sweeps) re-registered the
    // identical plan — the CacheManager "already cached" warning.
    val ranged = df
      .select(col(orderCol), col(partCol), tokenCount(col(textCol)).as("n_tokens"))
      .repartitionByRange(nPart, col(partCol), col(orderCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // pass 1: per-(task, group) sums; tiny — tasks × groups rows
    val partials = ranged.groupBy(col("_pid"), col(partCol))
      .agg(sum(col("n_tokens")).as("_psum"))
      .collect()
    val offsets: Seq[(Int, Any, Long)] = partials
      .map(r => (r.getInt(0), r.get(1), r.getLong(2)))
      .groupBy(_._2).iterator.flatMap { case (_, rows) =>
        var acc = 0L
        rows.sortBy(_._1).map { case (pid, g, s) =>
          val off = acc; acc += s; (pid, g, off)
        }
      }.toSeq
    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.map(o =>
        org.apache.spark.sql.Row(o._1, o._2, o._3)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_pid",
          org.apache.spark.sql.types.IntegerType),
        ranged.schema(partCol).copy(),
        org.apache.spark.sql.types.StructField("_offset",
          org.apache.spark.sql.types.LongType))))
    // pass 2: within-task running totals — parallel across tasks
    val w = Window.partitionBy(col("_pid"), col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      // <=> on the group value: a null partCol is a legitimate group in
      // the plain window version (nulls form one window partition), and
      // a plain equi-join would silently drop every row of it
      .join(broadcast(offsetDf
          .withColumnRenamed("_pid", "_opid")
          .withColumnRenamed(partCol, "_gpart")),
        col("_pid") === col("_opid") && col(partCol) <=> col("_gpart"))
      .drop("_opid", "_gpart")
      .withColumn("_cum", col("_offset") + sum(col("n_tokens")).over(w))
      .withColumn("shard_id",
        floor((col("_cum") - col("n_tokens")) / lit(budgetTokens)).cast("long"))
      .select(col(orderCol), col(partCol), col("n_tokens"), col("shard_id"))
  }

  /** Corpus-level boilerplate removal: any word n-gram occurring in at
    * least `minDocs` DISTINCT documents is treated as boilerplate
    * (header/footer/template debris in a crawl), and every token
    * position covered by an occurrence of a boilerplate gram is masked
    * out of the document. Returns one row per input document:
    * `(idCol, n_kept, n_masked, clean_digest)` where `clean_digest` is
    * the md5 of the cleaned text (the digest-not-text trick of q39 —
    * hash-exact without megabytes in the result; a fully-masked doc
    * digests the empty string).
    *
    * Scale shape — every stage is a keyed shuffle, nothing quadratic:
    *  1. gram build is a narrow `transform`+`explode` projection;
    *  2. the boilerplate set is a gram-keyed distinct-doc count
    *     (map-side partials);
    *  3. occurrence marking is a gram-keyed equi-join (the boilerplate
    *     side is corpus-dependent but far smaller than the gram stream;
    *     AQE picks broadcast when stats allow);
    *  4. covered positions are a (doc, pos)-keyed distinct, the mask an
    *     anti-join, the rebuild a doc-keyed aggregate.
    * At 100 TB nothing funnels through the driver and no stage's width
    * exceeds the corpus's gram stream. */
  def stripBoilerplate(df0: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int): DataFrame = {
    require(n >= 1, "n must be >= 1")
    // null text would reach the final select with n_total = size(null)
    // = -1 and come out as n_masked = -1 with an empty-string digest
    val df = df0.filter(col(textCol).isNotNull)
    val arr = tokens(col(textCol))
    // (start, gram) pairs built array-side so the wide text column is
    // exploded exactly once
    val gramStructs = when(size(arr) >= n,
      transform(sequence(lit(0), size(arr) - n),
        i => struct(i.cast("long").as("start"),
          concat_ws(" ", slice(arr, i + 1, lit(n))).as("gram"))))
      .otherwise(array().cast("array<struct<start:bigint,gram:string>>"))
    val grams = df
      .select(col(idCol).as("doc_id"), explode(gramStructs).as("sg"))
      .select(col("doc_id"), col("sg.start").as("start"), col("sg.gram").as("gram"))
    val boilerplate = grams
      .groupBy("gram")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= minDocs)
      .select("gram")
    val covered = grams
      .join(boilerplate, "gram")
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + (n - 1))).as("pos"))
      .distinct()
    val toks = df.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
    val rebuilt = kept
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            s => s.getField("tok")))).as("clean_digest"))
    df.select(col(idCol).as("doc_id"), tokenCount(col(textCol)).as("n_total"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_masked"),
        coalesce(col("clean_digest"), md5(lit(""))).as("clean_digest"))
  }

  /** Inverted index (token → delta-encoded posting list), the retrieval
    * structure behind exact-match decontamination and corpus search.
    *
    * Per token: document frequency plus the SORTED posting list of doc
    * ids, gap-encoded (first id absolute, then successive differences) —
    * the standard compression that turns monotone id lists into small
    * integers. Deltas are computed ARRAY-SIDE in one codegen'd
    * `transform` after the per-token collect; no second shuffle.
    *
    * Scale shape: the explode shuffles (token, id) pairs once — the
    * irreducible cost of building an inverted index. Posting lists are
    * df-bounded; the head-token skew (stopwords with corpus-sized
    * postings) is the reason for the `minDf`-style cut in real IR
    * builds — here `minDf` prunes the TAIL for output hygiene and a
    * stopword ceiling would prune the head the same way. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      minDf: Int): DataFrame = {
    val pairs = df.select(
      col(idCol).cast("long").as("_id"),
      explode(array_distinct(tokens(col(textCol)))).as("token"))
    pairs.groupBy(col("token"))
      .agg(
        count(lit(1)).as("df_t"),
        sort_array(collect_list(col("_id"))).as("_post"))
      .filter(col("df_t") >= minDf)
      .withColumn("deltas", concat_ws(",",
        transform(col("_post"), (x, i) =>
          when(i === 0, x).otherwise(x - col("_post")(i - lit(1))))))
      .drop("_post")
  }

  /** [[invertedIndex]]'s skew-proof twin — the lift for the documented
    * stopword ceiling: a df-heavy token (a stopword indexed at low
    * minDf) used to deliver its ENTIRE posting stream to one reducer
    * in the single token-keyed aggregation. Here stage 1 aggregates on
    * (token, salt = id mod nSalts) — the hot token's stream splits
    * into nSalts groups, bounding any one reducer's row count at
    * df/nSalts — and stage 2 merges the nSalts partial arrays
    * token-keyed (nSalts ROWS per token, so the second shuffle is
    * row-count-uniform; the merged posting bytes are inherent to the
    * output format). The array sort + gap encoding run once, array-side,
    * in stage 2. Output is bit-identical to [[invertedIndex]] —
    * q135 hash-checks it against q108's oracle. */
  def invertedIndexSalted(df: DataFrame, idCol: String, textCol: String,
      minDf: Int, nSalts: Int = 16): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val pairs = df.select(
      col(idCol).cast("long").as("_id"),
      explode(array_distinct(tokens(col(textCol)))).as("token"))
    pairs
      .groupBy(col("token"), pmod(col("_id"), lit(nSalts.toLong)).as("_salt"))
      .agg(count(lit(1)).as("_n"), collect_list(col("_id")).as("_part"))
      .groupBy(col("token"))
      .agg(sum(col("_n")).as("df_t"),
        array_sort(flatten(collect_list(col("_part")))).as("_post"))
      .filter(col("df_t") >= minDf)
      .withColumn("deltas", concat_ws(",",
        transform(col("_post"), (x, i) =>
          when(i === 0, x).otherwise(x - col("_post")(i - lit(1))))))
      .drop("_post")
  }

  /** Collocation mining: adjacent-window co-occurrence pairs scored by
    * the Dice coefficient — 2·n(a,b) / (n(a) + n(b)) — the classic
    * association measure for multi-word expressions. Emitted as
    * `dice_micro` = ⌊2_000_000·n_ab / (n_a + n_b)⌋: pure int64
    * arithmetic, so the score is bitwise-portable across engines
    * (PMI's log is not correctly rounded and would drift).
    *
    * Pair generation is ARRAY-SIDE (zip of the token array with its
    * d-shifted self for d = 1..window) — no token-level self-join, no
    * positions shuffle; only the (a, b) pair stream shuffles for the
    * count. Unigram counts are vocabulary-sized and broadcast back.
    * At 100 TB the vocabulary (minDf-cut) stays executor-memory-sized;
    * if not, the same plan works with the broadcasts degraded to
    * shuffle joins. */
  def collocations(df: DataFrame, textCol: String, window: Int,
      minPairCount: Long): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val ts = tokens(col(textCol))
    val pairArr = flatten(array((1 to window).map { d =>
      arrays_zip(
        slice(ts, lit(1), greatest(size(ts) - d, lit(0))),
        slice(ts, lit(d + 1), greatest(size(ts) - d, lit(0))))
    }: _*))
    val pairs = df.select(explode(pairArr).as("_p"))
      .select(col("_p")("0").as("tok_a"), col("_p")("1").as("tok_b"))
    val pairCounts = pairs.groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    val uni = df.select(explode(ts).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    pairCounts
      .join(broadcast(uni.select(col("token").as("tok_a"), col("n").as("n_a"))), Seq("tok_a"))
      .join(broadcast(uni.select(col("token").as("tok_b"), col("n").as("n_b"))), Seq("tok_b"))
      .select(col("tok_a"), col("tok_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("(2000000 * n_ab) DIV (n_a + n_b)").as("dice_micro"))
  }

  /** Per-document repetition metrics — the Gopher-style (Rae et al.
    * 2021) within-document repetition gates that catch degenerate /
    * machine-spun text before training:
    *  - `top_tok_n`: multiplicity of the most frequent token (run-length
    *    fold over the SORTED token array — O(n log n) row-local, no
    *    per-distinct-token rescan);
    *  - `max_run`: longest run of one token repeated CONSECUTIVELY
    *    (same fold, unsorted array — the "aaaa" spam signal);
    *  - `rep2/rep3/rep5`: repeated n-gram instances (total n-grams minus
    *    distinct n-grams) for n = 2, 3, 5;
    *  - `top_frac`, `rep3_frac`: the ratio forms thresholds are set on.
    *
    * Everything is ARRAY-SIDE inside one projection: the 100 TB pass is
    * MAP-ONLY — text never shuffles, no explode, no per-doc aggregate.
    * Ratios are single IEEE divisions of exact int64 counts (correctly
    * rounded identically in any engine); all counts stay int64. */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.ArrayOps.bind
    // longest run of equal adjacent elements via an aggregate fold
    // carrying (prev, current run, best run)
    def maxRunOf(arr: Column): Column =
      aggregate(
        arr,
        struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
          lit(0L).as("best")),
        (acc, x) => {
          val run = when(acc.getField("prev").isNotNull &&
            acc.getField("prev") === x, acc.getField("run") + 1L)
            .otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
    def repCount(toks: Column, n: Int): Column = {
      val nGrams = when(size(toks) >= n, (size(toks) - (n - 1)).cast("long"))
        .otherwise(0L)
      nGrams - size(array_distinct(Dedup.shinglesOf(toks, n))).cast("long")
    }
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        bind(Dedup.tokens(col(textCol))) { toks =>
          val g3 = when(size(toks) >= 3, (size(toks) - 2).cast("long")).otherwise(0L)
          struct(
            size(toks).cast("long").as("n_tokens"),
            maxRunOf(array_sort(toks)).as("top_tok_n"),
            maxRunOf(toks).as("max_run"),
            repCount(toks, 2).as("rep2"),
            repCount(toks, 3).as("rep3"),
            repCount(toks, 5).as("rep5"),
            g3.as("_g3"))
        }.as("_p"))
      .select(col(idCol), col("_p.n_tokens").as("n_tokens"),
        col("_p.top_tok_n").as("top_tok_n"), col("_p.max_run").as("max_run"),
        col("_p.rep2").as("rep2"), col("_p.rep3").as("rep3"),
        col("_p.rep5").as("rep5"),
        (col("_p.top_tok_n") / col("_p.n_tokens")).as("top_frac"),
        when(col("_p._g3") > 0L, col("_p.rep3") / col("_p._g3"))
          .otherwise(lit(0.0)).as("rep3_frac"))
  }

  /** Persist the deterministic top-N vocabulary (count desc, token asc
    * tie-break) as a reusable artifact — the frozen token inventory
    * OOV-rate gates score against. One token-keyed count (the
    * vocabulary-build shuffle), a vocabulary-sized top-N, N rows
    * written. */
  def writeVocabArtifact(df: DataFrame, textCol: String, topN: Int,
      dir: String): Unit = {
    require(topN > 0 && topN <= 4096, "topN must be in [1, 4096]")
    df.filter(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(topN)
      .write.mode("overwrite").parquet(s"$dir/vocab")
  }

  /** Out-of-vocabulary rate per document against the STORED vocabulary:
    * the artifact (≤ topN rows, bounded) is collected at plan-build time
    * and folded into the row expression, so scoring is MAP-ONLY — text
    * never shuffles, and a stream scores each micro-batch against the
    * frozen vocabulary with no state store (the q101 stored-weights
    * shape). `oov_rate` is one IEEE division of exact int64 counts. */
  def oovScoreWithStoredVocab(df: DataFrame, idCol: String, textCol: String,
      dir: String): DataFrame = {
    val vocab = df.sparkSession.read.parquet(s"$dir/vocab")
      .select("token").collect().map(_.getString(0)).toSeq
    val toks = tokens(col(textCol))
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, x => !x.isin(vocab: _*))).cast("long").as("n_oov"))
      .withColumn("oov_rate", col("n_oov") / col("n_tokens"))
  }

  /** Per-document token-distribution (Shannon) entropy — the
    * low-entropy gate that catches keyword-stuffing / boilerplate spam
    * whose repetition metrics (q111) look normal because no single
    * run or n-gram dominates.
    *
    * Portability design: with per-token counts c over n tokens,
    *   H = Σ −(c/n)·ln(c/n) = (1/n)·Σ c·(ln n − ln c),
    * and each ln is quantized ONCE to integer micro-nats
    * (lnq(x) = floor(ln(x)·10⁶ + ½)), so the inner sum is pure int64
    * arithmetic — associative, order-free, bitwise-reproducible in the
    * oracle; the only float ops shared with DuckDB are ln over small
    * integer counts (the q98 argument) and two final IEEE divisions.
    * `norm_entropy` = H / ln(n_distinct) ∈ [0,1] when n_distinct > 1.
    *
    * Scale shape (100 TB): ONE map-only projection — the token array
    * is sorted per row and equal-run lengths fold into the entropy sum
    * array-side (the q111 sorted-run trick), so text never explodes
    * and never shuffles; the plan has zero exchanges. */
  def entropyProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.ArrayOps.bind
    def lnq(x: Column): Column = floor(log(x.cast("double")) * 1e6 + 0.5).cast("long")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        bind(array_sort(tokens(col(textCol)))) { arr =>
          bind(size(arr).cast("long")) { n =>
            // fold over the sorted array: close out each equal-run of
            // length c with its term c·(lnq(n) − lnq(c))
            def term(c: Column): Column = c * (lnq(n) - lnq(c))
            val emic = aggregate(
              arr,
              struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
                lit(0L).as("acc")),
              (a, x) => {
                val same = a.getField("prev").isNotNull && a.getField("prev") === x
                struct(x.as("prev"),
                  when(same, a.getField("run") + 1L).otherwise(1L).as("run"),
                  when(same, a.getField("acc"))
                    .otherwise(a.getField("acc") +
                      when(a.getField("prev").isNotNull, term(a.getField("run")))
                        .otherwise(0L)).as("acc"))
              },
              a => a.getField("acc") +
                when(a.getField("run") > 0L, term(a.getField("run"))).otherwise(0L))
            struct(n.as("n_tokens"),
              size(array_distinct(arr)).cast("long").as("n_distinct"),
              emic.as("emic"))
          }
        }.as("_e"))
      .select(col(idCol),
        col("_e.n_tokens").as("n_tokens"),
        col("_e.n_distinct").as("n_distinct"),
        (col("_e.emic").cast("double") /
          (col("_e.n_tokens").cast("double") * 1e6)).as("entropy_nats"),
        when(col("_e.n_distinct") > 1L,
          col("_e.emic").cast("double") /
            (col("_e.n_tokens").cast("double") *
              floor(log(col("_e.n_distinct").cast("double")) * 1e6 + 0.5)))
          .otherwise(lit(0.0)).as("norm_entropy"))
  }

  /** Full per-document profile frame. */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val scores = langScores(t).toSeq.sortBy(_._1)
    val base = df.select(
      Seq(col(idCol),
        tokenCount(t).as("n_tokens"),
        distinctTokenCount(t).as("n_distinct"),
        alnumRunCount(t).as("n_alnum_runs"),
        avgTokenLen(t).as("avg_token_len"),
        qualityScore(t).as("quality"),
        langId(t).as("lang_pred"),
        bagFingerprint(t).as("fingerprint")) ++
        scores.map { case (lang, s) => s.as(s"score_$lang") }: _*)
    base
  }
}
