package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{ExactAgg, PortableHash}
import graft.operators.{Decontaminate, Sampling, TextAnalysis}
import graft.queries.Tables.t

/** Round-3 coverage widening, part 2 — the corpus-curation stages a
  * training-data pipeline runs between dedup and tokenization:
  * train/test decontamination, per-domain quota capping, vocabulary
  * building, fixed-size sequence chunking — plus two relational-surface
  * completions (exact-sum second-moment statistics, CUBE). Oracle
  * discipline unchanged: portable hashes, exact decimal sums, total
  * ORDER BYs, deterministic tie-breaks.
  */
object CurationQueries {

  /** n=5 w-shingle list in DuckDB (q31's pattern generalized). */
  private def shingleListSql(toks: String, n: Int): String = {
    val parts = (0 until n).map(j => s"$toks[i+$j]").mkString(", ")
    s"""CASE WHEN len($toks) >= $n
       THEN list_transform(range(1, len($toks) - ${n - 2}), i -> concat_ws(' ', $parts))
       ELSE [] END"""
  }

  /** Train/test decontamination: corpus docs (doc_id % 53 ≠ 0) that
    * share NO 5-gram with the held-out split (doc_id % 53 = 0). */
  private val q44 = {
    val n = 5
    Q(
      "q44_decontaminate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Decontaminate.clean(
          docs.filter(col("doc_id") % 53 =!= 0), "doc_id", "text",
          docs.filter(col("doc_id") % 53 === 0), "text", n)
          .select("doc_id", "lang", "source")
          .orderBy("doc_id")
      },
      Some(s"""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 53 <> 0),
        ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
        cg AS (SELECT doc_id, ${PortableHash.md5Hash32Sql("unnest(list_distinct(" + shingleListSql("toks", n) + "))")} AS gram_hash FROM ct),
        tt AS (SELECT string_split(text, ' ') AS toks FROM documents WHERE doc_id % 53 = 0),
        tg AS (SELECT DISTINCT ${PortableHash.md5Hash32Sql("unnest(list_distinct(" + shingleListSql("toks", n) + "))")} AS gram_hash FROM tt),
        bad AS (SELECT DISTINCT cg.doc_id FROM cg JOIN tg USING (gram_hash))
        SELECT doc_id, lang, source FROM corpus c
        WHERE NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = c.doc_id)
        ORDER BY doc_id""".replaceAll("\\s+", " ")))
  }

  /** Per-source quota: at most 15 docs per source, hash-priority
    * deterministic survivors. */
  private val q45 = Q(
    "q45_domain_quota",
    (s, dir) => Sampling.capPerGroup(t(s, dir, "documents"), "source", "doc_id", 15)
      .select("doc_id", "source")
      .orderBy("doc_id"),
    Some(s"""WITH r AS (SELECT doc_id, source,
        row_number() OVER (PARTITION BY source
          ORDER BY ${PortableHash.md5Hash32Sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn
        FROM documents)
      SELECT doc_id, source FROM r WHERE rn <= 15 ORDER BY doc_id"""
      .replaceAll("\\s+", " ")))

  /** Corpus vocabulary: top-100 terms by document frequency with stable
    * ids (df desc, term asc). */
  private val q46 = Q(
    "q46_vocab_topn",
    (s, dir) => TextAnalysis.vocabulary(t(s, dir, "documents"), "doc_id", "text", 100)
      .orderBy("vocab_id"),
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      pd AS (SELECT tok, doc_id, count(*) AS tf_d FROM toks GROUP BY 1, 2),
      st AS (SELECT tok, CAST(sum(tf_d) AS BIGINT) AS tf, count(*) AS df_t FROM pd GROUP BY 1),
      r AS (SELECT tok, tf, df_t,
        CAST(row_number() OVER (ORDER BY df_t DESC, tok) AS BIGINT) AS vocab_id FROM st)
      SELECT vocab_id, tok, tf, df_t FROM r WHERE vocab_id <= 100 ORDER BY vocab_id"""
      .replaceAll("\\s+", " ")))

  /** Exact-sum second moments per group: stddev/variance/covariance/
    * correlation, bitwise-portable via decimal sums + identical double
    * trees (see ExactAgg) — the built-ins' streaming merge formulas are
    * association-order-dependent and NOT portable. */
  private val q47 = Q(
    "q47_stats_moments",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        ExactAgg.stddevSamp2(col("l_quantity")).as("std_qty"),
        ExactAgg.varSamp2(col("l_quantity")).as("var_qty"),
        ExactAgg.covarSamp2(col("l_quantity"), col("l_extendedprice")).as("covar_qp"),
        ExactAgg.corr4(col("l_quantity"), col("l_extendedprice")).as("corr_qp"))
      .orderBy("l_returnflag"),
    Some(s"""SELECT l_returnflag, count(*) AS n,
      ${ExactAgg.stddevSamp2Sql("l_quantity")} AS std_qty,
      ${ExactAgg.varSamp2Sql("l_quantity")} AS var_qty,
      ${ExactAgg.covarSamp2Sql("l_quantity", "l_extendedprice")} AS covar_qp,
      ${ExactAgg.corr4Sql("l_quantity", "l_extendedprice")} AS corr_qp
      FROM lineitem GROUP BY 1 ORDER BY 1""".replaceAll("\\s+", " ")))

  /** Fixed 32-token sequence chunking (context-window packing). */
  private val q48 = Q(
    "q48_fixed_chunks",
    (s, dir) => TextAnalysis.chunk(t(s, dir, "documents"), "doc_id", "text", 32)
      .orderBy("doc_id", "chunk_id"),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      p AS (SELECT doc_id, CAST(unnest(range(len(toks))) AS BIGINT) AS pos, unnest(toks) AS tok FROM t)
      SELECT doc_id, pos // 32 AS chunk_id, CAST(count(*) AS BIGINT) AS n_tokens,
        string_agg(tok, ' ' ORDER BY pos) AS chunk_text
      FROM p GROUP BY doc_id, pos // 32
      ORDER BY doc_id, chunk_id""".replaceAll("\\s+", " ")))

  /** CUBE over (o_orderstatus, o_orderpriority): all four grouping
    * levels in one Expand pass — completes q34's ROLLUP. */
  private val q49 = Q(
    "q49_cube",
    (s, dir) => t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        ExactAgg.sum2(col("o_totalprice")).as("sum_price"))
      .select(
        col("gid"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        col("n"), col("sum_price"))
      .orderBy("gid", "st", "pri"),
    Some(s"""SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
      coalesce(o_orderstatus, 'ALL') AS st, coalesce(o_orderpriority, 'ALL') AS pri,
      count(*) AS n, ${ExactAgg.sum2Sql("o_totalprice")} AS sum_price
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY 1, 2, 3""".replaceAll("\\s+", " ")))

  val all: Seq[Q] = Seq(q44, q45, q46, q47, q48, q49)
}
