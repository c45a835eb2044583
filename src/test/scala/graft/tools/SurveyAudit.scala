package graft

import java.nio.file.{Files, Paths}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Machine-check of SURVEY.md's measured-state headline claims against
  * the committed artifacts (round-13 verdict item 7 — "gates beat
  * prose": round 12 found a narrated number that had drifted from its
  * artifact, and the BNLJ allowlist gate has already proven the
  * pattern). The SURVEY carries one fenced MEASURED-STATE block; this
  * tool REGENERATES every line in it from the code + committed
  * artifacts and fails on any difference.
  *
  * Usage:
  *   sbt "Test/runMain graft.SurveyAudit"          # verify, fail on drift
  *   sbt "Test/runMain graft.SurveyAudit --write"  # rewrite the block
  *
  * No SparkSession needed — the query inventory is a pure registry
  * read and the artifacts are committed JSON. */
object SurveyAudit {

  val Begin = "<!-- MEASURED-STATE (regenerate: sbt \"Test/runMain graft.SurveyAudit --write\"; verified by the no-arg run) -->"
  val End = "<!-- /MEASURED-STATE -->"

  private def num(v: JValue): Double = v match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JDecimal(d) => d.toDouble
    case other => sys.error(s"not a number: $other")
  }

  /** The block content, derived — never typed by hand. */
  def expectedBlock(): String = {
    val declared = SparkEntry.queries.size
    val oracled = SparkEntry.oracleSql.size
    val bench = JsonMethods.parse(
      Files.readString(Paths.get("docs/BENCH_FULL.json")))
    val benchTotal = num(bench \ "value")
    val benchControl = num(bench \ "control_total")
    val JObject(benchQ) = (bench \ "queries"): @unchecked
    def sweepLine(path: String, label: String): String = {
      val s = JsonMethods.parse(Files.readString(Paths.get(path)))
      val JObject(qs) = (s \ "queries"): @unchecked
      val headline = num(s \ "max_ratio_vs_committed")
      // a query added after the last committed baseline has no
      // ratio_vs_committed yet (its sweep row carries ratio_warm only)
      // and by construction cannot carry the committed-ratio headline
      val argmax = qs.maxBy { case (_, v) =>
        v \ "ratio_vs_committed" match {
          case JNothing => Double.NegativeInfinity
          case other => num(other)
        }
      }._1
      f"- $label sweep (`$path`): ${qs.size} rows, max_ratio_vs_committed $headline%.2f ($argmax)"
    }
    Seq(
      s"$Begin",
      s"- declared queries: $declared ($oracled oracled + ${declared - oracled} rows-only)",
      f"- committed quiet-box bench (`docs/BENCH_FULL.json`): ${benchQ.size} queries, warm total $benchTotal%.3f s, control $benchControl%.3f s",
      sweepLine("docs/SCALE_SWEEP.json", "x10"),
      sweepLine("docs/SCALE_SWEEP_100X.json", "x100"),
      s"- BNLJ allowlist (PlanAudit): ${PlanAudit.bnljAllowlistSize} queries",
      s"$End").mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    val surveyPath = Paths.get("SURVEY.md")
    val survey = Files.readString(surveyPath)
    val expected = expectedBlock()
    val pattern = (java.util.regex.Pattern.quote(Begin) + "[\\s\\S]*?" +
      java.util.regex.Pattern.quote(End)).r
    if (args.contains("--write")) {
      val updated = pattern.findFirstIn(survey) match {
        case Some(_) => pattern.replaceFirstIn(survey,
          java.util.regex.Matcher.quoteReplacement(expected))
        case None => survey.stripTrailing() + "\n\n" + expected + "\n"
      }
      Files.writeString(surveyPath, updated)
      println("[survey-audit] MEASURED-STATE block written:")
      println(expected)
    } else {
      val actual = pattern.findFirstIn(survey).getOrElse(
        sys.error("SURVEY.md has no MEASURED-STATE block — run with --write"))
      require(actual == expected,
        s"SURVEY.md measured-state drifted from the artifacts.\n--- SURVEY says:\n$actual\n--- artifacts say:\n$expected\n" +
          "Re-run with --write after refreshing the artifacts (or fix the artifacts).")
      println("[survey-audit] MEASURED-STATE block matches the artifacts.")
    }
  }
}
