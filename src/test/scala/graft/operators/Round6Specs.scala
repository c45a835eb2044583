package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("globalRank equals the single-partition window row_number") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500)((rnd.nextInt(100000), rnd.nextDouble()))
      .zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
    val df = rows.toDF("id", "k", "v").repartition(7) // scrambled placement
    val got = Ranking.globalRank(df, Seq(col("v").desc, col("id").asc), 5)
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    val expected = df
      .withColumn("rnk", row_number().over(Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
      .select("id", "rnk").as[(Long, Long)].collect().toMap
    got shouldBe expected
  }

  test("globalRank is contiguous and 1-based even with empty range partitions") {
    // 10 rows into 32 requested partitions → most partitions empty
    val df = (1 to 10).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    val ranks = Ranking.globalRank(df, Seq(col("v").asc, col("id").asc), 32)
      .select("rnk").as[Long].collect().sorted
    ranks shouldBe (1L to 10L).toArray
  }

  test("data rows shuffle once; only the counts relation hits a single partition") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val df = (1 to 1000).map(i => (i.toLong, (i * 37 % 1000).toDouble)).toDF("id", "v")
    // AQE off for this assertion: its wrapper node hides the tree from
    // collect() until execution; the contract is the same either way
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ranked = Ranking.globalRank(df, Seq(col("v").asc, col("id").asc), 8)
      val plan = ranked.queryExecution.executedPlan
      val singles = plan.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning.numPartitions == 1 => e
      }
      // the only single-partition stage is the per-partition COUNTS
      // prefix-sum — every such exchange must sit above an aggregate
      // (metadata-sized input), never above raw data rows
      singles should not be empty
      singles.foreach { e =>
        e.child.collect { case a: BaseAggregateExec => a } should not be empty
      }
      val s = plan.toString
      s should include("rangepartitioning")
      // the rank branch and the counts branch consume the SAME range
      // exchange — ReuseExchange dedups it, so data shuffles once
      s should include("ReusedExchange")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}

class AnonymizeSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),
    (4L, "de", "b"), (5L, "de", "b"),
    (6L, "fr", "c")).toDF("id", "lang", "src")

  test("QI groups under k are masked, groups at/over k released") {
    val out = Anonymize.kAnonymize(df, Seq("lang", "src"), k = 3)
      .select("id", "lang", "src", "suppressed")
      .as[(Long, String, String, Boolean)].collect().sortBy(_._1)
    out.filter(_._1 <= 3).foreach { r =>
      r._2 shouldBe "en"; r._4 shouldBe false
    }
    out.filter(_._1 > 3).foreach { r =>
      r._2 shouldBe "*"; r._3 shouldBe "*"; r._4 shouldBe true
    }
  }

  test("every released (non-masked) QI combination has >= k rows") {
    val out = Anonymize.kAnonymize(df, Seq("lang", "src"), k = 2)
    val released = out.filter(!col("suppressed"))
      .groupBy("lang", "src").count().as[(String, String, Long)].collect()
    released.foreach(_._3 should be >= 2L)
  }

  test("dropResidual removes the masked rows when the residual group is under k") {
    // k=5: all six rows masked → residual 6 ≥ 5 → kept
    Anonymize.kAnonymize(df, Seq("lang", "src"), k = 5, dropResidual = true)
      .count() shouldBe 6
    // k=2: only fr/c masked (1 row) → residual 1 < 2 → dropped
    val out = Anonymize.kAnonymize(df, Seq("lang", "src"), k = 2, dropResidual = true)
    out.count() shouldBe 5
    out.filter(col("suppressed")).count() shouldBe 0
  }

  test("the corpus side plans a broadcast join, not a shuffle join") {
    val plan = Anonymize.kAnonymize(df, Seq("lang", "src"), k = 3)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }
}

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  test("delta-decoding the postings recovers the sorted doc-id list") {
    val df = Seq(
      (10L, "a b c"), (20L, "b c"), (35L, "c a"), (36L, "c")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(df, "doc_id", "text", minDf = 1)
      .as[(String, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    got("a") shouldBe ((2L, "10,25"))   // 10, 35 → gaps 10, 25
    got("b") shouldBe ((2L, "10,10"))   // 10, 20
    got("c") shouldBe ((4L, "10,10,15,1")) // 10, 20, 35, 36
    // decode check: cumulative sums reproduce the ids
    got.values.foreach { case (dfT, deltas) =>
      val ids = deltas.split(",").map(_.toLong).scanLeft(0L)(_ + _).tail
      ids.length shouldBe dfT
      ids.sorted shouldBe ids
    }
  }

  test("multiplicity inside one doc does not inflate df") {
    val df = Seq((1L, "x x x"), (2L, "x")).toDF("doc_id", "text")
    TextAnalysis.invertedIndex(df, "doc_id", "text", 1)
      .as[(String, Long, String)].collect() shouldBe Array(("x", 2L, "1,1"))
  }

  test("salted two-stage build is bit-identical, including on a hot stopword") {
    // "the" appears in EVERY doc — the df-heavy shape whose posting
    // stream the salted build splits across (token, salt) reducers
    val rnd = new scala.util.Random(108)
    val vocab = (0 until 20).map(i => s"w$i")
    val docs = (1L to 200L).map { id =>
      (id, ("the" +: Seq.fill(6)(vocab(rnd.nextInt(vocab.size)))).mkString(" "))
    }.toDF("doc_id", "text")
    for (minDf <- Seq(1, 5); salts <- Seq(1, 4, 16)) {
      val plain = TextAnalysis.invertedIndex(docs, "doc_id", "text", minDf)
        .orderBy("token").as[(String, Long, String)].collect()
      val salted = TextAnalysis
        .invertedIndexSalted(docs, "doc_id", "text", minDf, nSalts = salts)
        .orderBy("token").as[(String, Long, String)].collect()
      withClue(s"minDf=$minDf salts=$salts: ") { salted shouldBe plain }
    }
    // the plan is genuinely two-stage: two shuffles, first keyed on
    // (token, salt) so no single reducer sees a stopword's full stream
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = TextAnalysis.invertedIndexSalted(docs, "doc_id", "text", 1, 16)
      .queryExecution.executedPlan
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    val exchanges = root.collect { case e: ShuffleExchangeExec => e }
    exchanges should have size 2
    // stage-1 partitioning (deepest exchange, listed last) carries TWO
    // keys: token plus the salt (Catalyst shows it as an aliased
    // grouping expression)
    exchanges.last.outputPartitioning.toString should fullyMatch regex
      """hashpartitioning\(token#\d+, [^,]+, \d+\)"""
  }
}

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("window-2 pairs and Dice micro-score match hand computation") {
    val df = Seq((1L, "a b a b")).toDF("id", "text")
    // d=1 zips [a,b,a]×[b,a,b] → (a,b) (b,a) (a,b);  d=2 → (a,a) (b,b)
    val got = CollocHelper.run(df, spark)
    got(("a", "b")) shouldBe ((2L, 2L, 2L, (2000000L * 2) / 4))
    got(("b", "a")) shouldBe ((1L, 2L, 2L, (2000000L * 1) / 4))
    got(("a", "a")) shouldBe ((1L, 2L, 2L, (2000000L * 1) / 4))
    got(("b", "b")) shouldBe ((1L, 2L, 2L, (2000000L * 1) / 4))
  }

  test("minPairCount prunes the tail") {
    val df = Seq((1L, "a b a b"), (2L, "a b")).toDF("id", "text")
    val got = TextAnalysis.collocations(df, "text", window = 2, minPairCount = 3)
      .select("tok_a", "tok_b").as[(String, String)].collect()
    got shouldBe Array(("a", "b")) // n_ab = 3, everything else < 3
  }
}

private object CollocHelper {
  def run(df: org.apache.spark.sql.DataFrame, spark: org.apache.spark.sql.SparkSession)
      : Map[(String, String), (Long, Long, Long, Long)] = {
    import spark.implicits._
    TextAnalysis.collocations(df, "text", window = 2, minPairCount = 1)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
  }
}

class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "s1", "t t t t"), (2L, "s1", "t t t"), (3L, "s1", "t t"),
    (4L, "s2", "t")).toDF("doc_id", "source", "text")

  test("kept set is the hash-priority prefix; budget is greedy (overshoot <= 1 doc)") {
    val budget = 5L
    val kept = Sampling.tokenBudgetPerGroup(docs, "source", "doc_id", "text", budget)
      .select("doc_id", "source", "n_tokens", "tokens_before")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    // every kept doc started under budget
    kept.foreach(_._4 should be < budget)
    // group totals: each source's kept prefix covers >= budget or the whole group
    val bySource = kept.groupBy(_._2)
    bySource("s2").map(_._3).sum shouldBe 1L // whole group under budget
    val s1 = bySource("s1")
    (s1.map(_._3).sum + 0L) should be >= math.min(budget, 9L)
  }

  test("selection is stable under append: old decisions never change") {
    val before = Sampling.tokenBudgetPerGroup(docs, "source", "doc_id", "text", 5L)
      .select("doc_id", "tokens_before").as[(Long, Long)].collect().toMap
    val appended = docs.union(Seq((99L, "s3", "t t")).toDF("doc_id", "source", "text"))
    val after = Sampling.tokenBudgetPerGroup(appended, "source", "doc_id", "text", 5L)
      .select("doc_id", "tokens_before").as[(Long, Long)].collect().toMap
    // a new doc in a NEW group can't touch s1/s2 decisions at all
    before.foreach { case (id, tb) => after(id) shouldBe tb }
    after.keySet should contain(99L)
  }
}
