package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RepetitionProfileSpec extends SparkSpec {
  import spark.implicits._

  test("known document: counts, runs and ratios") {
    val df = Seq((1L, "a a a b a c c")).toDF("id", "text")
    val r = TextAnalysis.repetitionProfile(df, "id", "text").head
    r.getAs[Long]("n_tokens") shouldBe 7L
    r.getAs[Long]("top_tok_n") shouldBe 4L // 'a' appears 4 times
    r.getAs[Long]("max_run") shouldBe 3L // "a a a"
    r.getAs[Long]("rep2") shouldBe 1L // "a a" twice among 6 bigrams
    r.getAs[Long]("rep3") shouldBe 0L
    r.getAs[Long]("rep5") shouldBe 0L
    r.getAs[Double]("top_frac") shouldBe (4.0 / 7.0)
    r.getAs[Double]("rep3_frac") shouldBe 0.0
  }

  test("single-token and sub-n documents degrade to zero rep counts") {
    val df = Seq((1L, "x"), (2L, "x y")).toDF("id", "text")
    val rows = TextAnalysis.repetitionProfile(df, "id", "text")
      .orderBy("id").collect()
    rows(0).getAs[Long]("max_run") shouldBe 1L
    rows(0).getAs[Long]("rep2") shouldBe 0L
    rows(0).getAs[Double]("rep3_frac") shouldBe 0.0
    rows(1).getAs[Long]("rep2") shouldBe 0L
  }

  test("matches the explode-based brute force on random documents") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d")
    val docs = (0L until 60L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("id", "text")
    val got = TextAnalysis.repetitionProfile(df, "id", "text")
      .select("id", "top_tok_n", "max_run", "rep3").as[(Long, Long, Long, Long)]
      .collect().map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val top = toks.groupBy(identity).values.map(_.length).max.toLong
      val maxRun = {
        var best = 0; var run = 0; var prev: String = null
        toks.foreach { t =>
          run = if (t == prev) run + 1 else 1
          prev = t; best = math.max(best, run)
        }
        best.toLong
      }
      val grams3 = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      val rep3 = (grams3.size - grams3.distinct.size).toLong
      got(id) shouldBe (top, maxRun, rep3)
    }
  }

  test("scoring is map-only: no exchange in the plan") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = Seq((1L, "a b a")).toDF("id", "text")
    val plan = TextAnalysis.repetitionProfile(df, "id", "text")
      .queryExecution.executedPlan
    plan.collect { case e: ShuffleExchangeExec => e } shouldBe empty
  }
}

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark joins data with spark"),
    (2L, "vector search over spark"),
    (3L, "plain prose about nothing"),
    (4L, "customer spark spark spark spark"),
    (5L, "vector vector customer")).toDF("doc_id", "text")

  test("native TermCounts equals the per-term filter counts bit-for-bit") {
    val rnd = new scala.util.Random(29)
    val vocab = Seq("spark", "vector", "customer", "x", "y", "déjà", "")
    val docs = ((1 to 80).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } :+ (97L, "") :+ (98L, "spark  spark")).toDF("doc_id", "text")
    val terms = Seq("spark", "vector", "customer")
    val toks = split(col("text"), " ")
    val diff = docs.select(
        graft.functions.TermCounts.of(toks, terms).as("native"),
        array(terms.map(t =>
          org.apache.spark.sql.functions.size(
            filter(toks, x => x === lit(t))).cast("long")): _*).as("composed"))
      .filter(!(col("native") <=> col("composed")))
    diff.count() shouldBe 0L
  }

  test("bm25TopK ranks term-dense docs first and drops no-hit docs") {
    val res = Retrieval
      .bm25TopK(corpus, "doc_id", "text", Seq("spark", "vector"), 10)
      .select("doc_id", "score_micro").as[(Long, Long)].collect()
    res.map(_._1) should not contain 3L // no query term
    res.foreach(_._2 should be > 0L)
    // scores arrive ranked descending (doc_id tiebreak)
    res.map(_._2).toSeq shouldBe res.map(_._2).toSeq.sorted.reverse
  }

  test("rarer term earns higher idf: one rare hit beats one common hit") {
    // 'customer' in 2/5 docs, 'spark' in 3/5 — same tf, same dl
    val df = Seq(
      (1L, "customer x y"), (2L, "spark x y"),
      (3L, "spark a b"), (4L, "spark customer c"), (5L, "z z z")
    ).toDF("doc_id", "text")
    val m = Retrieval.bm25TopK(df, "doc_id", "text", Seq("spark", "customer"), 10)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    m(1L) should be > m(2L)
  }

  test("stored-index probe returns exactly the inline result") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retr").toString
    Retrieval.writeRetrievalIndex(spark, corpus, "doc_id", "text", dir)
    val inline = Retrieval
      .bm25TopK(corpus, "doc_id", "text", Seq("spark", "vector", "customer"), 10)
      .select("doc_id", "n_tokens", "score_micro")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val stored = Retrieval
      .bm25TopKStored(spark, dir, Seq("spark", "vector", "customer"), 10)
      .select(col("id"), col("n_tokens"), col("score_micro"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    stored shouldBe inline
  }

  test("probe pushes the token predicate into the postings scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retr2").toString
    Retrieval.writeRetrievalIndex(spark, corpus, "doc_id", "text", dir)
    // AQE's wrapper hides the scan subtree from toString until
    // execution; the pushdown contract is the same either way
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Retrieval.bm25TopKStored(spark, dir, Seq("spark", "vector"), 5)
        .queryExecution.executedPlan.toString
      plan should include("PushedFilters")
      plan should include("In(token")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("postings are gap-encoded over id-sorted lists") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retr3").toString
    Retrieval.writeRetrievalIndex(spark, corpus, "doc_id", "text", dir)
    val row = spark.read.parquet(s"$dir/postings")
      .filter(col("token") === "spark")
      .select(col("df_t"), col("postings.gap")).head
    row.getLong(0) shouldBe 3L // docs 1, 2, 4
    row.getSeq[Long](1) shouldBe Seq(1L, 1L, 2L) // gaps for ids 1, 2, 4
    // and absolute ids rebuild by prefix sum
    row.getSeq[Long](1).scanLeft(0L)(_ + _).drop(1) shouldBe Seq(1L, 2L, 4L)
  }

  test("native in-row gap decode equals the window-form decode on a stored index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retr_dec").toString
    val first = corpus.filter(col("doc_id") <= 3)
    Retrieval.writeRetrievalIndex(spark, first, "doc_id", "text", dir)
    Retrieval.appendToRetrievalIndex(spark, dir,
      corpus.filter(col("doc_id") > 3), "doc_id", "text")
    val posts = spark.read.parquet(s"$dir/postings") // multi-segment
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select("token", "id", "tf", "df_t", "_seg")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    rows(Retrieval.decodeSegments(posts)) shouldBe
      rows(Retrieval.decodeSegmentsComposed(posts))
  }

  test("segment append equals a from-scratch build; compaction preserves the probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retr4").toString
    val first = corpus.filter(col("doc_id") <= 3)
    val rest = corpus.filter(col("doc_id") > 3)
    Retrieval.writeRetrievalIndex(spark, first, "doc_id", "text", dir)
    Retrieval.appendToRetrievalIndex(spark, dir, rest, "doc_id", "text")
    // two segments on disk, original untouched
    spark.read.parquet(s"$dir/postings").select("seg").distinct().count() shouldBe 2L
    val terms = Seq("spark", "vector", "customer")
    def probe() = Retrieval.bm25TopKStored(spark, dir, terms, 10)
      .select(col("id"), col("score_micro")).as[(Long, Long)].collect().sortBy(_._1)
    val segmented = probe()
    val fullDir = java.nio.file.Files.createTempDirectory("graft_retr5").toString
    Retrieval.writeRetrievalIndex(spark, corpus, "doc_id", "text", fullDir)
    val full = Retrieval.bm25TopKStored(spark, fullDir, terms, 10)
      .select(col("id"), col("score_micro")).as[(Long, Long)].collect().sortBy(_._1)
    segmented shouldBe full
    Retrieval.compactRetrievalIndex(spark, dir)
    spark.read.parquet(s"$dir/postings").select("seg").distinct().count() shouldBe 1L
    probe() shouldBe full
  }

  test("a rebuild clears appended segments: no phantom postings survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retr7").toString
    val first = corpus.filter(col("doc_id") <= 3)
    Retrieval.writeRetrievalIndex(spark, first, "doc_id", "text", dir)
    Retrieval.appendToRetrievalIndex(spark, dir,
      corpus.filter(col("doc_id") > 3), "doc_id", "text")
    // REBUILD on the smaller corpus: seg=1 from the append must not
    // survive (it would silently inflate tf/df in every later probe)
    Retrieval.writeRetrievalIndex(spark, first, "doc_id", "text", dir)
    spark.read.parquet(s"$dir/postings").select("seg").distinct().count() shouldBe 1L
    val terms = Seq("spark", "vector", "customer")
    val rebuilt = Retrieval.bm25TopKStored(spark, dir, terms, 10)
      .select(col("id"), col("score_micro")).as[(Long, Long)].collect().sortBy(_._1)
    val freshDir = java.nio.file.Files.createTempDirectory("graft_retr8").toString
    Retrieval.writeRetrievalIndex(spark, first, "doc_id", "text", freshDir)
    val fresh = Retrieval.bm25TopKStored(spark, freshDir, terms, 10)
      .select(col("id"), col("score_micro")).as[(Long, Long)].collect().sortBy(_._1)
    rebuilt shouldBe fresh
  }

  test("appending overlapping or duplicate ids is refused") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retr6").toString
    Retrieval.writeRetrievalIndex(spark, corpus, "doc_id", "text", dir)
    val overlapping = Seq((5L, "late arrival")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Retrieval.appendToRetrievalIndex(spark, dir, overlapping, "doc_id", "text")
    val dup = Seq((7L, "x"), (7L, "y")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Retrieval.appendToRetrievalIndex(spark, dir, dup, "doc_id", "text")
  }

  test("stream scoring against the stored index is stateless and equals inline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_retr7").toString
    Retrieval.writeRetrievalIndex(spark, corpus, "doc_id", "text", dir)
    val terms = Seq("spark", "vector")
    val inline = Retrieval.bm25TopK(corpus, "doc_id", "text", terms, 10)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    val in = MemoryStream[(Long, String)]
    val q = Retrieval
      .bm25ScoreStream(in.toDF().toDF("doc_id", "text"), "doc_id", "text", dir, terms)
      .writeStream.format("memory").queryName("t_bm25")
      .outputMode(OutputMode.Append()).start()
    // replay the corpus docs through the stream in two micro-batches
    in.addData((1L, "spark joins data with spark"), (2L, "vector search over spark"))
    q.processAllAvailable()
    in.addData((4L, "customer spark spark spark spark"), (5L, "vector vector customer"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_bm25")
      .filter(col("score_micro") > 0)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    streamed shouldBe inline.filter { case (id, _) => Set(1L, 2L, 4L, 5L)(id) }
  }

  test("query terms absent from the corpus contribute nothing") {
    val res = Retrieval
      .bm25TopK(corpus, "doc_id", "text", Seq("zzz_missing", "spark"), 10)
      .select("doc_id").as[Long].collect().toSet
    res shouldBe Set(1L, 2L, 4L)
  }
}
