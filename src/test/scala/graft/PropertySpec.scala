package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, ModeAgg, RollingWindow}

/** Property tests (SURVEY.md §5.3): engine operators vs brute-force
  * models on ScalaCheck-generated inputs. Sampling is driven manually
  * with fixed seeds (the scalatest⇄scalacheck bridge artifact is not in
  * the offline cache) — deterministic, and each case still explores
  * ties, empties, and skew. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default.withSize(40), Seed(i.toLong)))

  test("property: mode(argmax-struct) == brute-force mode incl. ties") {
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("g1", "g2", "g3"), Gen.oneOf("a", "b", "c", "d")))
    samples(gen, 8).foreach { rows =>
      val df = rows.toDF("k", "v")
      val got = ModeAgg.mode(df, Seq("k"), "v", "m").as[(String, String)].collect().toMap
      val expected = rows.groupBy(_._1).map { case (k, vs) =>
        val counts = vs.groupBy(_._2).view.mapValues(_.size)
        k -> counts.maxBy { case (v, c) => (c, v) }._1
      }
      withClue(s"rows=$rows: ") { got shouldBe expected }
    }
  }

  test("property: native Md5Hash32 == conv(substring(md5,1,8),16,10) in codegen and lambda paths") {
    val gen = Gen.listOfN(40, Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.listOfN(6, Gen.oneOf("€", "ß", "中", "🙂", "a", " ")).map(_.mkString)))
    samples(gen, 5).foreach { strs =>
      val df = (strs :+ "").toDF("s")
      // codegen'd projection path
      val proj = df.select(
        graft.functions.PortableHash.md5Hash32(col("s")).as("native"),
        conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("composed"))
      proj.collect().foreach(r => r.getLong(0) shouldBe r.getLong(1))
      // interpreted path: inside a higher-order lambda (the hot loop the
      // native expression exists for)
      val lam = df.select(
        element_at(transform(array(col("s")),
          v => graft.functions.PortableHash.md5Hash32(v)), 1).as("native"),
        element_at(transform(array(col("s")),
          v => conv(substring(md5(v), 1, 8), 16, 10).cast("long")), 1).as("composed"))
      lam.collect().foreach(r => r.getLong(0) shouldBe r.getLong(1))
    }
    // null in → null out
    Seq[Option[String]](None).toDF("s")
      .select(graft.functions.PortableHash.md5Hash32(col("s")))
      .collect().head.isNullAt(0) shouldBe true
  }

  test("property: native CharWindowSums == composed split+ascii+fold on adversarial inputs") {
    // the real-codec seam contract: whatever payload a swapped-in
    // decoder produces, the native window-sum expression must equal
    // the composed reference — including supplementary-plane code
    // points (𝄞/🙂 count ONE position each), combining marks, payloads
    // shorter than dim (window clamps to 1), exactly dim, dim±1, and
    // empty/whitespace-only strings
    import graft.operators.Multimodal
    val atoms = Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.listOfN(9, Gen.oneOf("𝄞", "🙂", "é", "中", "ß", "a", " "))
        .map(_.mkString),
      Gen.choose(0, 40).map("x" * _))
    for (dim <- Seq(1, 4, 16)) {
      val strs = samples(atoms, 8) ++
        Seq("", " ", "a" * (dim - 1 max 1), "a" * dim, "a" * (dim + 1), "𝄞" * dim)
      val df = strs.toDF("s")
      val both = df.select(
        Multimodal.stubFeaturesMicro(col("s"), dim).as("native"),
        Multimodal.stubFeaturesMicroComposed(col("s"), dim).as("composed"))
        .as[(Seq[Long], Seq[Long])].collect()
      both.zip(strs).foreach { case ((n, c), s) =>
        withClue(s"dim=$dim input=${s.take(30)}: ") { n shouldBe c }
      }
    }
    // null in → null out, and a non-string child fails at ANALYSIS time
    // (ExpectsStringInput), not as a codegen ClassCastException
    Seq[Option[String]](None).toDF("s")
      .select(Multimodal.stubFeaturesMicro(col("s"), 4))
      .collect().head.isNullAt(0) shouldBe true
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val mistyped = ColumnBridge.column(graft.functions.CharWindowSums(
      ColumnBridge.expression(col("s")), 4)) // no string cast
    an[org.apache.spark.sql.AnalysisException] should be thrownBy
      Seq(1L).toDF("s").select(mistyped).collect()
  }

  test("property: rolling forward range sum == per-row filtered sums") {
    val gen = Gen.nonEmptyListOf(Gen.choose(0L, 500L))
    samples(gen, 8).foreach { ts =>
      val rows = ts.distinct.zipWithIndex.map { case (t, i) => (i.toLong, t, (i + 1).toDouble) }
      val df = rows.toDF("id", "ts_unix", "v")
      val got = RollingWindow.forwardGlobal(df, "ts_unix", 100L, ("sum", "v"))
        .select("id", "sum_v_100s").as[(Long, Double)].collect().toMap
      val expected = rows.map { case (i, t, _) =>
        i -> rows.collect { case (_, u, v) if u >= t && u <= t + 100L => v }.sum
      }.toMap
      withClue(s"ts=$ts: ") { got shouldBe expected }
    }
  }

  test("property: partitioned rolling window == global window on random data") {
    val gen = Gen.nonEmptyListOf(Gen.choose(0L, 2000L))
    samples(gen, 6).foreach { ts =>
      val rows = ts.distinct.zipWithIndex.map { case (t, i) => (i.toLong, t, (i + 1).toDouble) }
      val df = rows.toDF("id", "ts_unix", "v")
      val global = RollingWindow.forwardGlobal(df, "ts_unix", 300L, ("sum", "v"))
        .select("id", "sum_v_300s").as[(Long, Double)].collect().toMap
      val parted = RollingWindow.forwardPartitioned(df, "ts_unix", 300L, "sum", "v", 300L)
        .select("id", "sum_v_300s").as[(Long, Double)].collect().toMap
      withClue(s"ts=$ts: ") { parted shouldBe global }
    }
  }

  test("property: exact dedup keep/count == brute-force grouping") {
    val gen = Gen.nonEmptyListOf(Gen.oneOf("x", "y z", "w w w", ""))
    samples(gen, 8).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("id", "text")
      val got = Dedup.exact(df, "id", "text")
        .select("keep_id", "dup_count").as[(Long, Long)].collect().toSet
      val expected = docs.groupBy(_._2).values
        .map(g => (g.map(_._1).min, g.size.toLong)).toSet
      withClue(s"texts=$texts: ") { got shouldBe expected }
    }
  }

  test("ExactAgg.avg2/avgExact: values the decimal cast drops are excluded from BOTH sides") {
    // NaN and |x| >= 1e12 fail try_cast(DECIMAL(18,6)): they must not
    // count toward the denominator either — avg of the INCLUDED values
    val df = Seq(1.0, 3.0, Double.NaN, 2e12).toDF("v")
    val (a2, ax) = df.agg(
      graft.functions.ExactAgg.avg2(col("v")),
      graft.functions.ExactAgg.avgExact(col("v"))).as[(Double, Double)].head()
    a2 shouldBe 2.0
    ax shouldBe 2.0
  }

  test("property: SortedIntersectSize == distinct-set intersection size") {
    // inputs are sorted but NOT deduplicated — the merge must enforce
    // set semantics itself (duplicates on both sides count once)
    val arrGen = Gen.listOf(Gen.choose(0, 30).map(i => s"t$i"))
    val cases = samples(Gen.zip(arrGen, arrGen), 40)
    val rows = cases.map { case (a, b) =>
      (a.sorted, b.sorted)
    }
    val df = rows.toDF("a", "b")
    val got = df.select(
      graft.functions.ArrayOps.sortedIntersectSize(col("a"), col("b")).as("n"))
      .as[Int].collect()
    val expected = rows.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    got.toSeq shouldBe expected
  }

  test("intersect kernel: interpreted eval handles nulls, dup runs, empties") {
    // Drives nullSafeEval directly (the non-codegen path the unsafe
    // fast path falls back from) through Literal-backed generic arrays.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    def arr(xs: Seq[String]): Literal =
      Literal.create(xs, ArrayType(StringType, containsNull = true))
    def run(a: Seq[String], b: Seq[String]): Int =
      graft.functions.SortedIntersectSize(arr(a), arr(b))
        .eval(null).asInstanceOf[Int]
    run(Seq("a", "b", "c"), Seq("b", "c", "d")) shouldBe 2
    run(Seq("a", "a", "b", "b"), Seq("a", "b", "b")) shouldBe 2 // dup runs count once
    run(Seq.empty, Seq("a")) shouldBe 0
    run(Seq("a", "b", null), Seq("a", null)) shouldBe 1 // nulls (sorted last) never match
  }

  test("property: streaming timeoutSessions == brute-force gap sessionization") {
    // any arrival order, any micro-batch split; the watermark delay
    // exceeds the full time span so no event is ever late-dropped and
    // every open sub-session shape (out-of-order holds, bridge merges)
    // is reachable. A far-future sentinel closes everything, so the
    // emitted sessions must be EXACTLY the batch-model sessions.
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StatefulOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gapSec = 300L
    val base = 1700000000000L
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("u1", "u2"), Gen.choose(0L, 4000L))),
      Gen.choose(0, 100))
    samples(gen, 5).zipWithIndex.foreach { case ((evts, splitPct), i) =>
      val rows = evts.map { case (k, s) => (new Timestamp(base + s * 1000L), k, 1.0) }
      val cut = rows.size * splitPct / 100
      val in = MemoryStream[(Timestamp, String, Double)]
      val out = StatefulOps.timeoutSessions(
        in.toDF().toDF("ts", "key", "v"), "key", "ts", "v",
        delay = "2 hours", gapSec = gapSec)
      val q = out.toDF().writeStream.format("memory")
        .queryName(s"t_prop_sess_$i").outputMode(OutputMode.Append()).start()
      if (cut > 0) { in.addData(rows.take(cut): _*); q.processAllAvailable() }
      if (cut < rows.size) { in.addData(rows.drop(cut): _*); q.processAllAvailable() }
      in.addData((new Timestamp(base + 48L * 3600 * 1000), "wm", 0.0))
      q.processAllAvailable()
      q.stop()
      val got = spark.table(s"t_prop_sess_$i").filter(col("key") =!= "wm")
        .as[(String, Timestamp, Timestamp, Long)].collect()
        .map { case (k, a, b, n) => (k, a.getTime, b.getTime, n) }.toSet
      val expected = evts.groupBy(_._1).flatMap { case (k, ks) =>
        val sorted = ks.map(base + _._2 * 1000L).sorted
        sorted.tail.foldLeft(List((sorted.head, sorted.head, 1L))) {
          case ((s, e, n) :: t, ts) =>
            if (ts - e <= gapSec * 1000L) (s, ts, n + 1) :: t
            else (ts, ts, 1L) :: (s, e, n) :: t
          case (Nil, _) => Nil // unreachable
        }.map { case (s, e, n) => (k, s, e, n) }
      }.toSet
      withClue(s"evts=$evts split=$splitPct: ") { got shouldBe expected }
    }
  }

  test("NoEarlierCollision: true iff keys differ at every earlier band") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
    def run(a: Seq[String], b: Seq[String], bid: Int): Boolean =
      graft.functions.NoEarlierCollision(
        Literal.create(a, ArrayType(StringType)),
        Literal.create(b, ArrayType(StringType)),
        Literal.create(bid, IntegerType)).eval(null).asInstanceOf[Boolean]
    run(Seq("x", "y"), Seq("p", "q"), 2) shouldBe true // all earlier differ
    run(Seq("x", "y"), Seq("x", "q"), 2) shouldBe false // collided at band 0
    run(Seq("x", "y"), Seq("p", "y"), 1) shouldBe true // band 1 not inspected at bid=1
    run(Seq("x"), Seq("p"), 0) shouldBe true // first band: vacuously true
  }
}
