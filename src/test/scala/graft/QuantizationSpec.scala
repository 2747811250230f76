package graft

import graft.operators.{Quantization, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization invariants (q84/q85), plus the CCNet bucket
  * (q86) and hybrid-RRF (q87) contracts. All against the sf0.001
  * fixtures — the oracle parity itself is driver-checked; these pin
  * the algebraic properties no row-hash can express.
  */
class QuantizationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def emb = Tables.embeddings(spark, TestSpark.sf0001)
  private def docs = Tables.documents(spark, TestSpark.sf0001)

  test("native PqEncode matches the HOF reference form bit-for-bit") {
    val cb = Quantization.demoCodebook(emb)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("codes"), col("dists"), col("qerr"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1),
        r.getSeq[Double](2).map(java.lang.Double.doubleToLongBits),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))))
      .toMap
    val native = rows(Quantization.pqEncode(emb, cb))
    val hof = rows(Quantization.pqEncodeHof(emb, cb))
    assert(native.size == 500)
    assert(native == hof)
  }

  test("native PqAdcDist matches the interpreted lookup fold and nulls out of range") {
    import spark.implicits._
    // flat j-major: [lut(j=0,c=0), lut(0,1), lut(1,0), lut(1,1)]
    val df = Seq(
      (Seq(0, 1), Seq(1.5, 2.5, 3.25, 4.75)),
      (Seq(1, 0), Seq(1.5, 2.5, 3.25, 4.75)),
      (Seq(2, 0), Seq(1.5, 2.5, 3.25, 4.75)) // code 2 out of range (K=2)
    ).toDF("codes", "lut")
    val got = df.select(graft.functions.PqAdcDist(col("codes"), col("lut")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).contains(1.5 + 4.75))
    assert(got(1).contains(2.5 + 3.25))
    assert(got(2).isEmpty)
  }

  test("packed ADC over the 64-bit word matches the unpacked array form bit-for-bit") {
    val cb = Quantization.demoCodebook(emb)
    val enc = Quantization.pqEncode(emb, cb)
    // a representative LUT: any 128-length double array (j-major, K=16)
    val lut = array((0 until 128).map(i => lit(i * 0.37 - 11.0)): _*)
    val rows = enc.select(
      graft.functions.PqAdcDist(col("codes"), lut).as("a"),
      graft.functions.PqAdcDistPacked(col("word"), lut, 8).as("p")).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // word packs the exact code bytes
    enc.select(col("codes"), col("word")).collect().foreach { r =>
      val codes = r.getSeq[Int](0)
      val w = r.getLong(1)
      codes.zipWithIndex.foreach { case (c, j) =>
        assert(((w >>> (8 * j)) & 0xffL).toInt == c)
      }
    }
  }

  test("codeword vectors PQ-encode to themselves with zero error") {
    val enc = Quantization.pqEncode(emb, Quantization.demoCodebook(emb))
      .filter(col("vec_id") < 16)
      .select(col("vec_id"), col("codes"), col("qerr")).collect()
    assert(enc.length == 16)
    enc.foreach { r =>
      val id = r.getLong(0)
      assert(r.getDouble(2) == 0.0, s"vec $id qerr")
      // with distinct random subvectors the zero-distance codeword is the
      // vector itself in every subspace
      assert(r.getSeq[Int](1).forall(_ == id.toInt), s"vec $id codes")
    }
  }

  test("ADC with a full-corpus codebook degenerates to exact L2 top-k") {
    // every vector is its own codeword => adist(q, x) == the subspace-
    // grouped L2^2(q, x), so PQ top-k must equal brute-force L2 top-k
    val full = Quantization.demoCodebook(emb, numCodes = 1000000)
    val pq = Quantization.adcTopK(emb, col("vec_id") % 100 === 0, 5,
      codebook = Some(full))
      .select(col("qid"), col("rk"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // reference: same subspace-grouped summation, computed directly
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = base.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val d2 = aggregate(sequence(lit(0), lit(7)), lit(0.0), (s, j) =>
      s + aggregate(sequence(lit(1), lit(8)), lit(0.0), (t, i) => {
        val xi = element_at(col("qv"), j * 8 + i)
        val yi = element_at(col("v"), j * 8 + i)
        t + (xi - yi) * (xi - yi)
      }))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d").asc, col("nid").asc)
    val exact = base.crossJoin(broadcast(q)).where(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nid"), d2.as("d"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(pq.nonEmpty && pq == exact)
  }

  test("native SubL2Dist matches the interpreted nested fold bit-for-bit") {
    // the nested grouping matters: sum-per-subspace then outer sum is
    // NOT IEEE-equal to one flat left-to-right sum, and the DuckDB
    // oracle computes the nested form — the kernel must match the HOF
    // reference exactly on every pair, not approximately
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = base.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val pairs = base.crossJoin(broadcast(q)).where(col("qid") =!= col("vec_id"))
    val rows = pairs.select(
      graft.functions.SubL2Dist(col("qv"), col("v"), 8).as("native"),
      Quantization.l2DistHof(col("qv"), col("v")).as("hof")).collect()
    assert(rows.length == 5 * 499)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("q94 recall is exactly 1.0 everywhere under a full-corpus codebook") {
    // every vector its own codeword => ADC == the subspace-grouped L2
    // fold l2TopK uses, so approx and exact rankings coincide and the
    // recall query must report a perfect score for every query
    val full = Quantization.demoCodebook(emb, numCodes = 1000000)
    val rows = Similarity.annRecall(
      Quantization.l2TopK(emb, col("vec_id") % 100 === 0, 5),
      Quantization.adcTopK(emb, col("vec_id") % 100 === 0, 5,
        codebook = Some(full))).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) == 5L && r.getLong(2) == 5L)
      assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
    }
  }

  test("distortion is pointwise monotone in codebook size (prefix codebooks)") {
    val d16 = Quantization.pqDistortion(emb,
      Some(Quantization.demoCodebook(emb, 16)))
      .select(col("j"), col("mean_d2")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val d4 = Quantization.pqDistortion(emb,
      Some(Quantization.demoCodebook(emb, 4)))
      .select(col("j"), col("mean_d2")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(d16.keySet == (0 until 8).toSet)
    // codebook-4 is a prefix of codebook-16, so per-vector min distance
    // can only shrink; means follow (DECIMAL rounding is shared)
    (0 until 8).foreach(j => assert(d16(j) <= d4(j), s"subspace $j"))
  }

  test("Lloyd-fitted codebook never exceeds demo-codebook distortion") {
    // init == demo codebook and the sample covers the whole fixture, so
    // Lloyd's monotone objective makes this an invariant, not a hope
    val demoErr = Quantization.pqEncode(emb, Quantization.demoCodebook(emb))
      .agg(sum(col("qerr").cast("decimal(18,2)"))).collect().head.getDecimal(0)
    val fitted = Quantization.kmeansCodebook(emb)
    val fitErr = Quantization.pqEncode(emb, fitted)
      .agg(sum(col("qerr").cast("decimal(18,2)"))).collect().head.getDecimal(0)
    assert(fitErr.compareTo(demoErr) <= 0, s"fitted $fitErr vs demo $demoErr")
    val row = fitted.collect().head
    val cbv = row.getSeq[scala.collection.Seq[Double]](0)
    assert(cbv.length == 16 && cbv.forall(_.length == 64))
  }

  test("q86 buckets split every language into exact discrete tertiles") {
    val out = TextAnalysis.lmBuckets(docs)
      .groupBy(col("lang"), col("bucket")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val perLang = out.keys.map(_._1).toSet
    assert(perLang.nonEmpty)
    perLang.foreach { lang =>
      val h = out.getOrElse((lang, "head"), 0L)
      val m = out.getOrElse((lang, "middle"), 0L)
      val t = out.getOrElse((lang, "tail"), 0L)
      val n = h + m + t
      assert(h == (n + 2) / 3, s"$lang head")
      assert(h + m == (2 * n + 2) / 3, s"$lang head+middle")
    }
    // ordering contract: no tail doc outscores a head doc within a lang
    val rows = TextAnalysis.lmBuckets(docs)
      .select(col("lang"), col("bucket"), col("mean_prob")).collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val head = rs.filter(_.getString(1) == "head").map(_.getDouble(2))
      val tail = rs.filter(_.getString(1) == "tail").map(_.getDouble(2))
      if (head.nonEmpty && tail.nonEmpty)
        assert(head.min >= tail.max, s"$lang bucket ordering")
    }
  }

  test("q84 pair stage consumes the MATERIALIZED code table (no encode above the barrier)") {
    // The measured failure mode (SCALE.md round-10 PQ entry): without
    // the localCheckpoint barrier, whole-stage codegen defers the
    // stream-side pqencode projection into the BNLJ pair loop and the
    // O(dim·K) encode runs once per PAIR (11.6s vs 0.4s on the sf1
    // replica) — and the logical plan LOOKS correct either way. This
    // pins the executed plan: the pair join must read the code table as
    // a checkpointed ExistingRDD scan, with no PQ encode expression
    // anywhere above it.
    val pairs = Quantization.adcPairs(emb, col("vec_id") % 100 === 0, None)
    pairs.count()
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("existingrdd"),
      s"pair stage does not scan the materialized code table:\n$plan")
    assert(!plan.toLowerCase.contains("pqencode"),
      s"encode expression leaked above the materialization barrier:\n$plan")
  }

  test("q97 growth curve counts nested samples exactly (monotone tokens AND vocab)") {
    import spark.implicits._
    // md5 prefixes: doc 6 -> "16" (10% sample), docs 9/11 -> "45"/"65"
    // (50% sample), docs 0/1 -> "cf"/"c4" (100% only); each doc brings
    // one shared and one doc-unique token
    val d = Seq(
      (6L, "shared only6"), (9L, "shared only9"), (11L, "shared only11"),
      (0L, "shared only0"), (1L, "shared only1")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.vocabGrowth(d).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))   // doc 6: 2 toks, 2 words
    assert((r.getLong(2), r.getLong(3)) == ((6L, 4L)))   // +9, 11: shared collapses
    assert((r.getLong(4), r.getLong(5)) == ((10L, 6L)))  // whole corpus
    // nesting invariant: n and v are monotone across the sample chain
    assert(r.getLong(0) <= r.getLong(2) && r.getLong(2) <= r.getLong(4))
    assert(r.getLong(1) <= r.getLong(3) && r.getLong(3) <= r.getLong(5))
  }

  test("q90 coverage curve is exact on a constructed Zipf corpus and takes, not sorts") {
    import spark.implicits._
    // word wN occurs (11-N) times => vocab = w1..w10 with counts 10..1,
    // total 55; rank order w1(10), w2(9), ... ties impossible
    val text = (1 to 10).flatMap(n => Seq.fill(11 - n)(s"w$n")).mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // sweep points within the 10-word vocab: N=1 (cum 10), N=3 (27), N=10 (55)
    assert(out.keySet == Set(1, 3, 10))
    assert(out(1) == ((10L, 10.0 / 55.0)))
    assert(out(3) == ((27L, 27.0 / 55.0)))
    assert(out(10) == ((55L, 1.0)))
    // the cap plans as TakeOrdered — the full Heaps-law vocabulary is
    // never globally sorted; only the <= 100k taken rows meet the window
    val plan = TextAnalysis.vocabCoverage(d).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"cap must take, not sort:\n$plan")
  }

  test("q87 RRF fuses exactly the union of the two top-k lists") {
    val out = TextAnalysis.hybridRrf(docs, emb,
      Seq("spark", "join", "window", "dup"), queryVecId = 0L, k = 10)
      .collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { r =>
      val lexRk = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val denseRk = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(lexRk.isDefined || denseRk.isDefined)
      val expected = lexRk.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        denseRk.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getDouble(3) == expected, s"doc ${r.getLong(0)} rrf")
    }
    // fused rank is dense over 1..n and ordered by rrf desc
    val byRk = out.sortBy(_.getInt(4))
    assert(byRk.map(_.getInt(4)).toSeq == (1 to out.length))
    assert(byRk.map(_.getDouble(3)).toSeq.reverse.sorted.reverse ==
      byRk.map(_.getDouble(3)).toSeq)
  }
}
