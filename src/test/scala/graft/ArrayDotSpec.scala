package graft

import graft.functions.ArrayDot
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ArrayDot must be bit-identical to the composable
  * zip_with+aggregate form it replaces (the DuckDB oracle parity
  * depends on the exact summation order).
  */
class ArrayDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches the higher-order-function form bit-for-bit on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() - 0.5),
        Array.fill(64)(rnd.nextDouble() - 0.5))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      ArrayDot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null array, null element, and length mismatch all yield null") {
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(3.0), Some(4.0))),
      (2L, Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(3.0), Some(4.0))),
      (3L, Seq[Option[Double]](Some(1.0)), Seq[Option[Double]](Some(3.0), Some(4.0))))
      .toDF("id", "a", "b")
    val got = df.select(col("id"), ArrayDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(11.0))
    assert(got(2L).isEmpty)
    assert(got(3L).isEmpty)
    val withNullArr = df.select(ArrayDot(lit(null).cast("array<double>"), col("b")).as("d"))
      .collect().head
    assert(withNullArr.isNullAt(0))
  }

  test("registers as a SQL function") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
  }

  test("SimHash matches the composable md5-hex-digit form bit-for-bit") {
    // the interpreted form SimHash replaced: per bit j, strict majority
    // of words whose md5 hex digit j is >= '8'
    def hofForm(bits: Int) = (1 to bits).map { j =>
      when(size(filter(col("wh"), h => substring(h, j, 1) >= "8")) * 2 >
        size(col("wh")), lit(1L << (j - 1))).otherwise(lit(0L))
    }.reduce(_ + _)
    val rnd = new scala.util.Random(11)
    val texts = Seq("", "a", " ", "a ", " a", "a  b", "word",
      "the quick brown fox", "x y z x y z x") ++
      (0 until 40).map(_ => Seq.fill(1 + rnd.nextInt(12))(
        rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("wh", transform(split(col("text"), " "), w => md5(w.cast("binary"))))
    for (bits <- Seq(16, 32)) {
      val out = df.select(
        graft.functions.SimHash(col("text"), bits).as("native"),
        hofForm(bits).as("hof")).collect()
      out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    }
  }

  test("MinHashSlices and ShingleSet match their composable forms exactly") {
    val rnd = new scala.util.Random(13)
    val texts = Seq("", "a", " ", "a ", " a", "a  b", "word", "a b a b",
      "the quick brown fox", "x y z x y z x") ++
      (0 until 40).map(_ => Seq.fill(1 + rnd.nextInt(12))(
        rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("w0", split(col("text"), " "))
      .withColumn("wsRef", expr(
        "array_distinct(CASE WHEN size(w0) >= 2 THEN " +
          "transform(sequence(1, size(w0) - 1), " +
          "i -> concat(element_at(w0, i), ' ', element_at(w0, i + 1))) " +
          "ELSE array(text) END)"))
      .withColumn("whRef", transform(col("wsRef"), w => md5(w.cast("binary"))))
    val k = 8
    val sigRef = (0 until k).map { i =>
      array_min(transform(col("whRef"), h => substring(h, i * 4 + 1, 4)))
    }
    val out = df.select(
      graft.functions.MinHashSlices(col("text"), k).as("native"),
      array(sigRef: _*).as("ref"),
      graft.functions.ShingleSet(col("text")).as("wsNative"),
      col("wsRef")).collect()
    out.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"minhash slices differ: $r")
      assert(r.getSeq[String](2) == r.getSeq[String](3), s"shingle sets differ: $r")
    }
  }

  test("ShingleHashes matches the composable md5-prefix form exactly") {
    // reference: distinct 2-word shingles (ShingleSet semantics), each
    // hashed to the first 15 md5 hex chars read as one 60-bit number,
    // deduped on the hash, sorted ascending — the relabeling q25's
    // Jaccard verify shuffles instead of the shingle strings.
    val rnd = new scala.util.Random(23)
    val texts = Seq("", "a", " ", "a ", " a", "a  b", "word", "a b a b",
      "the quick brown fox", "x y z x y z x") ++
      (0 until 40).map(_ => Seq.fill(1 + rnd.nextInt(12))(
        rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString).mkString(" "))
    val out = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("wsRef", graft.functions.ShingleSet(col("text")))
      .select(
        graft.functions.ShingleHashes(col("text")).as("native"),
        array_sort(array_distinct(transform(col("wsRef"),
          s => conv(substring(md5(s.cast("binary")), 1, 15), 16, 10)
            .cast("long")))).as("ref")).collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"hashes differ: $r"))
  }

  test("GramHashes matches the composable slice+concat_ws+md5 form exactly") {
    val composable =
      "CASE WHEN size(w) >= 8 THEN transform(sequence(1, size(w) - 7), " +
        "i -> substring(md5(cast(concat_ws(' ', slice(w, i, 8)) AS BINARY)), 1, 16)) " +
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    val rnd = new scala.util.Random(17)
    val texts = Seq("", "a", "short text under eight words",
      "exactly eight words one two three four five", "a  b c d e f g h i") ++
      (0 until 30).map(_ => Seq.fill(1 + rnd.nextInt(20))(
        rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString).mkString(" "))
    val out = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("w", split(col("text"), " "))
      .select(
        graft.functions.GramHashes(col("text"), 8, 16).as("native"),
        expr(composable).as("ref")).collect()
    out.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), s"grams differ: $r"))
  }

  test("WordGrams matches the composable concat_ws form for widths 2 and 3") {
    def composable(n: Int) =
      s"CASE WHEN size(w) >= $n THEN transform(sequence(1, size(w) - ${n - 1}), " +
        s"i -> concat_ws(' ', ${(0 until n).map(o => s"element_at(w, i + $o)").mkString(", ")})) " +
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    val rnd = new scala.util.Random(19)
    val texts = Seq("", "a", "a b", "a b c", "a  b  c", " x y ") ++
      (0 until 30).map(_ => Seq.fill(1 + rnd.nextInt(10))(
        rnd.alphanumeric.take(1 + rnd.nextInt(5)).mkString).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").withColumn("w", split(col("text"), " "))
    for (n <- Seq(2, 3)) {
      val out = df.select(
        graft.functions.WordGrams(col("text"), n).as("native"),
        expr(composable(n)).as("ref")).collect()
      out.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), s"grams($n) differ: $r"))
    }
  }

  test("simhash registers as a SQL function with a literal bit width") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT simhash('a b c', 16) AS s").collect().head.getLong(0)
    val viaApi = Seq(Tuple1("a b c")).toDF("text")
      .select(graft.functions.SimHash(col("text"), 16)).collect().head.getLong(0)
    assert(viaSql == viaApi)
  }

  test("the whole native text-kernel family registers to SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT size(minhash_slices('a b c', 8)) AS mh, " +
        "size(shingle_set('a b c')) AS ss, " +
        "size(shingle_hashes('a b c')) AS sh, " +
        "size(gram_hashes('one two three four five six seven eight nine', 8, 16)) AS gh, " +
        "size(word_grams('a b c', 2)) AS wg").collect().head
    assert(r.getInt(0) == 8)  // 8 slice minima
    assert(r.getInt(1) == 2)  // "a b", "b c"
    assert(r.getInt(2) == 2)  // hashed "a b", "b c"
    assert(r.getInt(3) == 2)  // 9 words → two 8-grams
    assert(r.getInt(4) == 2)  // "a b", "b c"
  }

  test("participates in codegen (no fallback) and works under it") {
    val rows = (0 until 1000).map(i => (i.toLong, Array.fill(8)(i * 0.5)))
    val df = rows.toDF("id", "v")
    val total = df.select(sum(ArrayDot(col("v"), col("v"))).as("s")).collect().head.getDouble(0)
    val expected = rows.map(r => r._2.map(x => x * x).sum).sum
    assert(math.abs(total - expected) / expected < 1e-12)
  }
}
