package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ShingleExpressions
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence laws for the native shingle/n-gram/signature expressions:
  * each must be BIT-IDENTICAL to the relational formulation it replaced
  * (window lead() n-grams, groupBy-min MinHash minima, token-aggregate
  * SimHash) — the oracles and the persisted-index encodings both depend
  * on the exact values, so a regression here would corrupt silently.
  */
class ShingleExprSpec extends AnyFunSuite with SparkSessionFixture {

  private def docs: DataFrame =
    graft.queries.Tables.t(spark, Sf001, "documents")

  /** The r1 window formulation, kept here as the law's oracle. */
  private def windowNgrams(df: DataFrame, n: Int, distinct: Boolean): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until n).map(i => lead(col("tok"), i).over(w).as(s"l$i"))
    val grams = df
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select((col("doc_id") +: col("tok") +: leads): _*)
      .filter(if (n > 1) col(s"l${n - 1}").isNotNull else lit(true))
      .select(col("doc_id"), concat_ws(" ",
        col("tok") +: (1 until n).map(i => col(s"l$i")): _*).as("s"))
    if (distinct) grams.distinct() else grams
  }

  private def assertSameRows(a: DataFrame, b: DataFrame, label: String): Unit = {
    assert(a.exceptAll(b).count() === 0, s"$label: rows in old formulation only")
    assert(b.exceptAll(a).count() === 0, s"$label: rows in native form only")
  }

  test("ngrams(3, distinct) matches window+lead+distinct shingles") {
    val native = docs.select(col("doc_id"),
      explode(ShingleExpressions.shingles(col("text"))).as("s"))
    assertSameRows(windowNgrams(docs, 3, distinct = true), native, "shingles")
  }

  test("ngrams(2) and ngrams(8) match the window bigram/span streams") {
    for (n <- Seq(2, 8)) {
      val native = docs.select(col("doc_id"),
        explode(ShingleExpressions.ngrams(col("text"), n, distinct = false)).as("s"))
      assertSameRows(windowNgrams(docs, n, distinct = false), native, s"ngrams($n)")
    }
  }

  test("ngram edge cases: empty text, short text, multi-space, multibyte") {
    import spark.implicits._
    val edge = Seq(
      (1L, ""), (2L, "a"), (3L, "a b"), (4L, "a b c"),
      (5L, "a  b c"),              // empty token inside
      (6L, "a b c "),              // trailing empty token
      (7L, "héllo wörld ünïcode"), // multibyte UTF-8 around spaces
      (8L, "x y x y x y")          // repeats → distinct collapses
    ).toDF("doc_id", "text")
    assertSameRows(windowNgrams(edge, 3, distinct = true),
      edge.select(col("doc_id"),
        explode(ShingleExpressions.shingles(col("text"))).as("s")),
      "edge shingles")
    // doc 7: 1 shingle; doc 8: 6 windows, 2 distinct
    val arr = edge.select(col("doc_id"),
      ShingleExpressions.shingles(col("text")).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(arr(1L).isEmpty && arr(2L).isEmpty && arr(3L).isEmpty)
    assert(arr(4L) === Seq("a b c"))
    assert(arr(5L) === Seq("a  b", " b c"))
    assert(arr(7L) === Seq("héllo wörld ünïcode"))
    assert(arr(8L) === Seq("x y x", "y x y"))
  }

  test("minhashMins matches min(xxhash64(slot, s)) over exploded shingles") {
    val k = 16
    val rows = docs.select(col("doc_id"),
      explode(ShingleExpressions.shingles(col("text"))).as("s"))
    val old = rows.groupBy(col("doc_id")).agg(
      min(xxhash64(lit(0), col("s"))).as("m0"),
      (1 until k).map(i => min(xxhash64(lit(i), col("s"))).as(s"m$i")): _*)
    val native = docs.select(col("doc_id"),
        ShingleExpressions.minhashMins(col("text"), k).as("m"))
      .filter(col("m").isNotNull)
      .select(col("doc_id") +: (0 until k).map(i => col("m")(i).as(s"m$i")): _*)
    assertSameRows(old, native, "minhash minima")
  }

  test("simhash64 matches the token-aggregate formulation; null text → null") {
    val old = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("w"))
      .withColumn("h", xxhash64(col("tok")))
      .groupBy(col("doc_id"))
      .agg((0 until 64).map(b =>
        sum(when(expr(s"(shiftright(h, $b) & 1) = 1"), col("w"))
          .otherwise(-col("w"))).as(s"s$b")).head,
        (1 until 64).map(b =>
          sum(when(expr(s"(shiftright(h, $b) & 1) = 1"), col("w"))
            .otherwise(-col("w"))).as(s"s$b")): _*)
      .select(col("doc_id"),
        (0 until 64).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
    val native = docs.select(col("doc_id"),
      ShingleExpressions.simhash64(col("text")).as("simhash"))
    assertSameRows(old, native, "simhash")

    import spark.implicits._
    val withNull = Seq((1L, Some("a b")), (2L, None))
      .toDF("doc_id", "text")
    val out = withNull.select(col("doc_id"),
      ShingleExpressions.simhash64(col("text")).as("sig")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(2L).isEmpty, "null text must produce null signature")
    assert(out(1L).nonEmpty)
  }

  test("segments matches the transform+slice lambda formulation") {
    import spark.implicits._
    // the HOF formulation dedupSegmentsAt shipped with, kept as the
    // law's oracle (and the shape the DuckDB oracle mirrors)
    def hofSegments(df: DataFrame, width: Int): DataFrame = {
      val toks = split(col("text"), " ")
      val nseg = ceil(size(toks).cast("double") / width).cast("int")
      df.select(col("doc_id"), posexplode(
        transform(sequence(lit(0), nseg - 1),
          i => concat_ws(" ", slice(toks, i * width + 1, lit(width)))))
        .as(Seq("idx", "seg")))
    }
    val edge = Seq(
      (1L, ""), (2L, "a"), (3L, (1 to 8).map("t" + _).mkString(" ")),
      (4L, (1 to 9).map("t" + _).mkString(" ")),   // 8 + 1 tail
      (5L, "a  b c "),                             // empty tokens survive
      (6L, "héllo wörld ünïcode")
    ).toDF("doc_id", "text")
    for (df <- Seq(edge, docs); w <- Seq(3, 8)) {
      val native = df.select(col("doc_id"), posexplode(
        ShingleExpressions.segments(col("text"), w)).as(Seq("idx", "seg")))
      assertSameRows(hofSegments(df, w), native, s"segments w=$w")
    }
    // every token lands in exactly one segment: rejoining reproduces text
    val rejoined = docs.select(col("doc_id"), col("text"),
      concat_ws(" ", ShingleExpressions.segments(col("text"), 8)).as("re"))
      .filter(col("re") =!= col("text"))
    assert(rejoined.isEmpty)
  }
}
