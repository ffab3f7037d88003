package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-n-gram kernels behind the native expressions below.
  *
  * The engine's n-gram definition (TextOps.shingleRows and its 2-gram /
  * 8-gram siblings, mirrored by the DuckDB oracles) is: tokens =
  * split(text, " ") (regex split with limit -1 — every empty token
  * kept), gram i = tok(i) .. tok(i+n−1) joined by one space. Three
  * formulations were measured at sf0.1 (5k docs, 260k shingles):
  *
  *   - posexplode + lead() window (+ distinct) — the r1 shape: a
  *     sort-by-doc shuffle (and another for the distinct) before any
  *     consumer, ~0.95 s to produce the shingle rows, and every per-doc
  *     aggregate downstream (minhash minima, set collection, sizes)
  *     pays one more shuffle that a per-row form gets for free;
  *   - array lambdas (`transform` over `sequence`): HigherOrderFunctions
  *     are interpreted, and a `split` bound inside the lambda re-splits
  *     per element — 11.7 s for the same rows;
  *   - this: one pass per row inside whole-stage codegen — splits on the
  *     single space byte (identical to the regex for this pattern; a
  *     space byte never occurs inside a UTF-8 multibyte sequence),
  *     builds each gram once, optionally de-dups in a hash set — 0.16 s
  *     and NO shuffle at all.
  *
  * Token split semantics match Java `Pattern.split(" ", -1)` exactly:
  * every empty token is kept ("a  b" → ["a","","b"]), and an empty text
  * yields the single empty token.
  */
object ShingleUtil {
  private val SPACE: Byte = 0x20

  private def tokens(text: UTF8String): Array[UTF8String] = {
    val n = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    var count = 1
    var i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == SPACE) count += 1
      i += 1
    }
    val out = new Array[UTF8String](count)
    var start = 0
    var t = 0
    i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == SPACE) {
        out(t) = UTF8String.fromAddress(base, off + start, i - start)
        t += 1
        start = i + 1
      }
      i += 1
    }
    out(t) = UTF8String.fromAddress(base, off + start, n - start)
    out
  }

  private val SEP = UTF8String.fromString(" ")

  /** Word n-grams in stream order (`distinct` keeps first occurrences
    * only). Empty array for texts under n tokens.
    */
  def ngrams(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = tokens(text)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val m = toks.length - n + 1
    val gram = new Array[UTF8String](n)
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
      var i = 0
      while (i < m) {
        System.arraycopy(toks, i, gram, 0, n)
        seen.add(UTF8String.concatWs(SEP, gram: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
    } else {
      val out = new Array[AnyRef](m)
      var i = 0
      while (i < m) {
        System.arraycopy(toks, i, gram, 0, n)
        out(i) = UTF8String.concatWs(SEP, gram: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** k MinHash minima over the document's 3-word shingles: slot j holds
    * min over shingles s of xxhash64(j, s) — bit-identical to Spark's
    * `min(xxhash64(lit(j), s))` over the exploded distinct-shingle rows
    * (XxHash64 chains seed 42 → hashInt(j) → hashUnsafeBytes(s); min
    * over the duplicate-bearing stream equals min over the set, so no
    * de-dup pass is needed). Null when the text has no shingles — the
    * row the groupBy formulation never produced.
    */
  def minhashMins(text: UTF8String, k: Int): ArrayData = {
    val toks = tokens(text)
    if (toks.length < 3) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i + 2 < toks.length) {
      val s = UTF8String.concatWs(SEP, toks(i), toks(i + 1), toks(i + 2))
      val base = s.getBaseObject
      val off = s.getBaseOffset
      val len = s.numBytes()
      var j = 0
      while (j < k) {
        val h = XXH64.hashUnsafeBytes(base, off, len, XXH64.hashInt(j, 42L))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Fixed-width NON-overlapping token segments, final partial segment
    * included — the segmentation [[graft.queries.TextOps.dedupSegmentsAt]]
    * dedups corpus-wide. Bit-identical to the HOF formulation
    * `transform(sequence(0, ceil(n/w)-1), i -> concat_ws(" ",
    * slice(tokens, i*w+1, w)))`: same Pattern.split(" ", -1) token
    * semantics (empty text → one empty token → one empty segment), same
    * single-space join. Unlike n-grams, every token lands in exactly one
    * segment.
    */
  def segments(text: UTF8String, width: Int): ArrayData = {
    val toks = tokens(text)
    val m = (toks.length + width - 1) / width
    val out = new Array[AnyRef](m)
    var seg = 0
    while (seg < m) {
      val len = math.min(width, toks.length - seg * width)
      val gram = new Array[UTF8String](len)
      System.arraycopy(toks, seg * width, gram, 0, len)
      out(seg) = UTF8String.concatWs(SEP, gram: _*)
      seg += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over whitespace tokens: bit b is set iff Σ over token
    * OCCURRENCES of (+1 if bit b of xxhash64(token) else −1) is positive
    * — bit-identical to both prior formulations (the batch explode +
    * (doc, token, weight) aggregate and the streaming interpreted-lambda
    * fold): summing ±1 per occurrence equals summing ±weight per distinct
    * token, and xxhash64(tok) is hashUnsafeBytes(tok, seed 42).
    */
  def simhash64(text: UTF8String): Long = {
    val toks = tokens(text)
    val acc = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** array<string> of a text's word n-grams (optionally DISTINCT, keeping
  * first occurrences) — the codegen'd scalar form of the engine's n-gram
  * definition (see [[ShingleUtil]]). Exploding `Ngrams(text, 3, distinct
  * = true)` reproduces TextOps.shingleRows' (doc_id, s) frame with zero
  * shuffles; n = 2 / distinct = false is the bigram stream, n = 8 the
  * dup-span window stream.
  */
case class Ngrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"ngram width must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.ngrams(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.ShingleUtil.ngrams($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Ngrams =
    copy(child = newChild)
}

/** array<long> of k MinHash minima of a text's shingle set (null when the
  * text has no shingles) — collapses the explode + groupBy + k min()
  * aggregations of the signature build into one per-row pass; see
  * [[ShingleUtil.minhashMins]] for the bit-compatibility contract.
  */
case class MinhashMins(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_mins"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.minhashMins(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.ShingleUtil.minhashMins($c, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashMins =
    copy(child = newChild)
}

/** array<string> of a text's fixed-width non-overlapping token segments
  * (tail-inclusive) — the codegen'd form of the segment-dedup
  * segmentation; the array-lambda formulation it replaces runs
  * interpreted per element (see [[ShingleUtil]] measurements).
  */
case class Segments(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(width >= 1, s"segment width must be >= 1, got $width")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_segments"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.segments(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.ShingleUtil.segments($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): Segments =
    copy(child = newChild)
}

/** 64-bit SimHash of a text (null text → null) — one per-row pass shared
  * by the batch signature build and the streaming dedup, replacing a
  * shuffle-by-token aggregate in batch and an interpreted lambda fold in
  * streams; see [[ShingleUtil.simhash64]] for the bit contract.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.ShingleUtil.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Public bridge for graft code (Column ↔ Expression is private[sql]). */
object ShingleExpressions {
  /** Distinct 3-word shingles — the engine's near-dup set definition. */
  def shingles(text: Column): Column = ngrams(text, 3, distinct = true)

  def ngrams(text: Column, n: Int, distinct: Boolean): Column =
    ExpressionUtils.column(Ngrams(ExpressionUtils.expression(text), n, distinct))

  def minhashMins(text: Column, k: Int): Column =
    ExpressionUtils.column(MinhashMins(ExpressionUtils.expression(text), k))

  def simhash64(text: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(text)))

  def segments(text: Column, width: Int): Column =
    ExpressionUtils.column(Segments(ExpressionUtils.expression(text), width))
}
