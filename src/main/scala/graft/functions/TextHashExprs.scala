package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-document text hashing as native Catalyst expressions.
  *
  * The column-composed formulations (md5 → hex → `conv` string parse per
  * shingle, HOF lambdas, explode → distinct → groupBy to build per-document
  * signatures) spend most of their time on per-token string plumbing and on
  * shuffles whose output is a pure function of one row's text. Each
  * expression here does the whole computation — tokenize → md5 over raw
  * bytes → signature — in one tight Java pass, so signature queries become
  * scan-speed narrow projections and the postings builders skip the
  * per-(id, hash) distinct shuffle entirely (the set is deduped in-memory
  * per document).
  *
  * Numeric contract (shared with the DuckDB oracles — do NOT change):
  *   - hash60(s) = first 15 hex digits of md5(s) as a base-16 number
  *     == `conv(substring(md5(s), 1, 15), 16, 10)` == DuckDB
  *     `CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT)`;
  *   - hash31 = hash60 mod (2³¹ − 1);
  *   - minhash row i = min over shingles of (a_i·h31 + b_i) mod (2³¹ − 1)
  *     with the [[MinHashParams]] LCG table;
  *   - simhash bit i set iff Σ_tokens ((h >> i & 1)·2 − 1) ≥ 0 over
  *     term-frequency-weighted tokens (duplicates counted), h = hash60 mod
  *     2^bits.
  */
object TextHashing {

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5 (15 hex digits), always non-negative. */
  def md5Hash60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xFFL) >>> 4)
  }

  def md5Hash60(s: UTF8String): Long = md5Hash60(s.getBytes)

  def md5Hash60(s: String): Long = md5Hash60(s.getBytes(StandardCharsets.UTF_8))

  val MinhashPrime = 2147483647L // 2^31 - 1

  def hash31(s: String): Long = md5Hash60(s) % MinhashPrime

  /** Distinct word-n-shingle 31-bit hashes, sorted ascending (deterministic
    * array order). Shingling semantics are [[WordShingles.shingle]]'s.
    */
  def wordShingleHash31Set(s: UTF8String, n: Int): ArrayData = {
    val sh = WordShingles.shingle(s.toString, n)
    val hs = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) { hs(i) = hash31(sh(i)); i += 1 }
    new GenericArrayData(distinctSorted(hs))
  }

  /** Distinct code-point-n-gram 31-bit hashes of an ALREADY-NORMALIZED
    * string, sorted ascending. Slicing is by code point with end clamped to
    * the text length, matching `substr(i, n)` on the column path; a text
    * shorter than n (or empty) yields itself as the single shingle.
    */
  def charShingleHash31Set(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val cps = str.codePointCount(0, str.length)
    // char offset of each code point (+ end sentinel) so slices are O(1)
    val offs = new Array[Int](cps + 1)
    var ci = 0
    var cp = 0
    while (cp < cps) {
      offs(cp) = ci
      ci += Character.charCount(str.codePointAt(ci))
      cp += 1
    }
    offs(cps) = str.length
    val count = math.max(cps - (n - 1), 1)
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      hs(i) = hash31(str.substring(offs(i), offs(math.min(i + n, cps))))
      i += 1
    }
    new GenericArrayData(distinctSorted(hs))
  }

  /** k-row MinHash signature over word-n-shingle h31 values in one pass
    * (min is duplicate-insensitive, so no dedup needed).
    */
  def minHashSignature(s: UTF8String, n: Int): ArrayData = {
    val sh = WordShingles.shingle(s.toString, n)
    val k = MinHashParams.A.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val h = hash31(sh(i))
      var j = 0
      while (j < k) {
        val v = (h * MinHashParams.A(j) + MinHashParams.B(j)) % MinhashPrime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** TF-weighted SimHash over whitespace tokens (duplicates counted). */
  def simHash(s: UTF8String, bits: Int): Long = {
    val toks = WordShingles.tokenize(s.toString)
    val mask = if (bits < 60) (1L << bits) - 1 else -1L >>> 4
    val counts = new Array[Int](bits)
    var i = 0
    while (i < toks.length) {
      val h = md5Hash60(toks(i)) & mask
      var b = 0
      while (b < bits) {
        counts(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      i += 1
    }
    var v = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) >= 0) v |= 1L << b
      b += 1
    }
    v
  }

  /** POSITIONAL word-n-window 60-bit hashes: element i−1 is hash60 of the
    * window starting at 1-based token position i, duplicates KEPT, order
    * preserved — the index the duplicated-span operators posexplode. One
    * tokenize + one md5 per window; the column-composed formulation
    * (try_element_at inside a transform lambda) re-tokenizes per element
    * access, O(tokens²) per document.
    */
  def wordWindowHash60Array(s: UTF8String, n: Int): ArrayData = {
    val sh = WordShingles.shingle(s.toString, n)
    val hs = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) { hs(i) = md5Hash60(sh(i)); i += 1 }
    new GenericArrayData(hs)
  }

  /** min hash60 over word n-shingles (winnowing-style fingerprint;
    * duplicate-insensitive).
    */
  def wordShingleMinHash60(s: UTF8String, n: Int): Long = {
    val sh = WordShingles.shingle(s.toString, n)
    var m = Long.MaxValue
    var i = 0
    while (i < sh.length) {
      val h = md5Hash60(sh(i))
      if (h < m) m = h
      i += 1
    }
    m
  }

  private def distinctSorted(hs: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(hs)
    var n = 0
    var i = 0
    while (i < hs.length) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(n) = hs(i); n += 1 }
      i += 1
    }
    if (n == hs.length) hs else java.util.Arrays.copyOf(hs, n)
  }
}

/** Shared deterministic MinHash permutation table: 16 maps
  * h → (a·h + b) mod (2³¹ − 1), constants from a fixed LCG seed so the SQL
  * oracles can embed the same numbers.
  */
object MinHashParams {
  /** LCG: x' = (1103515245·x + 12345) mod 2³¹; seed 42; a must be non-zero. */
  val pairs: Seq[(Long, Long)] = {
    var x = 42L
    def next(): Long = { x = (1103515245L * x + 12345L) % 2147483648L; x }
    (0 until 16).map { _ =>
      val a = next() % 2147483646L + 1
      val b = next() % 2147483647L
      (a, b)
    }
  }
  val A: Array[Long] = pairs.map(_._1).toArray
  val B: Array[Long] = pairs.map(_._2).toArray
}

/** Base for the one-string-in expressions below: interpreted eval calls the
  * static helper; codegen wraps the same call so the expression participates
  * in whole-stage pipelines (the helper itself is the tight loop — there is
  * nothing to gain from inlining its body into generated code).
  */
abstract class TextHashExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType}")

  /** Java call with `%s` where the input value goes, e.g.
    * `graft.functions.TextHashing$.MODULE$.simHash(%s, 32)`.
    */
  protected def javaCall: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${javaCall.format(c)};")

  protected final val Helper =
    TextHashing.getClass.getName.stripSuffix("$") + "$.MODULE$"
}

case class WordShingleHash31Set(child: Expression, n: Int) extends TextHashExpr {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashing.wordShingleHash31Set(input.asInstanceOf[UTF8String], n)
  override protected def javaCall: String = s"$Helper.wordShingleHash31Set(%s, $n)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class CharShingleHash31Set(child: Expression, n: Int) extends TextHashExpr {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashing.charShingleHash31Set(input.asInstanceOf[UTF8String], n)
  override protected def javaCall: String = s"$Helper.charShingleHash31Set(%s, $n)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashSignature(child: Expression, n: Int) extends TextHashExpr {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashing.minHashSignature(input.asInstanceOf[UTF8String], n)
  override protected def javaCall: String = s"$Helper.minHashSignature(%s, $n)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash(child: Expression, bits: Int) extends TextHashExpr {
  require(bits > 0 && bits <= 60, "md5-derived hash provides 60 bits")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashing.simHash(input.asInstanceOf[UTF8String], bits)
  override protected def javaCall: String = s"$Helper.simHash(%s, $bits)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordShingleMinHash60(child: Expression, n: Int) extends TextHashExpr {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashing.wordShingleMinHash60(input.asInstanceOf[UTF8String], n)
  override protected def javaCall: String = s"$Helper.wordShingleMinHash60(%s, $n)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordWindowHash60Array(child: Expression, n: Int)
    extends TextHashExpr {
  require(n >= 1, s"window size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashing.wordWindowHash60Array(input.asInstanceOf[UTF8String], n)
  override protected def javaCall: String =
    s"$Helper.wordWindowHash60Array(%s, $n)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Md5Hash60(child: Expression) extends TextHashExpr {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashing.md5Hash60(input.asInstanceOf[UTF8String])
  override protected def javaCall: String = s"$Helper.md5Hash60(%s)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass BPE token statistics under the in-repo default merges table
  * ([[graft.operators.Bpe.DefaultMerges]]): struct(n_words, n_tokens_bpe,
  * sum_token_ids). Codegen'd like the hash expressions — the whole
  * tokenizer fuses into the scan stage, no Dataset encode/decode.
  */
case class BpeStats(child: Expression) extends TextHashExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_tokens_bpe", LongType, nullable = false),
    StructField("sum_token_ids", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    graft.operators.Bpe.statsDefault(input.asInstanceOf[UTF8String])
  override protected def javaCall: String =
    "graft.operators.Bpe$.MODULE$.statsDefault(%s)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-facing constructors. */
object TextHashExprs {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def x(col: Column): Expression = ColumnBridge.expression(col)

  def wordShingleHash31Set(text: Column, n: Int): Column =
    c(WordShingleHash31Set(x(text), n))
  def charShingleHash31Set(normalizedText: Column, n: Int): Column =
    c(CharShingleHash31Set(x(normalizedText), n))
  def minHashSignature(text: Column, n: Int): Column =
    c(MinHashSignature(x(text), n))
  def simHash(text: Column, bits: Int): Column = c(SimHash(x(text), bits))
  def wordShingleMinHash60(text: Column, n: Int): Column =
    c(WordShingleMinHash60(x(text), n))
  def wordWindowHash60Array(text: Column, n: Int): Column =
    c(WordWindowHash60Array(x(text), n))
  def md5Hash60(s: Column): Column = c(Md5Hash60(x(s)))
  def bpeStats(text: Column): Column = c(BpeStats(x(text)))
}
