package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer APPLY (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016 — the
  * public algorithm every modern LLM tokenizer descends from): words start
  * as character-symbol sequences and a learned MERGES table is applied in
  * rank order, each merge rewriting every left-to-right non-overlapping
  * occurrence of its symbol pair into one new symbol.
  *
  * Design for exactness and scale:
  *
  *   - merge OUTPUTS are single private-use-area codepoints (U+E000 + rank),
  *     so a symbol sequence is always literally a string with one char per
  *     symbol. Applying merge i is then EXACTLY a leftmost-non-overlapping
  *     string `replace` — which is how the DuckDB oracle reproduces the
  *     whole encoder as a replace chain, hash-identically, with the merges
  *     table as the single source of truth for both engines;
  *   - merge pairs never contain whitespace, so word boundaries need no
  *     special-casing: a pair cannot match across a space;
  *   - the encode runs as ONE mapPartitions pass (narrow, fused with the
  *     scan, no shuffle, no UDF registry) with the merges table in the task
  *     closure — the 100 TB shape is "tokenize at scan speed, aggregate
  *     counts after".
  *
  * Token IDS are the symbol codepoints themselves (base char → its
  * codepoint, merge i → 0xE000+i): stable, engine-reproducible integers.
  */
object Bpe {

  /** Merge output symbol for rank i. */
  val MergeBase = 0xE000

  /** The in-repo merges table, rank order = application order. Later pairs
    * reference earlier outputs by their U+E000+rank symbol (e.g. rank 1
    * merges rank 0's "th" with "e" into "the"). Chosen for the bench
    * corpus's vocabulary, but the operator is table-generic.
    */
  val DefaultMergePairs: IndexedSeq[(String, String)] = IndexedSeq(
    "t" -> "h", // 0: th
    "\uE000" -> "e", // 1: the
    "e" -> "r", // 2: er (order, merge, filter, customer)
    "i" -> "n", // 3: in (window, join, line)
    "\uE003" -> "e", // 4: ine (line)
    "a" -> "t", // 5: at (data, batch)
    "s" -> "t", // 6: st (stream, fast)
    "o" -> "w", // 7: ow (window, row, slow)
    "a" -> "n", // 8: an (scan)
    "q" -> "u") // 9: qu (query)

  /** (left, right, output) codepoint triples in rank order. */
  val DefaultMerges: IndexedSeq[(Int, Int, Int)] =
    DefaultMergePairs.zipWithIndex.map { case ((l, r), i) =>
      require(l.codePointCount(0, l.length) == 1 &&
        r.codePointCount(0, r.length) == 1,
        s"merge pair ($l, $r) must be single-codepoint symbols")
      require(!l.exists(_.isWhitespace) && !r.exists(_.isWhitespace),
        "merge pairs must not contain whitespace")
      (l.codePointAt(0), r.codePointAt(0), MergeBase + i)
    }

  /** Greedy BPE encode of ONE word: apply each merge in rank order,
    * rewriting left-to-right non-overlapping pair occurrences — the
    * original Sennrich apply loop. Returns the symbol (= token id) array.
    */
  def encodeWord(word: String,
      merges: IndexedSeq[(Int, Int, Int)] = DefaultMerges): Array[Int] = {
    var syms = word.codePoints().toArray
    merges.foreach { case (l, r, o) =>
      if (syms.length >= 2) {
        val out = new Array[Int](syms.length)
        var i = 0
        var j = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out(j) = o
            i += 2
          } else {
            out(j) = syms(i)
            i += 1
          }
          j += 1
        }
        syms = java.util.Arrays.copyOf(out, j)
      }
    }
    syms
  }

  /** One-pass (n_words, n_tokens_bpe, sum_token_ids) for a document under
    * `merges` — the static helper both [[tokenStats]] paths share. Word
    * split follows [[TextAnalysis.tokens]]: empty text yields one empty
    * token, which encodes to zero symbols.
    */
  def statsOf(text: String,
      merges: IndexedSeq[(Int, Int, Int)]): (Long, Long, Long) = {
    val words = Option(text).getOrElse("").trim.split("\\s+")
    var nTok = 0L
    var sumIds = 0L
    words.foreach { w =>
      val syms = encodeWord(w, merges)
      nTok += syms.length
      var i = 0
      while (i < syms.length) { sumIds += syms(i); i += 1 }
    }
    (words.length.toLong, nTok, sumIds)
  }

  /** [[statsOf]] under the DEFAULT table as an InternalRow — the entry the
    * codegen'd [[graft.functions.BpeStats]] expression calls from generated
    * code (a custom table cannot ride a static call; use the mapPartitions
    * path for those).
    */
  def statsDefault(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val (nw, nt, sum) = statsOf(if (s == null) "" else s.toString, DefaultMerges)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nw, nt, sum))
  }

  /** Per-document BPE token statistics: word count (whitespace split, same
    * contract as [[TextAnalysis.tokens]]), total BPE token count, and the
    * exact integer sum of token ids — the aggregate that proves the id
    * assignment end to end under the oracle.
    *
    * Default table → ONE codegen'd expression fused into the scan
    * ([[graft.functions.BpeStats]] — no Dataset encode/decode, no shuffle);
    * a custom table falls back to the closure-carrying mapPartitions pass.
    */
  def tokenStats(df: DataFrame, textCol: String, idCol: String,
      merges: IndexedSeq[(Int, Int, Int)] = DefaultMerges): DataFrame =
    if (merges eq DefaultMerges) {
      df.select(col(idCol).cast("long").as(idCol),
          graft.functions.TextHashExprs.bpeStats(col(textCol)).as("_s"))
        .select(col(idCol), col("_s.n_words").as("n_words"),
          col("_s.n_tokens_bpe").as("n_tokens_bpe"),
          col("_s.sum_token_ids").as("sum_token_ids"))
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      df.select(col(idCol).cast("long"), col(textCol))
        .as[(Long, String)]
        .mapPartitions { rows =>
          rows.map { case (id, text) =>
            val (nw, nt, sum) = statsOf(text, merges)
            (id, nw, nt, sum)
          }
        }
        .toDF(idCol, "n_words", "n_tokens_bpe", "sum_token_ids")
    }

  /** The DuckDB expression computing the encoded symbol STRING of
    * `textExpr` under `merges` — the oracle side of the exactness contract
    * (each merge = one `replace` with single-char output).
    */
  def replaceChainSql(textExpr: String,
      merges: IndexedSeq[(Int, Int, Int)] = DefaultMerges): String =
    merges.foldLeft(textExpr) { case (acc, (l, r, o)) =>
      s"replace($acc, chr($l) || chr($r), chr($o))"
    }
}
