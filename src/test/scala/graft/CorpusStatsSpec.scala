package graft

import graft.functions.RepetitionStats
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Repetition signals, tf·idf-proxy terms, and the source-overlap matrix. */
class CorpusStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("repetition stats: hand-computed counts on a known doc") {
    val df = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df, "text", "doc_id").collect().head
    assert(r.getAs[Int]("n_tokens") == 6)
    // tokens {a:3, b:2, c:1}; bigrams: "a b","b a","a b","b a","a c" → top 2/5
    assert(r.getAs[Double]("distinct_ratio") == 3.0 / 6.0)
    assert(r.getAs[Double]("top_word_frac") == 3.0 / 6.0)
    assert(r.getAs[Double]("top_bigram_frac") == 2.0 / 5.0)
  }

  test("repetition stats: single-token doc uses the partial-shingle rule") {
    val df = Seq((1L, "solo")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df, "text", "doc_id").collect().head
    assert(r.getAs[Int]("n_tokens") == 1)
    assert(r.getAs[Double]("top_bigram_frac") == 1.0) // one partial bigram
  }

  test("repetition stats expression matches the explode/groupBy formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fused = TextAnalysis.repetitionSignals(docs, "text", "doc_id")
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val wf = toks.groupBy("doc_id", "tok").count()
    val relational = wf.groupBy("doc_id").agg(
        max("count").as("top_c"), count(lit(1)).as("n_distinct"),
        sum("count").as("n"))
      .select(col("doc_id"), col("n").cast("int").as("n_tokens"),
        (col("n_distinct").cast("double") / col("n").cast("double"))
          .as("distinct_ratio"),
        (col("top_c").cast("double") / col("n").cast("double"))
          .as("top_word_frac"))
    assert(fused.drop("top_bigram_frac").except(relational).isEmpty)
    assert(relational.except(fused.drop("top_bigram_frac")).isEmpty)
  }

  test("repetition stats rejects non-string input") {
    val err = intercept[Exception] {
      Seq(1).toDF("x").select(RepetitionStats.repetitionStats(col("x"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("tfidf top terms: rarer term outranks more-frequent common term") {
    val df = Seq(
      (1L, "common common common rare"),
      (2L, "common filler filler"),
      (3L, "common other other")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(df, "text", "doc_id", 2)
    val doc1 = top.filter(col("doc_id") === 1).orderBy("rank")
      .select("term").as[String].collect()
    // rare: tf=1, df=1 → score 3; common: tf=3, df=3 → score 3 → tie broken
    // on the term string ("common" < "rare")
    assert(doc1.toSeq == Seq("common", "rare"))
    // every doc gets at most k rows, ranks are 1..k
    val byDoc = top.groupBy("doc_id").agg(max("rank").as("mr"), count(lit(1)).as("n"))
    assert(byDoc.filter(col("mr") =!= col("n")).isEmpty)
  }

  test("tfidf top terms requires positive k") {
    intercept[IllegalArgumentException] {
      TextAnalysis.tfidfTopTerms(Seq((1L, "a")).toDF("doc_id", "text"),
        "text", "doc_id", 0)
    }
  }

  test("source overlap counts shared distinct shingle hashes per pair") {
    val df = Seq(
      (1L, "x y z w", "s1"),   // shingles: "x y z", "y z w"
      (2L, "x y z q", "s2"),   // shares "x y z" with s1
      (3L, "p q r s", "s3")    // shares nothing
    ).toDF("doc_id", "text", "source")
    val m = TextAnalysis.sourceOverlap(df, "text", "source").collect()
    assert(m.length == 1)
    assert(m.head.getAs[String]("src_a") == "s1")
    assert(m.head.getAs[String]("src_b") == "s2")
    assert(m.head.getAs[Long]("shared_shingles") == 1L)
  }

  test("shared-window pairs count exact k-token overlap") {
    val base = (1 to 12).map(i => s"w$i").mkString(" ") // 12 tokens → 3 windows @ k=10
    val df = Seq(
      (1L, base),
      (2L, base + " tail1 tail2"),         // shares all 3 of doc 1's windows
      (3L, (20 to 40).map(i => s"v$i").mkString(" "))) // disjoint vocabulary
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.sharedWindowPairs(df, "text", "doc_id", 10)
      .collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert((p.getAs[Long]("id_a"), p.getAs[Long]("id_b")) == (1L, 2L))
    assert(p.getAs[Long]("shared_windows") == 3L)
  }

  test("shared-window pairs honors minShared and validates k") {
    val df = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    // 2-token docs at k=10 → one partial window each, identical → 1 shared
    assert(graft.operators.Dedup.sharedWindowPairs(df, "text", "doc_id", 10,
      minShared = 2L).isEmpty)
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.sharedWindowPairs(df, "text", "doc_id", 1)
    }
  }

  test("source overlap is symmetric-free (each pair reported once, a < b)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = TextAnalysis.sourceOverlap(docs, "text", "source")
    assert(m.filter(col("src_a") >= col("src_b")).isEmpty)
  }

  test("temperature-mix threshold sibling is result-identical to the window form") {
    // round-7 verdict task 6: the quota ≪ n scale path (broadcast hash
    // threshold + survivor-only rank) must select exactly the rows the
    // full per-source sort selects
    val windowForm = graft.queries.CorpusQueries
      .qTemperatureMix(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val threshold = graft.queries.CorpusQueries
      .temperatureMixThresholdSelect(docs,
        graft.queries.CorpusQueries.TempMixTarget)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(threshold == windowForm,
      s"threshold path diverged: only-threshold=${threshold -- windowForm} " +
        s"only-window=${windowForm -- threshold}")
    assert(threshold.nonEmpty)
    // margin dominates on this tiny corpus (quota+m ≥ n keeps everything);
    // prove the prune on a larger synthetic source where quota ≪ n
    val big = spark.range(20000).selectExpr("'s0' AS source", "id AS doc_id")
    val picked = graft.queries.CorpusQueries
      .temperatureMixThresholdSelect(big, 100L)
    picked.collect()
    val planStr = picked.queryExecution.executedPlan.toString
    assert(planStr.contains("Filter"), planStr)
    // exact-identity on the big source too: same rows as the window form's
    // selection rule (rank by (hk, doc_id) within quota)
    val quota = 100L // one source: quota = target·f/f = target, ≤ n
    val wf = big.select(col("source"), col("doc_id"),
        graft.operators.Shingles.hash60(col("doc_id").cast("string")).as("hk"))
      .orderBy(col("hk"), col("doc_id")).limit(quota.toInt)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val tf = picked.collect().map(_.getLong(1)).toSet
    assert(tf == wf, s"big-source selection diverged (${tf.size} vs ${wf.size})")
  }

  test("token-budget threshold sibling is result-identical with no unpartitioned window") {
    // round-8 verdict task 1: the select-then-trim scale path must emit
    // exactly the window form's rows (doc_id, n_tokens, cum_tokens)...
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val windowForm = graft.queries.PipelineQueries
        .qTokenBudget(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val scaled = graft.queries.PipelineQueries
        .qTokenBudgetScaled(spark, dir)
      val got = scaled
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == windowForm,
        s"$dir diverged: only-scaled=${got -- windowForm} " +
          s"only-window=${windowForm -- got}")
      assert(got.nonEmpty)
      // ...and every window in its physical plan must carry a partition
      // spec — the whole point is eliminating the single-partition global
      // cumulative sum (Spark's "No Partition Defined" shape)
      val wins = scaled.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.nonEmpty, "expected the bucketed running-sum window")
      assert(wins.forall(_.partitionSpec.nonEmpty),
        "scale sibling must not contain an unpartitioned window")
    }
    // degenerate corpora: total under budget (everything survives) and a
    // single distinct n_chars value (one bucket)
    val tiny = Seq((1L, 5L, "a b c"), (2L, 5L, "d e"), (3L, 5L, "f"))
      .toDF("doc_id", "n_chars", "text")
    val all = graft.queries.PipelineQueries
      .tokenBudgetThresholdSelect(tiny, budget = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // order: n_chars ties → doc_id asc; cum over (3,2,1)-token docs
    assert(all == Set((1L, 3L, 3L), (2L, 2L, 5L), (3L, 1L, 6L)))
    // boundary trim inside one bucket
    val cut = graft.queries.PipelineQueries
      .tokenBudgetThresholdSelect(tiny, budget = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cut == Set((1L, 3L, 3L), (2L, 2L, 5L)))
  }
}
