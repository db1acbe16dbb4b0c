package graft

import graft.operators.{AsofJoin, RangeJoin, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("asof join picks the latest right row at or before each left ts") {
    val trades = Seq(("A", 10L, 1), ("A", 25L, 2), ("B", 5L, 3))
      .toDF("sym", "t", "trade_id")
    val quotes = Seq(("A", 8L, 1.0), ("A", 10L, 2.0), ("A", 20L, 3.0),
      ("B", 9L, 9.0))
      .toDF("sym", "qt", "px")
    val out = AsofJoin.asofJoin(trades, quotes, "sym", "t", "qt", Seq("px"))
      .select("sym", "trade_id", "px").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(("A", 1)) == Some(2.0), "inclusive: quote AT t=10 wins over t=8")
    assert(out(("A", 2)) == Some(3.0), "latest at-or-before t=25 is t=20")
    assert(out(("B", 3)) == None, "no quote at or before t=5 -> null (left join)")
  }

  test("asof join matches the naive range-join formulation on sf0.001 events") {
    val ev = graft.queries.Tables(spark, "/root/testdata/sf0.001", "events")
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    val c = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts".as("cts")).agg(max($"value").as("v"))
    val fast = AsofJoin.asofJoin(p, c, "user_id", "ts", "cts", Seq("cts", "v"))
      .select($"event_id", $"cts", $"v")
    // naive: all (purchase, click<=ts) pairs, max cts per purchase, then
    // left-join back so purchases with no qualifying click keep a null row
    val matched = p.join(c, Seq("user_id"))
      .filter($"cts" <= $"ts")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"event_id")
          .orderBy($"cts".desc)))
      .filter($"rn" === 1)
      .select($"event_id", $"cts", $"v")
    val naive = p.select($"event_id").join(matched, Seq("event_id"), "left_outer")
      .select($"event_id", $"cts", $"v")
    assert(fast.count() == p.count(), "one output row per left row")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("asof join matches the naive formulation on seeded random data") {
    val rnd = new scala.util.Random(42)
    val trades = (1 to 300).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "tid")
    val quotes = (1 to 500).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toDouble))
      .toDF("k", "qt", "px")
      .groupBy($"k", $"qt").agg(max($"px").as("px")) // dedupe exact ties
    val fast = AsofJoin.asofJoin(trades, quotes, "k", "t", "qt", Seq("qt", "px"))
      .select($"tid", $"qt", $"px")
    val matched = trades.join(quotes, Seq("k")).filter($"qt" <= $"t")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"tid")
          .orderBy($"qt".desc)))
      .filter($"rn" === 1).select($"tid", $"qt", $"px")
    val naive = trades.select($"tid").join(matched, Seq("tid"), "left_outer")
    assert(fast.count() == 300)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("asof slim variant is identical to the wide variant, incl. duplicates and nulls") {
    val rnd = new scala.util.Random(7)
    // duplicate left rows, duplicate (k, t) probes, null keys and null ts on
    // both sides — the full surface where slim's distinct + join-back could
    // diverge from the wide union
    val trades = ((1 to 200).map { i =>
      (if (i % 17 == 0) null else java.lang.Long.valueOf(rnd.nextInt(8).toLong),
        if (i % 23 == 0) null else java.lang.Long.valueOf(rnd.nextInt(300).toLong),
        (i % 50).toLong, s"payload_$i wide extra columns " * 2)
    } ++ Seq((null, null, 999L, "nullboth"), (null, null, 999L, "nullboth")))
      .toDF("k", "t", "tid", "wide")
    val quotes = (1 to 300).map { i =>
      (if (i % 29 == 0) null else java.lang.Long.valueOf(rnd.nextInt(8).toLong),
        java.lang.Long.valueOf(rnd.nextInt(300).toLong), i.toDouble)
    }.toDF("k", "qt", "px")
      .groupBy($"k", $"qt").agg(max($"px").as("px"))
    val wide = AsofJoin.asofJoin(trades, quotes, "k", "t", "qt", Seq("qt", "px"))
    val slim = AsofJoin.asofJoinSlim(trades, quotes, "k", "t", "qt", Seq("qt", "px"))
    assert(slim.columns.toSeq == wide.columns.toSeq, "same output schema")
    assert(slim.count() == trades.count(), "one output row per left row")
    assert(slim.exceptAll(wide).isEmpty && wide.exceptAll(slim).isEmpty)
  }

  test("asof slim union carries only the probe columns, not the left payload") {
    val trades = (1 to 10).map(i => (i.toLong % 3, i.toLong, s"w$i", i * 1.5, s"x$i"))
      .toDF("k", "t", "wide1", "wide2", "wide3")
    val quotes = Seq((0L, 1L, 1.0), (1L, 2L, 2.0)).toDF("k", "qt", "px")
    val plan = AsofJoin.asofJoinSlim(trades, quotes, "k", "t", "qt", Seq("px"))
      .queryExecution.optimizedPlan
    val unions = plan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }
    assert(unions.nonEmpty, "slim asof still plans a union")
    assert(unions.forall(_.output.size <= 4),
      s"union must stay slim (key, ts, side, rv); got ${unions.map(_.output.map(_.name))}")
  }

  test("bucketed range join equals the naive non-equi join") {
    val points = Seq(0.0, 24.9, 25.0, 49.9, 99.9, 100.0, 250.0)
      .toDF("value").withColumn("pid", monotonically_increasing_id())
    val bands = Seq((0, 0.0, 50.0), (1, 50.0, 100.0), (2, 100.0, 300.0))
      .toDF("band", "lo", "hi")
    val fast = RangeJoin.bucketedRangeJoin(points, bands, "value", "lo", "hi", 30.0)
      .select("pid", "band")
    val naive = points.join(bands, $"value" >= $"lo" && $"value" < $"hi")
      .select("pid", "band")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    assert(fast.count() == 7, "band 0 holds 4 points incl. both bucket halves; 100.0 and 250.0 land in band 2")
  }

  test("bucketed range join rejects shared column names up front") {
    val points = Seq(1.0).toDF("value").withColumn("name", lit("p"))
    val bands = Seq((0.0, 2.0)).toDF("lo", "hi").withColumn("name", lit("b"))
    val e = intercept[IllegalArgumentException] {
      RangeJoin.bucketedRangeJoin(points, bands, "value", "lo", "hi", 1.0)
    }
    assert(e.getMessage.contains("disjoint") && e.getMessage.contains("name"))
  }

  test("asof join rejects unorderable right payload types up front") {
    import org.apache.spark.sql.functions.map
    val left = Seq((1L, 10L)).toDF("k", "lts")
    val right = Seq((1L, 5L, "a", "b")).toDF("k", "rts", "mk", "mv")
      .withColumn("payload", map($"mk", $"mv")).drop("mk", "mv")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right, "k", "lts", "rts", Seq("payload"))
    }
    assert(e.getMessage.contains("orderable") && e.getMessage.contains("payload"))
  }

  test("hash sample is deterministic and roughly proportional") {
    val df = (1L to 4000L).toDF("id")
    val a = Sampling.hashSample(df, $"id", lit(100)).as[Long].collect().toSet
    val b = Sampling.hashSample(df, $"id", lit(100)).as[Long].collect().toSet
    assert(a == b, "same sample on re-run")
    assert(math.abs(a.size - 400) < 120, s"~10% of 4000, got ${a.size}")
    val bigger = Sampling.hashSample(df, $"id", lit(500)).as[Long].collect().toSet
    assert(a.subsetOf(bigger), "nested samples: raising the rate only adds rows")
  }

  test("stratified sample applies per-stratum rates and drops unlisted strata") {
    val df = (1L to 3000L).map(i => (i, if (i % 3 == 0) "rare" else "common"))
      .toDF("id", "cls")
    val out = Sampling.stratifiedHashSample(df, $"id", $"cls",
      Map("rare" -> 1000, "common" -> 0))
    assert(out.filter($"cls" === "common").count() == 0)
    assert(out.filter($"cls" === "rare").count() == 1000, "permille 1000 keeps all")
  }

  test("chunking covers every token with the configured overlap") {
    val df = Seq((1L, (1 to 100).map(i => s"w$i").mkString(" "))).toDF("id", "text")
    val chunks = TextAnalysis.chunk(df, "text", "id", 32, 24).collect()
    // starts 0,24,48,72,96 -> 5 chunks; last has 100-96=4 tokens
    assert(chunks.length == 5)
    assert(chunks.map(_.getAs[Int]("chunk_tokens")).toSeq == Seq(32, 32, 32, 28, 4))
    val df2 = Seq((2L, "only three tokens")).toDF("id", "text")
    val c2 = TextAnalysis.chunk(df2, "text", "id", 32, 24).collect()
    assert(c2.length == 1 && c2.head.getAs[Int]("chunk_tokens") == 3)
  }

  test("packing fills token budgets in id order per shard") {
    val df = Seq(
      (1L, "a", (1 to 80).map(_ => "w").mkString(" ")),   // 80 tokens
      (2L, "a", (1 to 80).map(_ => "w").mkString(" ")),   // cum_before 80
      (3L, "a", (1 to 80).map(_ => "w").mkString(" ")),   // cum_before 160 -> pack 1
      (4L, "b", (1 to 10).map(_ => "w").mkString(" ")))   // own shard
      .toDF("id", "shard", "text")
    val out = TextAnalysis.packDocuments(df, "text", "id", "shard", 100)
      .select("id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L),
      s"doc 2 straddles the boundary but starts in pack 0; got $out")
  }

  test("pii scrub redacts emails, urls and phones with counts") {
    val df = Seq((1L,
      "mail bob.smith@corp.example.org or see https://ex.io/a?b=1 tel +1 555 0100 end"))
      .toDF("id", "text")
    val (u, e, p) = TextAnalysis.piiCounts(col("text"))
    val r = df.select(TextAnalysis.scrubPii(col("text")).as("s"),
      u.as("u"), e.as("e"), p.as("p")).collect().head
    assert(r.getAs[String]("s") ==
      "mail <EMAIL> or see <URL> tel <PHONE> end")
    assert(r.getAs[Int]("u") == 1 && r.getAs[Int]("e") == 1 && r.getAs[Int]("p") == 1)
  }

  test("heavy hitters ranks tokens by frequency with lexicographic ties") {
    val df = Seq(("en", "b b b a a c"), ("en", "a"), ("fr", "x y x"))
      .toDF("lang", "text")
    val out = Sampling.heavyHitters(df, "text", "lang", 2)
      .collect().map(r => (r.getString(0), r.getAs[Int]("rank")) -> r.getString(1)).toMap
    assert(out(("en", 1)) == "a", "3 a's vs 3 b's -> lexicographic tie-break")
    assert(out(("en", 2)) == "b")
    assert(out(("fr", 1)) == "x" && out(("fr", 2)) == "y")
  }
}
