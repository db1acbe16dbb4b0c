package graft

import graft.functions.{BloomFunctions, CmsSketch}
import graft.operators.Dedup
import graft.queries.Tables
import org.apache.spark.sql.functions._

class SketchFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- bloom build + probe ----

  test("bloom filter has no false negatives and bounded false positives") {
    val keys = (1L to 2000L).toDF("k")
    val bloom = keys
      .agg(BloomFunctions.bloomAgg($"k", 2000L)).head.getAs[Array[Byte]](0)
    val probe = (1L to 20000L).toDF("k")
      .withColumn("hit", BloomFunctions.mightContain(bloom, $"k"))
    val inHits = probe.filter($"k" <= 2000 && $"hit").count()
    assert(inHits == 2000, "every inserted key must probe true")
    val fp = probe.filter($"k" > 2000 && $"hit").count()
    assert(fp.toDouble / 18000 < 0.05, s"false-positive rate too high: $fp/18000")
  }

  test("bloom build is distributed (merge across many partitions)") {
    val keys = (1L to 5000L).toDF("k").repartition(32)
    val bloom = keys
      .agg(BloomFunctions.bloomAgg($"k", 5000L)).head.getAs[Array[Byte]](0)
    val misses = (1L to 5000L).toDF("k")
      .filter(!BloomFunctions.mightContain(bloom, $"k")).count()
    assert(misses == 0, "partition-merged filter lost keys")
  }

  test("bloomDecontaminate equals crossDedup row-for-row") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val test = docs.filter($"doc_id" % 5 === 0)
    val train = docs.filter($"doc_id" % 5 =!= 0)
    val viaBloom = Dedup.bloomDecontaminate(train, test, "text", 10000L)
      .select($"doc_id").as[Long].collect().sorted
    val viaJoin = Dedup.crossDedup(train, test, "text")
      .select($"doc_id").as[Long].collect().sorted
    assert(viaBloom.sameElements(viaJoin),
      s"bloom fast path diverged: ${viaBloom.length} vs ${viaJoin.length} rows")
  }

  test("bloomDecontaminate with empty holdout keeps everything") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val none = docs.filter($"doc_id" < 0)
    assert(Dedup.bloomDecontaminate(docs, none, "text").count() == docs.count())
  }

  // ---- count-min sketch ----

  test("cms estimate is >= exact and within e*N/width (single partition)") {
    val xs = (1 to 10000).map(i => (i % 100).toLong).toDF("k")
    val n = 10000L
    val sk = xs.agg(CmsSketch.cmsSketch($"k", 5, 1024).as("sk"))
    val est = sk.select(CmsSketch.cmsEstimate($"sk", lit(7L))).head.getLong(0)
    val exact = 100L
    assert(est >= exact, s"CMS must never underestimate: $est < $exact")
    assert(est <= exact + math.E * n / 1024, s"estimate $est beyond CMS bound")
  }

  test("cms merges across partitions like a sum") {
    val one = (1 to 8000).map(i => (i % 50).toLong).toDF("k").coalesce(1)
      .agg(CmsSketch.cmsSketch($"k", 5, 512).as("sk"))
      .select(CmsSketch.cmsEstimate($"sk", lit(3L))).head.getLong(0)
    val many = (1 to 8000).map(i => (i % 50).toLong).toDF("k").repartition(32)
      .agg(CmsSketch.cmsSketch($"k", 5, 512).as("sk"))
      .select(CmsSketch.cmsEstimate($"sk", lit(3L))).head.getLong(0)
    assert(one == many, "sketch must be partitioning-invariant")
  }

  test("cms grouped against exact counts on real data") {
    val li = Tables(spark, "/root/testdata/sf0.01", "lineitem")
    val rows = li.groupBy($"l_returnflag")
      .agg(CmsSketch.cmsSketch($"l_partkey", 5, 2048).as("sk"),
        count(lit(1)).as("n"),
        sum(when($"l_partkey" === 17L, 1L).otherwise(0L)).as("exact17"))
      .select($"l_returnflag", $"n", $"exact17",
        CmsSketch.cmsEstimate($"sk", lit(17L)).as("est17"))
      .collect()
    rows.foreach { r =>
      val (n, exact, est) =
        (r.getAs[Long]("n"), r.getAs[Long]("exact17"), r.getAs[Long]("est17"))
      assert(est >= exact && est <= exact + math.E * n / 2048,
        s"flag ${r.getString(0)}: est $est vs exact $exact (n=$n)")
    }
  }

  test("cms join-size inner product is exact when keys don't collide") {
    // few distinct keys vs width 2048 → collisions virtually impossible,
    // so min-of-dots equals Σ f_A(x)·f_B(x) exactly
    val a = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")     // f_A = {1:3, 2:1, 3:1}
    val b = Seq(1L, 2L, 2L, 4L).toDF("k")         // f_B = {1:1, 2:2, 4:1}
    val skA = a.agg(CmsSketch.cmsSketch($"k", 5, 2048).as("a"))
    val skB = b.agg(CmsSketch.cmsSketch($"k", 5, 2048).as("b"))
    val est = skA.crossJoin(skB)
      .select(CmsSketch.cmsJoinSize($"a", $"b").as("est"))
      .collect()(0).getLong(0)
    assert(est == 3L * 1L + 1L * 2L) // = |A ⋈ B on k| = 5
  }
}
