package graft

import graft.functions.VectorFunctions
import graft.operators.Similarity
import graft.queries.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  lazy val corpus = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("custom DotProduct expression is bit-identical to the HOF path") {
    val both = corpus.limit(100)
      .select(
        VectorFunctions.dotHof(col("vec"), col("vec")).as("hof"),
        VectorFunctions.dot(col("vec"), col("vec")).as("expr"))
      .as[(Double, Double)].collect()
    both.foreach { case (h, e) =>
      assert(java.lang.Double.doubleToLongBits(h) ==
        java.lang.Double.doubleToLongBits(e))
    }
  }

  test("brute-force top-k: a planted duplicate vector is its own nearest neighbor") {
    val dup = corpus.filter($"id" === 0).select(lit(99999L).as("id"), $"vec")
    val c = corpus.union(dup)
    val top = Similarity.bruteForceTopK(c.filter($"id" === 99999L), c, 1)
      .select("neighbor_id", "cosine").as[(Long, Double)].collect()
    assert(top.head._1 == 0L)
    assert(math.abs(top.head._2 - 1.0) < 1e-12)
  }

  test("IVF top-k recall vs brute force is reasonable at nprobe=4/16") {
    val queries = corpus.filter($"id" < 20)
    val exact = Similarity.bruteForceTopK(queries, corpus, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(queries, corpus, 16, 4, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall vs brute force")
    assert(approx.size == exact.size, "same k per query")
  }

  test("LSH-bucketed top-k finds same-bucket neighbors with nonzero recall") {
    val queries = corpus.filter($"id" < 20)
    val exact = Similarity.bruteForceTopK(queries, corpus, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(queries, corpus, 4, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall > 0.05, s"single-table LSH recall $recall")
    assert(lsh.forall { case (q, n) => q != n })
  }

  test("near-dup pairs are symmetric-free (a<b) and thresholded") {
    val pairs = Similarity.cosineNearDupPairs(corpus, 0.3)
      .as[(Long, Long, Double)].collect()
    assert(pairs.forall(p => p._1 < p._2))
    assert(pairs.forall(_._3 >= 0.3))
  }

  test("multi-probe LSH recall >= single-probe recall") {
    val queries = corpus.filter($"id" < 20)
    val exact = Similarity.bruteForceTopK(queries, corpus, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val single = Similarity.lshTopK(queries, corpus, 4, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val multi = Similarity.lshTopKMultiProbe(queries, corpus, 4, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rs = (exact intersect single).size.toDouble / exact.size
    val rm = (exact intersect multi).size.toDouble / exact.size
    assert(rm >= rs, s"multi-probe recall $rm must be >= single-probe $rs")
    assert(rm > 0.2, s"multi-probe recall too low: $rm")
  }

  test("kmeansLloyd: every vector assigned, k clusters, WSS non-increasing") {
    def wss(assigned: org.apache.spark.sql.DataFrame, k: Int): Double = {
      // recompute WSS directly: distance of each vec to its cluster mean
      val dims = assigned
        .select($"cluster", posexplode($"vec").as(Seq("dim", "x")))
        .groupBy($"cluster", $"dim").agg(avg($"x").as("m"))
      assigned
        .select($"cluster", $"id", posexplode($"vec").as(Seq("dim", "x")))
        .join(dims, Seq("cluster", "dim"))
        .select((($"x" - $"m") * ($"x" - $"m")).as("d2"))
        .agg(sum($"d2")).head.getDouble(0)
    }
    val a1 = Similarity.kmeansLloyd(corpus, 8, 1)
    val a3 = Similarity.kmeansLloyd(corpus, 8, 3)
    assert(a1.count() == corpus.count(), "every vector gets a cluster")
    assert(a1.select($"cluster").distinct().count() <= 8)
    val (w1, w3) = (wss(a1, 8), wss(a3, 8))
    assert(w3 <= w1 * 1.0001, s"WSS must not increase across rounds: $w1 -> $w3")
  }

  test("kmeansQuantized: matches a single-node quantized-Lloyd's reference bit-for-bit") {
    // local reference: the SAME recurrence (L2 argmin w/ lowest-cell ties,
    // sum(round(x*S))/(n*S) means, empty-cell carry) in plain Scala
    def localKmeans(vs: Seq[(Long, Seq[Double])], k: Int, iters: Int,
        scale: Long): Seq[(Long, Seq[Double])] = {
      var cents = vs.sortBy(_._1).take(k)
      for (_ <- 1 to iters) {
        def d2(a: Seq[Double], b: Seq[Double]): Double = {
          def dot(x: Seq[Double], y: Seq[Double]) =
            x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p * q }
          dot(a, a) + dot(b, b) - 2.0 * dot(a, b)
        }
        val groups = vs.groupBy { case (_, v) =>
          cents.map { case (cell, c) => (d2(v, c), cell) }.min._2
        }
        cents = cents.map { case (cell, old) =>
          cell -> groups.get(cell).fold(old) { g =>
            val n = g.size
            old.indices.map { i =>
              val s = g.map { case (_, v) =>
                BigDecimal(v(i) * scale)
                  .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
              }.sum
              s.toDouble / (n.toDouble * scale.toDouble)
            }
          }
        }
      }
      cents
    }
    val vs = corpus.select($"id", $"vec".cast("array<double>"))
      .collect().toSeq.map(r => (r.getLong(0), r.getSeq[Double](1)))
    for (iters <- Seq(1, 3)) {
      val dist = Similarity.kmeansQuantized(corpus, 8, iters)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val local = localKmeans(vs, 8, iters, 1L << 20).toMap
      assert(dist.keySet == local.keySet)
      for ((cell, c) <- local)
        assert(dist(cell) == c, s"cell $cell diverged at iters=$iters")
    }
  }

  test("trained IVF balances the skewed corpus the lowest-id seeding collapses on") {
    // two tight blobs; the 4 lowest ids ALL sit in blob A, so lowest-id
    // seeding gives blob B (90% of the data) exactly one cell — the hot
    // cell that kills probe cost. One trained round must split it.
    val rnd = new scala.util.Random(7)
    def jitter(c: Seq[Double]) = c.map(_ + rnd.nextGaussian() * 0.01)
    val blobA = (0L until 10L).map(i => (i, jitter(Seq(1.0, 0.0, 0.0, 0.0))))
    val blobB = (10L until 100L).map { i =>
      val center = Seq(Seq(0.0, 1.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0, 0.0),
        Seq(0.0, 0.0, 0.0, 1.0))(i.toInt % 3)
      (i, jitter(center))
    }
    val skewed = (blobA ++ blobB).toDF("id", "vec")
    def ratio(assigned: org.apache.spark.sql.DataFrame): Double = {
      val r = assigned.groupBy($"cell").count()
        .agg(max($"count"), avg($"count")).head()
      r.getLong(0) / r.getDouble(1)
    }
    val lowestId = ratio(Similarity.ivfAssign(skewed, 4))
    val trained = ratio(Similarity.ivfAssignTrained(skewed, 4, 3))
    // lowest-id: blob B's 90 rows pile into one cosine-nearest cell
    assert(lowestId >= 2.0, s"skew fixture not skewed: lowest-id=$lowestId")
    // trained: 3 rounds must move centroids onto B's three sub-blobs
    assert(trained <= 1.5, s"training failed to balance: trained=$trained")
    // trained probe still finds its neighbors on the standard corpus
    val cents = Similarity.kmeansQuantized(corpus, 8, 2)
    val queries = corpus.filter($"id" < 10)
    val exact = Similarity.bruteForceTopK(queries, corpus, 3)
      .select($"query_id", $"neighbor_id")
    val hits = exact.join(
      Similarity.ivfTopKWith(queries, corpus, cents, 3, 3)
        .select($"query_id", $"neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(hits >= (exact.count() * 0.5).toLong,
      s"trained probe recall collapsed: $hits/${exact.count()}")
  }

  test("farthest-point seeding reaches the balance gate in less than half the iterations of lowest-id") {
    // adversarial id order, worst case: the lowest 8 ids are EXACTLY
    // coincident (a duplicated header row) — all-tie assignment funnels
    // everything to the lowest cid each round, so lowest-id k-means
    // peels ONE centroid per round while the twins sit dead;
    // farthest-point seeding places one seed per mass immediately
    val rnd = new scala.util.Random(7)
    def jitter(c: Seq[Double]) = c.map(_ + rnd.nextGaussian() * 0.01)
    val blobA = (0L until 8L).map(i => (i, Seq(1.0, 0.0, 0.0, 0.0)))
    val centers = Seq(
      Seq(0.0, 4.0, 0.0, 0.0), Seq(0.0, 0.0, 4.0, 0.0),
      Seq(0.0, 0.0, 0.0, 4.0), Seq(0.0, -4.0, 0.0, 0.0),
      Seq(0.0, 0.0, -4.0, 0.0), Seq(0.0, 0.0, 0.0, -4.0),
      Seq(4.0, 4.0, 0.0, 0.0))
    val blobB = (8L until 92L).map(i =>
      (i, jitter(centers((i % 7).toInt))))
    val skewed = (blobA ++ blobB).toDF("id", "vec")
    // NOTE: raw cell-count balance is fooled here — four coincident
    // centroids split the corpus evenly by jitter while pruning nothing.
    // The quantization quality metric that cannot be gamed is the WSS
    // (sum of squared distances to the assigned centroid): coincident
    // centroids sit near the global mean with WSS ~ the data's total
    // variance, separated ones drop it to the jitter scale.
    def wssAt(seeds: Seq[(Long, Seq[Double])], iters: Int): Double =
      Similarity.assignToCentroids(skewed,
          Similarity.kmeansQuantizedFrom(skewed, seeds, iters))
        .agg(sum($"dist")).head().getDouble(0)
    val lowSeeds = skewed.orderBy($"id").limit(8)
      .select($"id", $"vec").as[(Long, Seq[Double])].collect().toSeq
    val farSeeds = Similarity.kmeansSeedsFarthest(skewed, 8)
    // the farthest chain must have escaped blob A: at most one seed there
    assert(farSeeds.count(_._1 < 8L) <= 1,
      s"farthest seeds failed to spread: ${farSeeds.map(_._1)}")
    // one round from farthest seeds is already a good quantizer; count
    // the rounds lowest-id needs to match it (cap 8)
    val target = wssAt(farSeeds, 1) * 1.05
    val lowIters = (1 to 8).find(wssAt(lowSeeds, _) <= target).getOrElse(9)
    assert(lowIters > 2,
      s"lowest-id must need > 2x the iterations to match the 1-round " +
        s"farthest-point WSS, took $lowIters")
  }

  test("farthest-point seeding refuses when the sample has fewer distinct vectors than k") {
    // 2 distinct vectors, k=4: from round 3 every remaining min-distance
    // is 0 and the argmax would silently re-pick an already-chosen seed —
    // padding the result with duplicates (fewer effective clusters). The
    // loop must refuse loudly instead, like the empty-sample case.
    val df = ((0L until 10L).map(i => (i, Seq(1.0, 2.0))) :+
      ((10L, Seq(3.0, 4.0)))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException](
      Similarity.kmeansSeedsFarthest(df, 4))
    assert(e.getMessage.contains("distinct"), e.getMessage)
    // at k = the distinct count the greedy chain still completes
    assert(Similarity.kmeansSeedsFarthest(df, 2).map(_._1) == Seq(0L, 10L))
  }

  test("clustered fixture: k-means++ preserves density where farthest-point chases outliers") {
    // The synthetic embeddings tables are structureless (NOTES r17: trained
    // vs raw recall 0.17 = 0.17 at sf0.1 — nothing to learn), so the ANN
    // quality gates there mostly prove determinism. This fixture has real
    // structure — 8 well-separated Gaussian blobs (seeded, deterministic),
    // an adversarial id head (the 16 lowest ids all in blob 0, so lowest-id
    // seeding starts coincident) and 4 extreme outlier points — and carries
    // the retrieval-quality contrasts:
    //   1. farthest-point (k-center argmax) burns seeds on ALL 4 outliers;
    //      D²-weighted k-means++ picks none (outliers hold ~9% of the D²
    //      mass but 100% of the argmax);
    //   2. ONE k-means++-seeded training round out-quantizes farthest by
    //      >2x WSS and even EIGHT lowest-id rounds (measured 10094 vs
    //      23377 vs 12639; untrained 68631);
    //   3. probe recall: kpp-seeded = 1.0 on this fixture, >= farthest's.
    // Recall at fixed nprobe is deliberately NOT the untrained-vs-trained
    // gate: merged cells hurt probe COST, not recall (a giant cell
    // subsidizes recall — candidate counts measured within 20% across
    // seedings here), so WSS carries that contrast.
    val rnd = new scala.util.Random(42)
    def jit() = rnd.nextGaussian() * 0.5
    val anchors = (0 until 8).map(b =>
      Seq.tabulate(8)(d => if (d == b) 10.0 else 0.0))
    val pts =
      (0L until 16L).map(i => (i, anchors(0).map(_ + jit()))) ++
        (16L until 400L).map(i => (i, anchors((i % 8).toInt).map(_ + jit()))) ++
        (400L until 404L).map(i =>
          (i, Seq.tabulate(8)(d => if (d == (i % 8).toInt) 40.0 else 0.0)))
    val df = spark.createDataFrame(pts).toDF("id", "vec")
      .repartition(4).persist()
    try {
      val far = Similarity.kmeansSeedsFarthest(df, 8)
      val kpp = Similarity.kmeansSeedsKpp(df, 8)
      val outliers = (400L until 404L).toSet
      assert(far.count(s => outliers(s._1)) == 4,
        s"k-center greedy must chase all 4 outliers: ${far.map(_._1)}")
      assert(kpp.count(s => outliers(s._1)) == 0,
        s"D²-weighted sampling must not burn seeds on outliers: ${kpp.map(_._1)}")
      def wss(cents: org.apache.spark.sql.DataFrame): Double =
        Similarity.assignToCentroids(df, cents)
          .agg(sum($"dist")).head().getDouble(0)
      val wssKpp = wss(Similarity.kmeansQuantizedFrom(df, kpp, 1))
      val wssFar = wss(Similarity.kmeansQuantizedFrom(df, far, 1))
      val wssLow8 = wss(Similarity.kmeansQuantized(df, 8, 8))
      val wssUntrained = wss(df.orderBy($"id").limit(8)
        .select($"id".as("cell"), $"vec".as("centroid")))
      assert(wssKpp < 0.5 * wssFar,
        s"one kpp round must halve farthest's WSS: $wssKpp vs $wssFar")
      assert(wssKpp < wssLow8,
        s"one kpp round must beat 8 lowest-id rounds: $wssKpp vs $wssLow8")
      assert(wssLow8 < 0.33 * wssUntrained,
        s"training must beat untrained by 3x WSS: $wssLow8 vs $wssUntrained")
      val queries = df.filter($"id" >= 16 && $"id" < 36)
      val exact = Similarity.bruteForceTopK(queries, df, 5)
        .select($"query_id", $"neighbor_id").persist()
      val nEx = exact.count()
      def recall(seeds: Seq[(Long, Seq[Double])]): Double = {
        val cents = Similarity.kmeansQuantizedFrom(df, seeds, 1)
        val probed = Similarity.ivfProbe(queries,
          Similarity.assignToCentroids(df, cents), cents, 2, 5)
          .select($"query_id", $"neighbor_id")
        exact.join(probed, Seq("query_id", "neighbor_id"), "left_semi")
          .count().toDouble / nEx
      }
      val (rKpp, rFar) = (recall(kpp), recall(far))
      assert(rKpp >= 0.98 && rKpp >= rFar,
        s"kpp-seeded probe recall must lead on clustered data: $rKpp vs $rFar")
      exact.unpersist()
    } finally df.unpersist()
  }

  test("residual-trained PQ holds recall where the lowest-id codebook collapses") {
    // Jégou §III's actual claim: sub-quantizers trained on residuals
    // resolve structure the untrained (lowest-id) codebook cannot. The
    // kSub lowest ids are ZERO vectors (padding rows — the realistic
    // degenerate head of an id-ordered corpus): every untrained
    // sub-centroid coincides at the origin, so all codes collapse to the
    // lowest cid, every candidate's ADC distance is the same constant,
    // and ranking degenerates to neighbor-id order — recall ~0 for
    // queries whose true neighbors are high-id. Training escapes: each
    // quantized-Lloyd's round peels one coincident seed onto a real mass
    // of data (all-tie assignment goes to the lowest cid, whose recompute
    // moves it; the bisector against the remaining origin seeds then
    // splits off the next group), so after a few rounds the sub-centroids
    // cover the clusters and cluster-level ranking works.
    val rnd = new scala.util.Random(13)
    def jit() = rnd.nextGaussian() * 0.05
    val centers = Seq(
      Seq(2.0, 2.0), Seq(-2.0, 2.0), Seq(2.0, -2.0), Seq(-2.0, -2.0))
    // dim 8 = 4 blocks of 2; each vector repeats its cluster's 2-dim
    // corner in every block, with independent per-block jitter;
    // UNBALANCED sizes keep the global mean off the origin (a balanced
    // mix would put the first peeled centroid back on the dead seeds)
    def vecOf(cluster: Int) =
      (0 until 4).flatMap(_ => centers(cluster).map(_ + jit()))
    val seeds = (0L until 8L).map(i => (i, Seq.fill(8)(0.0)))
    val rest = (8L until 36L).map(i => (i, vecOf((i % 4).toInt))) ++
      (36L until 44L).map(i => (i, vecOf(0))) // extra mass in cluster 0
    val c = (seeds ++ rest).toDF("id", "vec")
    // queries from clusters 1-3: their true neighbors are high-id rows,
    // exactly what id-order ranking cannot find
    val queries = c.filter($"id" >= 8L && $"id" < 36L && $"id" % 4 =!= 0)
    // zero vectors have no cosine (0-norm): the exact reference ranks the
    // real rows only — the ADC variants still see the zero rows, which is
    // the point (they must not surface them for these queries)
    val exact = Similarity.bruteForceTopK(queries, c.filter($"id" >= 8L), 5)
      .select($"query_id", $"neighbor_id")
    val nExact = exact.count()
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      exact.join(df.select($"query_id", $"neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count().toDouble / nExact
    // nprobe = nCells: both variants see every candidate — the delta is
    // the codebook alone
    val untrained = recall(Similarity.ivfAdcTopK(queries, c,
      2, 1, 2, 8, 4, 8, 5))
    val trained = recall(Similarity.ivfAdcResidualTopK(queries, c,
      2, 1, 2, 8, 4, 8, 6, 5))
    assert(trained >= 0.5, s"trained-residual recall collapsed: $trained")
    assert(untrained <= 0.2,
      s"zero-seed codebook must collapse: untrained=$untrained trained=$trained")
  }

  test("pqCodebookTrained: iters=0 is exactly the untrained codebook; training moves it") {
    val dcorpus = corpus.select(col("id"), col("vec").cast("array<double>").as("vec"))
    val cb0 = Similarity.pqCodebookTrained(dcorpus, 64, 4, 8, 0)
      .orderBy($"block", $"cid")
      .as[(Int, Long, Seq[Double])].collect()
    // iters=0 = sub-blocks of the 8 lowest-id vectors, bit-for-bit
    val lows = dcorpus.orderBy($"id").limit(8)
      .as[(Long, Seq[Double])].collect()
    val expect = (for ((id, v) <- lows; j <- 0 until 4)
      yield (j, id, v.slice(j * 16, j * 16 + 16))).sortBy(t => (t._1, t._2))
    assert(cb0.toSeq == expect.toSeq)
    val cb2 = Similarity.pqCodebookTrained(dcorpus, 64, 4, 8, 2)
      .orderBy($"block", $"cid")
      .as[(Int, Long, Seq[Double])].collect()
    assert(cb2.toSeq != cb0.toSeq, "two training rounds must move the codebook")
    assert(cb2.length == 32 && cb2.forall(_._3.length == 16))
  }

  test("pqEncode: codebook vectors encode to themselves; codes are in range") {
    val dcorpus = corpus.select(col("id"), col("vec").cast("array<double>").as("vec"))
    val dim = dcorpus.select(size(col("vec"))).first().getInt(0)
    val codes = Similarity.pqEncode(dcorpus, dim, m = 4, k = 16)
    // the k codebook vectors are their own nearest sub-centroids in every block
    val self = codes.filter(col("id") < 16)
      .filter((0 until 4).map(j => col(s"code$j") === col("id")).reduce(_ && _))
    assert(self.count() == 16, "codebook rows must self-encode")
    // every vector gets m codes, each a valid centroid id
    val bad = codes.filter((0 until 4).map(j =>
      col(s"code$j").isNull || col(s"code$j") < 0 || col(s"code$j") >= 16)
      .reduce(_ || _))
    assert(bad.isEmpty)
    assert(codes.count() == dcorpus.count())
  }

  test("pqTopK: k ranked neighbors per query, no self-matches, asc distance") {
    val dcorpus = corpus.select(col("id"), col("vec").cast("array<double>").as("vec"))
    val dim = dcorpus.select(size(col("vec"))).first().getInt(0)
    val top = Similarity.pqTopK(dcorpus.filter(col("id") < 5), dcorpus,
      dim, m = 4, kCentroids = 16, k = 3).cache()
    assert(top.filter(col("query_id") === col("neighbor_id")).isEmpty)
    val perQuery = top.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mr"))
    assert(perQuery.filter(col("n") =!= 3 || col("mr") =!= 3).isEmpty)
    // rank order must agree with distance order within each query
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    val bad = top.withColumn("prev_d", lag(col("adc_dist"), 1).over(w))
      .filter(col("prev_d") > col("adc_dist"))
    assert(bad.isEmpty, "adc_dist must be non-decreasing in rank")
    top.unpersist()
  }

  test("pqEncode validates dim/m/k") {
    val dcorpus = corpus.select(col("id"), col("vec").cast("array<double>").as("vec"))
    intercept[IllegalArgumentException] {
      Similarity.pqEncode(dcorpus, dim = 64, m = 5, k = 4) // 64 % 5 != 0
    }
    intercept[IllegalArgumentException] {
      Similarity.pqEncode(dcorpus, dim = 64, m = 4, k = 0)
    }
  }

  test("semantic dedup: cell-blocked pairs are a subset of exact pairs; survivors follow the greedy rule") {
    val exact = Similarity.cosineNearDupPairs(corpus, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val pairs = Similarity.semanticDedupPairs(corpus, 16, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(exact), "cell blocking must not invent pairs")
    val survivors = Similarity.semanticDedupSurvivors(corpus, 16, 0.4)
      .select("id").as[Long].collect().toSet
    val losers = pairs.map(_._2)
    val all = corpus.select("id").as[Long].collect().toSet
    assert(survivors == all.diff(losers),
      "a vector is dropped iff it has a lower-id near-dup in its cell")
    assert(losers.nonEmpty, "test corpus has planted embedding near-dups")
  }

  test("blocked near-dup pairs are a thresholded subset of the exact pairs") {
    val exact = Similarity.cosineNearDupPairs(corpus, 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val blocked = Similarity.cosineNearDupPairsBlocked(corpus, 0.3, 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked.subsetOf(exact), "blocking must not invent pairs")
    assert(exact.isEmpty ||
      blocked.size.toDouble / exact.size > 0.2,
      s"blocked recall ${blocked.size}/${exact.size}")
  }
}
