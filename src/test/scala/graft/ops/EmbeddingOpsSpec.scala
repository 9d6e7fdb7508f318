package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class EmbeddingOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def vecDf(vs: (Long, Seq[Float])*) =
    vs.toSeq.toDF("vec_id", "embedding")

  test("l2Norm / l2Normalize: hand-computed 3-4-5, zero vector stays zero") {
    val df = vecDf(
      1L -> Seq(3.0f, 4.0f),
      2L -> Seq(0.0f, 0.0f))
    val out = df.select(col("vec_id"),
      EmbeddingOps.l2Norm(col("embedding")).as("n"),
      EmbeddingOps.l2Normalize(col("embedding")).as("u"))
      .orderBy("vec_id").collect()
    assert(out(0).getDouble(1) === 5.0)
    assert(out(0).getSeq[Double](2) == Seq(0.6, 0.8))
    // zero vector: zero norm, zero output, no NaN/Inf from the division
    assert(out(1).getDouble(1) === 0.0)
    assert(out(1).getSeq[Double](2) == Seq(0.0, 0.0))
  }

  test("quantizeInt8: absmax scheme, half-up rounding, extreme maps to ±127") {
    val df = vecDf(1L -> Seq(1.27f, -0.635f, 0.0f))
    val r = df.select(
      EmbeddingOps.int8Scale(col("embedding")).as("s"),
      EmbeddingOps.quantizeInt8(col("embedding")).as("q")).head()
    assert(math.abs(r.getDouble(0) - 0.01) < 1e-9)
    // -0.635/0.01 = -63.5 → floor(-63.5 + 0.5) = -63 (half-up, not
    // round-half-even); the absmax element lands exactly on 127
    assert(r.getSeq[Long](1) == Seq(127L, -63L, 0L))
  }

  test("quantizeInt8: zero vector quantizes to zeros (no div-by-zero)") {
    val df = vecDf(1L -> Seq(0.0f, 0.0f, 0.0f))
    val r = df.select(EmbeddingOps.quantizeInt8(col("embedding")).as("q")).head()
    assert(r.getSeq[Long](0) == Seq(0L, 0L, 0L))
  }

  test("dequantMaxError clears the scale/2 bound on real embeddings") {
    val e = graft.Tables.embeddings(spark, sfTest)
    val bad = e.select(
      (EmbeddingOps.dequantMaxError(col("embedding"),
        EmbeddingOps.quantizeInt8(col("embedding")))
        <= EmbeddingOps.int8Scale(col("embedding")) / 2 + lit(1e-12)).as("ok"))
      .where(!col("ok")).count()
    assert(bad === 0L)
  }

  test("embeddingStats: counts, dim bounds surface raggedness, exact micro-norm mean") {
    val df = Seq(
      (0, Seq(3.0f, 4.0f)),   // norm 5
      (0, Seq(6.0f, 8.0f)),   // norm 10
      (1, Seq(1.0f, 0.0f, 0.0f))) // norm 1, dim 3 — ragged vs label 0
      .toDF("label", "embedding")
    val out = EmbeddingOps.embeddingStats(df, "label", "embedding")
      .orderBy("label").collect()
    assert(out(0).getAs[Long]("n_vecs") === 2L)
    assert(out(0).getAs[Long]("min_dim") === 2L)
    assert(out(0).getAs[Double]("norm_avg") === 7.5)
    assert(out(0).getAs[Double]("norm_min") === 5.0)
    assert(out(0).getAs[Double]("norm_max") === 10.0)
    assert(out(1).getAs[Long]("min_dim") === 3L)
    assert(out(1).getAs[Double]("norm_avg") === 1.0)
  }

  test("normalize → quantize round-trip keeps cosine structure (sanity at sf0.001)") {
    // quantized-then-dequantized vectors should still rank an identical
    // vector first — the int8 path is lossy but order-preserving at k=1
    val e = graft.Tables.embeddings(spark, sfTest)
      .where(col("vec_id") < 50)
    val deq = e.select(col("vec_id"),
      EmbeddingOps.int8Scale(col("embedding")).as("s"),
      EmbeddingOps.quantizeInt8(col("embedding")).as("q"))
      .select(col("vec_id"),
        expr("transform(q, x -> cast(x * s AS FLOAT))").as("embedding"))
    // compare against the ORIGINAL embeddings — a deq-vs-deq self join
    // would read cos 1.0 for any quantizer, even a broken one
    val self = e.as("a").join(deq.as("b"),
        col("a.vec_id") === col("b.vec_id"))
      .select(graft.expressions.CosineSimilarity.cosineFast(
        col("a.embedding"), col("b.embedding")).as("c"))
      .agg(min("c")).head().getDouble(0)
    assert(self > 0.999, s"original-vs-dequant cosine: $self")
  }

  test("kmeans: separated blobs recover their clusters; ids drive init") {
    import spark.implicits._
    // Two far-apart 2-D blobs. Init = the k smallest ids' vectors — ids 0
    // and 1 sit in DIFFERENT blobs, so after any number of iterations the
    // assignment is the blob split, regardless of the jitter.
    val rows = Seq(
      (0L, Seq(0.00f, 0.01f)), (2L, Seq(0.02f, -0.01f)),
      (4L, Seq(-0.01f, 0.02f)),
      (1L, Seq(0.90f, 0.89f)), (3L, Seq(0.91f, 0.92f)),
      (5L, Seq(0.88f, 0.90f)))
    val df = rows.toDF("vec_id", "embedding")
    val got = EmbeddingOps.kmeansAssignments(df, "vec_id", "embedding",
      k = 2, iterations = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 2L -> 0L, 4L -> 0L,
      1L -> 1L, 3L -> 1L, 5L -> 1L))
    // partitioning invariance: long sums + integral division are
    // associative/deterministic, so a different layout changes nothing
    val re = EmbeddingOps.kmeansAssignments(df.repartition(5),
      "vec_id", "embedding", k = 2, iterations = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(re === got)
  }

  test("kmeans: equidistant point breaks ties to the smaller cluster index") {
    import spark.implicits._
    // One iteration, so assignment runs against the init centroids
    // themselves: (0) and (1). The point at exactly 0.5 is equidistant on
    // the micro-unit grid — the (dist, cl) struct-min must pick cluster 0.
    val df = Seq((0L, Seq(0.0f)), (1L, Seq(1.0f)), (7L, Seq(0.5f)))
      .toDF("vec_id", "embedding")
    val got = EmbeddingOps.kmeansAssignments(df, "vec_id", "embedding",
      k = 2, iterations = 1)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 7L -> 0L))
  }

  test("covarianceMatrix: hand-computed 2-dim case, exact sums, 4-dp cov") {
    // rows (1, 2), (3, 6), (5, 10): y = 2x exactly. Quantized ×10⁴:
    // x: 10000, 30000, 50000 → var = E[x²]−E[x]² = (35e8/3 − 9e8)
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 6.0f)), (3L, Seq(5.0f, 10.0f)))
      .toDF("vec_id", "embedding")
    val got = EmbeddingOps.covarianceMatrix(df, "embedding")
      .orderBy("i", "j")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    // sxy(0,0) = 1e8+9e8+25e8 = 35e8; sx = 9e4
    // cov(0,0) = (35e8/3 − 3e4·3e4)/1e8 = (1166666666.67 − 9e8)/1e8 ≈ 2.6667
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)) === Seq(
      (0L, 0L, 3L, 3500000000L, 90000L, 90000L),
      (0L, 1L, 3L, 7000000000L, 90000L, 180000L),
      (1L, 1L, 3L, 14000000000L, 180000L, 180000L)))
    assert(got.map(_._7) === Seq(2.6667, 5.3333, 10.6667))
  }

  test("topEigenvector: a planted spike is recovered; lambda estimates its energy") {
    // 100 rows of ~e0 with a tiny alternating e1 component: top direction
    // of the uncentered second moment is e0, gap is huge → 6 steps settle
    val rows = (1L to 100L).map(r =>
      (r, Seq(1.0f, 0.01f * (r % 2), 0.0f, 0.0f)))
    val got = EmbeddingOps.topEigenvector(
      rows.toDF("vec_id", "embedding"), "embedding")
      .orderBy("i").as[(Long, Long, Option[Double])].collect().toSeq
    assert(got.map(_._1) === Seq(0L, 1L, 2L, 3L))
    assert(math.abs(got.head._2) > 99000L,
      s"dominant component should carry ~all mass: ${got.map(_._2)}")
    assert(got.drop(2).forall(r => math.abs(r._2) < 100L))
    // λ ≈ Σ x₀² / ‖v‖² ≈ 100·1.0 in raw units
    assert(math.abs(got.head._3.get - 100.0) < 2.0, got.head._3.toString)
  }

  test("powerIterate: zero matrix degenerates loudly to v=0, null lambda") {
    val g = Seq((0L, 0L, 0L), (0L, 1L, 0L), (1L, 0L, 0L), (1L, 1L, 0L))
      .toDF("i", "j", "s")
    val got = EmbeddingOps.powerIterate(g, iters = 2, shift = 10L)
      .orderBy("i").as[(Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq((0L, 0L, None), (1L, 0L, None)))
  }

  test("covarianceMatrix: partition-layout invariant; null vectors excluded") {
    val rows = (1L to 300L).map(i =>
      (i, Option(Seq((i % 7).toFloat / 10f, (i % 5).toFloat / 10f,
        (i % 3).toFloat / 10f)))) :+ ((301L, Option.empty[Seq[Float]]))
    val df = rows.toDF("vec_id", "embedding")
    def run(parts: Int) =
      EmbeddingOps.covarianceMatrix(df.repartition(parts), "embedding")
        .orderBy("i", "j")
        .as[(Long, Long, Long, Long, Long, Long, Double)].collect().toSeq
    val one = run(1)
    assert(one === run(17))
    assert(one.size === 6 && one.forall(_._3 === 300L))
  }

  test("pqCodes: each subspace equals the Lloyd loop run on that slice") {
    import org.apache.spark.sql.functions._
    // 6 vectors of dim 4, two clearly separated blobs per half so the
    // 2-codeword quantizers are meaningful in both subspaces
    val df = Seq(
      (1L, Seq(0.0f, 0.1f, 9.0f, 9.1f)), (2L, Seq(0.2f, 0.0f, 9.2f, 9.0f)),
      (3L, Seq(0.1f, 0.2f, 0.0f, 0.1f)), (4L, Seq(9.0f, 9.1f, 0.2f, 0.0f)),
      (5L, Seq(9.2f, 9.0f, 9.1f, 9.2f)), (6L, Seq(9.1f, 9.2f, 0.1f, 0.2f)))
      .toDF("vec_id", "embedding")
    val got = EmbeddingOps.pqCodes(df, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, iterations = 2)
      .orderBy("vec_id", "subspace")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // reference: the same deterministic kmeans on each half, tagged
    val ref = (0 until 2).flatMap { j =>
      EmbeddingOps.kmeansAssignments(
        df.select(col("vec_id"),
          slice(col("embedding"), j * 2 + 1, 2).as("embedding")),
        "vec_id", "embedding", k = 2, iterations = 2)
        .as[(Long, Long, Long)].collect().toSeq
        .map { case (id, cl, dist) => (id, j.toLong, cl, dist) }
    }.sortBy(r => (r._1, r._2))
    assert(got === ref)
    // subspace codes must DISAGREE for vectors whose halves cluster
    // differently (1 and 3 share no blob in the first half but...) —
    // concretely: the code matrix carries more than one distinct row
    assert(got.groupBy(_._1).values.map(_.map(_._3)).toSet.size > 1)
    intercept[IllegalArgumentException](
      EmbeddingOps.pqCodes(df, "vec_id", "embedding", dim = 4, m = 3,
        k = 2, iterations = 1))
  }

  test("randomProjection: exact signed sums, engine-replayable sign matrix") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f)), (2L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = EmbeddingOps.randomProjection(df, "vec_id", "embedding",
      dim = 3, outDim = 2).orderBy("vec_id", "k")
      .as[(Long, Long, Long)].collect().toSeq
    // recompute the md5-parity signs independently and fold by hand
    val mdig = java.security.MessageDigest.getInstance("MD5")
    def s(k: Int, d: Int): Long = {
      val h = mdig.digest(s"$k#$d".getBytes("UTF-8"))
      if (((h(0) >> 4) & 1) == 1) 1L else -1L
    }
    val v = Seq(1000000L, 2000000L, 3000000L)
    val want = for (k <- 0 to 1) yield
      (1L, k.toLong, (0 to 2).map(d => v(d) * s(k, d)).sum)
    assert(got.filter(_._1 == 1L) === want)
    // the zero vector projects to exactly zero in every component
    assert(got.filter(_._1 == 2L).forall(_._3 == 0L))
    intercept[IllegalArgumentException](
      EmbeddingOps.randomProjection(df, "vec_id", "embedding", 3, 0))
  }

  test("pqRecallAtK: identical-grid self-queries achieve bounded exact overlap") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq(0.0f, 0.1f, 9.0f, 9.1f)), (2L, Seq(0.2f, 0.0f, 9.2f, 9.0f)),
      (3L, Seq(0.1f, 0.2f, 0.0f, 0.1f)), (4L, Seq(9.0f, 9.1f, 0.2f, 0.0f)),
      (5L, Seq(9.2f, 9.0f, 9.1f, 9.2f)), (6L, Seq(9.1f, 9.2f, 0.1f, 0.2f)))
      .toDF("vec_id", "embedding")
    val got = EmbeddingOps.pqRecallAtK(df, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, iterations = 2, queryIds = Seq(1L, 4L),
      topK = 2, floor = 0.5).orderBy("qid")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    // recall is an exact fraction in (0, 1]; with topK=2 the overlap is
    // 1 or 2 of 2 — never 0, since the query itself tops both rankings
    assert(got.map(_._1) === Seq(1L, 4L))
    assert(got.forall(r => r._2 >= 1L && r._2 <= 2L))
    assert(got.forall(r => r._3 == r._2 / 2.0))
    // the floor gate rides in the output: every recall here is >= 0.5
    assert(got.forall(_._4))
  }

  test("ivfadcTopK: candidates outside probed cells are NEVER scored") {
    import org.apache.spark.sql.functions._
    // Two well-separated clusters; ids interleave (A odd, B even) so the
    // smallest-ids Lloyd init seeds one coarse centroid per cluster and
    // the 2-cell partition is exact. nprobe=1: each query probes ONLY
    // its own cluster's cell — the other cluster must be invisible to
    // it, whatever its ADC distance would have been.
    val df = Seq(
      (1L, Seq(0.0f, 0.1f, 0.0f, 0.0f)), (3L, Seq(0.1f, 0.0f, 0.1f, 0.0f)),
      (5L, Seq(0.0f, 0.0f, 0.1f, 0.1f)),
      (2L, Seq(9.0f, 9.1f, 9.0f, 9.0f)), (4L, Seq(9.1f, 9.0f, 9.1f, 9.0f)),
      (6L, Seq(9.0f, 9.0f, 9.1f, 9.1f)))
      .toDF("vec_id", "embedding")
    val got = EmbeddingOps.ivfadcTopK(df, "vec_id", "embedding",
      dim = 4, nlist = 2, nprobe = 1, m = 2, k = 2, iterations = 2,
      queryIds = Seq(1L, 2L), topK = 6).orderBy("qid", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val byQ = got.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(byQ(1L) === Set(1L, 3L, 5L), byQ.toString)
    assert(byQ(2L) === Set(2L, 4L, 6L), byQ.toString)
    // the query's own row tops its ranking (zero coarse+PQ residual)
    assert(got.filter(_._2 == 1L).map(r => (r._1, r._3)) ===
      Seq((1L, 1L), (2L, 2L)))
    // deterministic under a different input partitioning
    val re = EmbeddingOps.ivfadcTopK(df.repartition(5), "vec_id",
      "embedding", dim = 4, nlist = 2, nprobe = 1, m = 2, k = 2,
      iterations = 2, queryIds = Seq(1L, 2L), topK = 6)
      .orderBy("qid", "rank").as[(Long, Long, Long, Long)].collect().toSeq
    assert(re === got)
    intercept[IllegalArgumentException](
      EmbeddingOps.ivfadcTopK(df, "vec_id", "embedding", 4, 2, 3, 2, 2, 2,
        Seq(1L), 3))
  }

  test("ivfadcTopK rerank (+R): exact order within probed cells, still cell-pruned") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq(0.0f, 0.1f, 0.0f, 0.0f)), (3L, Seq(0.1f, 0.0f, 0.1f, 0.0f)),
      (5L, Seq(0.0f, 0.0f, 0.1f, 0.1f)),
      (2L, Seq(9.0f, 9.1f, 9.0f, 9.0f)), (4L, Seq(9.1f, 9.0f, 9.1f, 9.0f)),
      (6L, Seq(9.0f, 9.0f, 9.1f, 9.1f)))
      .toDF("vec_id", "embedding")
    // R covers the whole probed cell → the served ranking IS the exact
    // L2 ranking over the cell: self first (distance 0), then the two
    // mates — exact-distance ties totalized by id
    val got = EmbeddingOps.ivfadcTopK(df, "vec_id", "embedding",
      dim = 4, nlist = 2, nprobe = 1, m = 2, k = 2, iterations = 2,
      queryIds = Seq(1L, 2L), topK = 3, rerank = 6)
      .orderBy("qid", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) === Seq(
      (1L, 1L, 1L), (1L, 2L, 3L), (1L, 3L, 5L),
      (2L, 1L, 2L), (2L, 2L, 4L), (2L, 3L, 6L)))
    // the re-rank leg must not re-admit the unprobed cell
    assert(got.filter(_._1 == 1L).map(_._3).toSet.subsetOf(Set(1L, 3L, 5L)))
    // rerank below topK is a contract error, not a silent truncation
    intercept[IllegalArgumentException](
      EmbeddingOps.ivfadcTopK(df, "vec_id", "embedding", 4, 2, 1, 2, 2, 2,
        Seq(1L), topK = 3, rerank = 2))
    // a query id absent from the corpus fails loudly, naming the id
    val e = intercept[IllegalArgumentException](
      EmbeddingOps.ivfadcTopK(df, "vec_id", "embedding", 4, 2, 1, 2, 2, 2,
        Seq(1L, 99L), topK = 3))
    assert(e.getMessage.contains("99"), e.getMessage)
  }

  test("ivfCellStats: balanced 2-cell corpus reads share 0.5, imbalance 1.0") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq(0.0f, 0.1f, 0.0f, 0.0f)), (3L, Seq(0.1f, 0.0f, 0.1f, 0.0f)),
      (5L, Seq(0.0f, 0.0f, 0.1f, 0.1f)),
      (2L, Seq(9.0f, 9.1f, 9.0f, 9.0f)), (4L, Seq(9.1f, 9.0f, 9.1f, 9.0f)),
      (6L, Seq(9.0f, 9.0f, 9.1f, 9.1f)))
      .toDF("vec_id", "embedding")
    val got = EmbeddingOps.ivfCellStats(df, "vec_id", "embedding",
      nlist = 2, iterations = 2).orderBy("cell")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._2) === Seq(3L, 3L))
    assert(got.forall(r => r._3 == 0.5 && r._4 == 1.0), got.toString)
  }

  test("ivfadcRecall: cluster-mates recalled perfectly through 1-cell probing") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq(0.0f, 0.1f, 0.0f, 0.0f)), (3L, Seq(0.1f, 0.0f, 0.1f, 0.0f)),
      (5L, Seq(0.0f, 0.0f, 0.1f, 0.1f)),
      (2L, Seq(9.0f, 9.1f, 9.0f, 9.0f)), (4L, Seq(9.1f, 9.0f, 9.1f, 9.0f)),
      (6L, Seq(9.0f, 9.0f, 9.1f, 9.1f)))
      .toDF("vec_id", "embedding")
    // exact top-3 of each query IS its cluster (mates are nearer than
    // anything across the gap), and the probed cell contains exactly the
    // cluster — recall 1.0 while scoring half the corpus
    val got = EmbeddingOps.ivfadcRecall(df, "vec_id", "embedding",
      dim = 4, nlist = 2, nprobe = 1, m = 2, k = 2, iterations = 2,
      queryIds = Seq(1L, 2L), topK = 3, floor = 0.9).orderBy("qid")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got === Seq((1L, 3L, true), (2L, 3L, true)))
  }

  test("pqAdcTopK: the query's own code combo is the ADC minimum; ranks total") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq(0.0f, 0.1f, 9.0f, 9.1f)), (2L, Seq(0.2f, 0.0f, 9.2f, 9.0f)),
      (3L, Seq(0.1f, 0.2f, 0.0f, 0.1f)), (4L, Seq(9.0f, 9.1f, 0.2f, 0.0f)),
      (5L, Seq(9.2f, 9.0f, 9.1f, 9.2f)), (6L, Seq(9.1f, 9.2f, 0.1f, 0.2f)))
      .toDF("vec_id", "embedding")
    val got = EmbeddingOps.pqAdcTopK(df, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, iterations = 2, queryIds = Seq(1L, 4L),
      topK = 3).orderBy("qid", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // per query: ranks 1..3, ADC distance non-decreasing, and rank 1 is
    // the query itself (its own codes pick each subspace's minimal LUT
    // entry, so no candidate can score below it; ties break to its id
    // only if another vector shares every code AND has a smaller id —
    // not the case here)
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet === Set(1L, 4L))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._2) === Seq(1L, 2L, 3L))
      assert(rows.map(_._4) === rows.map(_._4).sorted)
      assert(rows.head._3 === q)
    }
    // deterministic under a different input partitioning
    val re = EmbeddingOps.pqAdcTopK(df.repartition(5), "vec_id",
      "embedding", dim = 4, m = 2, k = 2, iterations = 2,
      queryIds = Seq(1L, 4L), topK = 3).orderBy("qid", "rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(re === got)
    intercept[IllegalArgumentException](
      EmbeddingOps.pqAdcTopK(df, "vec_id", "embedding", 4, 2, 2, 2,
        queryIds = Seq.empty, topK = 3))
  }
  test("dimCodebook/quantizeDimsCodes: extremes map to 0/255, constant dim codes 0") {
    // dim0 spans [0, 2] → sc = 2/255: x=0 codes 0, x=2 codes 255,
    // x=1 codes floor(127.5 + 0.5) = 128. dim1 is constant → sc = 0,
    // every code 0 and reconstruction is exactly mn.
    val df = vecDf(1L -> Seq(0.0f, 10.0f), 2L -> Seq(1.0f, 10.0f),
      3L -> Seq(2.0f, 10.0f))
    val cb = EmbeddingOps.dimCodebookRow(df, "embedding")
    val got = df.crossJoin(broadcast(cb))
      .select(col("vec_id"),
        EmbeddingOps.quantizeDimsCodes(col("embedding"),
          col("__mns"), col("__scs")).as("q"))
      .orderBy("vec_id")
      .as[(Long, Seq[Long])].collect().toSeq
    assert(got === Seq(1L -> Seq(0L, 0L), 2L -> Seq(128L, 0L),
      3L -> Seq(255L, 0L)))
    // the codebook row itself: mns in pos order, constant dim's sc = 0
    val row = cb.head()
    assert(row.getSeq[Double](0) === Seq(0.0, 10.0))
    assert(row.getSeq[Double](1)(1) === 0.0)
  }

  test("quantizeDimsReport: half-step bound holds corpus-wide; codes stay in [0,255]") {
    val rep = EmbeddingOps.quantizeDimsReport(
      graft.Tables.embeddings(spark, sfTest), "vec_id", "embedding")
    val rows = rep.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("err_ok")))
    assert(rows.forall(r => r.getAs[Long]("q_min") >= 0L
      && r.getAs[Long]("q_max") <= 255L))
    // the corpus-level codebook REALIZES the shared range: some vector
    // touches 0 and some touches 255 in at least one dimension
    assert(rows.exists(_.getAs[Long]("q_min") == 0L))
    assert(rows.exists(_.getAs[Long]("q_max") == 255L))
  }

  test("knnSq8Report: total ranks, monotone code distance, recall in (0,1]") {
    val e = graft.Tables.embeddings(spark, sfTest)
    val got = EmbeddingOps.knnSq8Report(e.where(col("vec_id") < 5), e,
      "vec_id", "embedding", k = 3).orderBy("qid", "rnk")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._2) === Seq(1L, 2L, 3L))       // ranks total
      assert(rows.map(_._4) === rows.map(_._4).sorted) // d2 monotone
      assert(rows.forall(_._3 != q))                   // self excluded
      assert(rows.forall(r => r._5 > 0.0 && r._5 <= 1.0))
    }
    // integer ranking keys → layout invariance is exact
    val re = EmbeddingOps.knnSq8Report(e.where(col("vec_id") < 5),
      e.repartition(7), "vec_id", "embedding", k = 3)
      .orderBy("qid", "rnk")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(re === got)
  }

  test("knnIvfSq8: unprobed cells are invisible; blob mates serve at recall 1.0") {
    // Two far-apart blobs, ids interleaved so the smallest-ids Lloyd
    // init seeds one coarse centroid per blob; nprobe=1 → each query
    // sees ONLY its own cell, and since the exact SQ8 top-2 is the blob
    // (mates nearer than anything across the gap), recall reads 1.0
    // while half the corpus is never scored.
    val df = Seq(
      (1L, Seq(0.0f, 0.1f, 0.0f, 0.0f)), (3L, Seq(0.1f, 0.0f, 0.1f, 0.0f)),
      (5L, Seq(0.0f, 0.0f, 0.1f, 0.1f)),
      (2L, Seq(9.0f, 9.1f, 9.0f, 9.0f)), (4L, Seq(9.1f, 9.0f, 9.1f, 9.0f)),
      (6L, Seq(9.0f, 9.0f, 9.1f, 9.1f)))
      .toDF("vec_id", "embedding")
    val got = EmbeddingOps.knnIvfSq8(df, "vec_id", "embedding",
      nlist = 2, nprobe = 1, iterations = 2, queryIds = Seq(1L, 2L),
      topK = 2).orderBy("qid", "rnk")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    val byQ = got.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(byQ === Map(1L -> Set(3L, 5L), 2L -> Set(4L, 6L)))
    assert(got.forall(_._6 === 1.0), got.toString)
    // integer keys end to end → exact layout invariance
    val re = EmbeddingOps.knnIvfSq8(df.repartition(5), "vec_id",
      "embedding", nlist = 2, nprobe = 1, iterations = 2,
      queryIds = Seq(1L, 2L), topK = 2).orderBy("qid", "rnk")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(re === got)
    intercept[IllegalArgumentException](
      EmbeddingOps.knnIvfSq8(df, "vec_id", "embedding", 2, 3, 2,
        Seq(1L), 2))
  }

  test("embeddingDriftPsi: identical snapshots read exactly zero; a shift reads drift") {
    val e = graft.Tables.embeddings(spark, sfTest)
    // identical sides: every bin has ca == cb, every smoothed term is 0,
    // so psi is EXACTLY 0.0 per direction (not approximately)
    val same = EmbeddingOps.embeddingDriftPsi(e, e, "embedding", dims = 64)
      .select("p", "psi").as[(Long, Double)].collect().toMap
    assert(same.size == 4 && same.values.forall(_ == 0.0))
    // shift one side by a constant along every dim: projections move by
    // shift * sum(signs), histograms separate, psi strictly positive
    val shifted = e.select(col("vec_id"),
      expr("transform(embedding, x -> x + CAST(2.0 AS FLOAT))")
        .as("embedding"))
    val drift = EmbeddingOps.embeddingDriftPsi(e, shifted, "embedding",
      dims = 64).select("p", "psi").as[(Long, Double)].collect().toMap
    assert(drift.values.forall(_ > 0.25), s"expected drift, got $drift")
    // vectors of the wrong width are excluded, not null-poisoned
    val short = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    assert(EmbeddingOps.embeddingDriftPsi(short, short, "embedding",
      dims = 64).count() == 0L)
    intercept[IllegalArgumentException](
      EmbeddingOps.embeddingDriftPsi(e, e, "embedding", dims = 0))
  }
}
