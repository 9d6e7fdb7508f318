package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.CoreOps

/** Similarity search over embedding columns (`ARRAY<FLOAT>`): brute-force
  * cosine top-k as the exact baseline, and an LSH-bucketed variant as the
  * scale path (north-star extension tier).
  *
  * Scale design: cosine is a per-pair codegen'd expression (float products
  * are exact in double); brute force broadcasts the (small) query set so
  * the candidate side streams with no shuffle; the LSH variant shuffles
  * only (bucket, id, vector) and touches a fraction of the pair space.
  * Rank ties broken by candidate id so output order is engine-stable.
  */
object Similarity {

  /** Cosine similarity between two array columns via composable built-ins,
    * computed in double. Sequential fold order is fixed by the expression,
    * so results are deterministic for a given engine. The hot paths use the
    * fused codegen'd [[graft.expressions.CosineSimilarity]], which follows
    * the exact same accumulation order — the two are bit-identical (pinned
    * by ExtensionOpsSpec) — but walks the arrays once without temporaries.
    */
  def cosine(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)
       | / (sqrt(aggregate($a, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
       |    * sqrt(aggregate($b, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""".stripMargin)

  /** Exact top-k: every query against every candidate. The query side must
    * be small (it is broadcast); candidates stream through one codegen
    * stage + a per-query top-k window.
    */
  def knnBrute(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"),
      col("embedding").as("qe")))
    val c = candidates.select(col("vec_id").as("cid"),
      col("embedding").as("ce"))
    val pairs = c.crossJoin(q).where(col("cid") =!= col("qid"))
      .withColumn("cos",
        graft.expressions.CosineSimilarity.cosineFast(col("qe"), col("ce")))
    pairs
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))))
      .where(col("rnk") <= k)
      .select(col("qid"), col("cid"), col("rnk"),
        CoreOps.rnd(col("cos")).as("cos_sim"))
  }

  /** Sign-random-projection bucket: bit i is the sign of the dot product
    * with a pseudo-random ±1 hyperplane derived from `xxhash64(i, dim)` —
    * fully deterministic, no stored model. Nearby vectors collide with
    * high probability (cosine LSH).
    */
  def srpBucket(vec: String, bits: Int): Column = expr(
    s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, i) -> acc |
       |  CASE WHEN aggregate(zip_with($vec, sequence(0, size($vec) - 1),
       |      (x, d) -> CAST(x AS DOUBLE) * CASE WHEN (xxhash64(i, d) & 1) = 1 THEN 1.0D ELSE -1.0D END),
       |    0D, (s, v) -> s + v) > 0D
       |  THEN shiftleft(1L, i) ELSE 0L END)""".stripMargin)

  /** IVF-style approximate top-k: a KMeans codebook (trained once on the
    * candidate set, fixed seed) partitions vectors into `nlist` cells;
    * each query probes its `nprobe` nearest centroids and ranks only those
    * cells' members. The classic inverted-file ANN trade: train cost is
    * one pass, query cost drops from O(N) to O(N·nprobe/nlist). The
    * centroid table is tiny and broadcast; candidate cells co-partition by
    * cell id.
    */
  def knnIvf(queries: DataFrame, candidates: DataFrame, k: Int,
             nlist: Int = 16, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val train = candidates.select(
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .fit(train)
    val spark = candidates.sparkSession
    import spark.implicits._
    val cents = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }.toSeq.toDF("cell", "centroid")
    def assign(df: DataFrame, idCol: String, vecCol: String, n: Int): DataFrame = {
      // rank cells by cosine to the (broadcast) centroid table
      val scored = df.crossJoin(broadcast(cents))
        .withColumn("__cdist",
          graft.expressions.CosineSimilarity.cosineFast(col(vecCol), col("centroid")))
      scored.withColumn("__crnk", row_number().over(
          Window.partitionBy(idCol).orderBy(col("__cdist").desc, col("cell"))))
        .where(col("__crnk") <= n)
        .drop("centroid", "__cdist", "__crnk")
    }
    val q = assign(queries.select(col("vec_id").as("qid"),
      col("embedding").as("qe")), "qid", "qe", nprobe)
    val c = assign(candidates.select(col("vec_id").as("cid"),
      col("embedding").as("ce")), "cid", "ce", 1)
    val pairs = c.join(q, Seq("cell")).where(col("cid") =!= col("qid"))
      .withColumn("cos",
        graft.expressions.CosineSimilarity.cosineFast(col("qe"), col("ce")))
    pairs
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))))
      .where(col("rnk") <= k)
      .select(col("qid"), col("cid"), col("rnk"),
        CoreOps.rnd(col("cos")).as("cos_sim"))
  }

  /** Approximate top-k: candidates restricted to the query's SRP bucket.
    * Recall < 1 by construction; widen by lowering `bits` or probing
    * neighboring buckets. At 100 TB this turns an O(Q·N) scan into a
    * bucket-partitioned join.
    */
  def knnLsh(queries: DataFrame, candidates: DataFrame, k: Int,
             bits: Int = 8): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"),
      col("embedding").as("qe"), srpBucket("embedding", bits).as("bkt")))
    val c = candidates.select(col("vec_id").as("cid"),
      col("embedding").as("ce"), srpBucket("embedding", bits).as("bkt"))
    val pairs = c.join(q, Seq("bkt")).where(col("cid") =!= col("qid"))
      .withColumn("cos",
        graft.expressions.CosineSimilarity.cosineFast(col("qe"), col("ce")))
    pairs
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))))
      .where(col("rnk") <= k)
      .select(col("qid"), col("cid"), col("rnk"),
        CoreOps.rnd(col("cos")).as("cos_sim"))
  }
}
