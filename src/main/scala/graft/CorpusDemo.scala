package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Similarity, TextFunctions}
import graft.ops._

/** Runnable demo of the training-data pipeline surface: the corpus
  * governance chain a pretraining ingest actually executes, end to end over
  * the driver testdata — normalize → exact dedup → near-dup removal →
  * quality gate → PII scrub → decontaminate vs the eval split → split
  * assignment → pack → mixture report, plus the embedding tier (quantize +
  * ANN neighbors). Usage: runMain graft.CorpusDemo [sfDir]
  *
  * Every stage is the same operator a graded query exercises; this main
  * exists to show the COMPOSITION as one lazy DataFrame chain (nothing
  * executes until the stage-count actions at the end).
  */
object CorpusDemo {

  /** The pipeline body, separated from main so tests can run it on a real
    * session and assert the funnel counts are coherent.
    */
  def run(spark: SparkSession, sfDir: String): Seq[(String, Long)] = {
    val docs = Tables.documents(spark, sfDir)

    // 1. normalize, then exact-dedup on the normalized digest
    val norm = docs.select(col("doc_id"), col("lang"),
      TextFunctions.normalizeText(col("text")).as("text"))
    val exactDeduped = Dedup.dropExact(norm, "doc_id", "text")

    // 2. near-duplicate REMOVAL (MinHash-LSH candidates, exact verify,
    //    connected components, min-id canonical survives)
    val nearDeduped = Dedup.dropNearDups(exactDeduped, "doc_id", "text",
      threshold = 0.8)

    // 3. quality gate + PII scrub
    val gated = TextFunctions.withQualityColumns(nearDeduped, "text")
      .where(col("quality") >= 0.4)
      .withColumn("text", TextFunctions.piiScrub(col("text")))

    // 4. split assignment (content-addressed), then decontaminate train
    //    against the test split's 8-grams
    val split = CorpusOps.assignSplit(gated, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val train = split.where(col("split") === "train")
    val clean = CorpusOps.decontaminate(
        train, split.where(col("split") === "test"), "doc_id", "text", n = 8)
      .where(!col("contaminated"))
      .select("doc_id")
      .join(train, Seq("doc_id"))

    // 5. context-window packing + the mixture report a weighting decision reads
    val packed = CorpusOps.packSequences(clean, "doc_id", "lang",
      TextFunctions.tokenCount(col("text")), budget = 512)
    val mixture = CorpusOps.mixtureStats(split, Seq("lang", "split"),
      TextFunctions.tokenCount(col("text")))

    // embedding tier: int8-quantize, then ANN neighbors through SRP-LSH
    val emb = Tables.embeddings(spark, sfDir)
    val quantOk = emb.select(
        (EmbeddingOps.dequantMaxError(col("embedding"),
          EmbeddingOps.quantizeInt8(col("embedding")))
          <= EmbeddingOps.int8Scale(col("embedding")) / 2 + lit(1e-12))
          .as("ok"))
      .where(col("ok"))
    val neighbors = Similarity.knnLsh(
      emb.where(col("vec_id") < 5), emb, k = 3, bits = 4, tables = 16)

    def n(name: String, df: DataFrame) = name -> df.count()
    Seq(
      n("documents_in", docs),
      n("after_exact_dedup", exactDeduped),
      n("after_near_dedup", nearDeduped),
      n("after_quality_gate", gated),
      n("train_decontaminated", clean),
      n("packed_rows", packed),
      n("mixture_rows", mixture),
      n("quantize_contract_ok", quantOk),
      n("ann_neighbor_rows", neighbors))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    run(spark, sfDir).foreach { case (stage, count) =>
      println(f"$stage%-24s $count%8d")
    }
    spark.stop()
  }
}
