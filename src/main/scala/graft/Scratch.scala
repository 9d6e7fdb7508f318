package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.Tables

// Temporary instrumentation main — not part of the library.
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, d).where(pmod(col("doc_id"), lit(10)) === 0)
    docs.cache().count()
    // warm
    time("warm cands")(Dedup.candidatePairIds(docs, "doc_id", "text").count())
    val nc = time("candidatePairIds")(
      Dedup.candidatePairIds(docs, "doc_id", "text").count())
    println(s"[scratch] candidates: $nc")
    val nv = time("verifiedNearDupPairs")(
      Dedup.verifiedNearDupPairs(docs, "doc_id", "text", 0.5).count())
    println(s"[scratch] verified pairs: $nv")
    val pairs = Dedup.verifiedNearDupPairs(docs, "doc_id", "text", 0.5)
      .localCheckpoint(true)
    val ng = time("clusterPairs on materialized edges")(
      Dedup.clusterPairs(pairs).count())
    println(s"[scratch] ids in groups: $ng")
    val nall = time("full dedup_groups")(
      Dedup.clusterPairs(
        Dedup.verifiedNearDupPairs(docs, "doc_id", "text", 0.5)).count())
    println(s"[scratch] full: $nall")
    spark.stop()
  }
}
