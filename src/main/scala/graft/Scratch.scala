package graft
import org.apache.spark.sql.SparkSession

/** Throwaway timing harness for per-query iteration (not part of the
  * library surface): `runMain graft.Scratch <sfDir> <query,query,...>`.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).selectExpr("max(xxhash64(struct(*)))").collect()
        println(f"[scratch] $n run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
