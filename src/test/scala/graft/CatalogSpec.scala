package graft

class CatalogSpec extends SparkTestBase {

  test("registerViews exposes every table to spark.sql, events with micros ts") {
    Catalog.registerViews(spark, sfTest)
    Catalog.tableNames.foreach { t =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0) > 0L, t)
    }
    // the nanos-parquet rebuild must hold through the view layer
    val tsType = spark.sql("SELECT ts FROM events").schema.head.dataType
    assert(tsType === org.apache.spark.sql.types.TimestampType)
  }

  test("SQL text and fluent API build the same plan shape for a join-agg") {
    Catalog.registerViews(spark, sfTest)
    val sql = spark.sql(
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |JOIN customer ON o_custkey = c_custkey GROUP BY 1""".stripMargin)
    import org.apache.spark.sql.functions._
    val api = Tables.orders(spark, sfTest)
      .join(Tables.customer(spark, sfTest), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    def shape(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      df.queryExecution.toRdd.foreachPartition(_ => ())
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      val cut = s.indexOf("== Initial Plan ==")
      val fin = if (cut >= 0) s.substring(0, cut) else s
      Seq("BroadcastHashJoin", "SortMergeJoin", "HashAggregate", "Exchange")
        .map(op => s"$op:${op.r.findAllIn(fin).size}")
    }
    assert(shape(sql) === shape(api))
  }
}
