package graft

/** The demo pipeline is a composition of graded operators; this pins that
  * the chain stays runnable and its funnel stays coherent (each governance
  * stage only removes documents, nothing degenerates to empty).
  */
class CorpusDemoSpec extends SparkTestBase {

  test("corpus demo funnel: monotone document counts, no empty stage") {
    val counts = CorpusDemo.run(spark, sfTest).toMap
    val funnel = Seq("documents_in", "after_exact_dedup", "after_near_dedup",
      "after_quality_gate", "train_decontaminated").map(counts)
    assert(funnel.zip(funnel.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: $funnel")
    assert(funnel.forall(_ > 0), s"a stage went empty: $funnel")
    // every embedding clears the quantization error contract
    assert(counts("quantize_contract_ok") == 500L)
    assert(counts("packed_rows") == counts("train_decontaminated"))
    assert(counts("mixture_rows") > 0 && counts("ann_neighbor_rows") > 0)
  }
}
