package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric","value","unit","queries","sf"}. A short
  * warmup action runs first so steady-state query time is measured, not
  * first-job JIT/codegen infrastructure spin-up.
  */
object Bench {

  /** JIT-elimination sink for [[calibrate]] (never read). */
  @volatile private var calibrationSink: Long = 0L

  /** Per-run host-speed calibration control (r16 verdict item 2): a
    * FIXED CPU-bound computation — `threads` JVM threads each running
    * a constant-iteration xorshift loop — timed wall-clock, so every
    * bench snapshot carries a measurement of how fast THIS host was
    * at that moment, in the same units as the query times. Two
    * rounds of uniform ~1.3× "host drift" (r15→r16) eroded the 2×
    * perf-gate margin with no code change; totals from different
    * rounds can now be load-normalized by the ratio of their
    * calibration times instead of adjudicated by per-query median
    * ratios after the fact. Pure JVM (no Spark, no I/O, no alloc):
    * the control must not shuffle or spill, or it would measure the
    * thing it exists to factor out. Thread count = the bench's CPU
    * count, so CPU contention hits the control the way it hits the
    * 32-thread query runs. */
  private[graft] def calibrate(threads: Int): Double = {
    val work = 1L << 28
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + t
        var i = 0L
        while (i < work) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
        }
        calibrationSink = x
      })
      th.setDaemon(true); th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Observed-metrics channel (Dataset.observe): every guarded
    // operator (coactivity_cap, winnow_cap, lsh_cap_*,
    // interval_occupancy, grid_cell_occupancy, …) reports its
    // occupancy / cap counters here; the bench AGGREGATES them into
    // BENCH_FULL.json so a cap engaging on natural data is committed
    // evidence, not a runtime-only signal (r14 ADVICE). Per metric
    // name, the MAX of each numeric field across all runs is kept —
    // caps and occupancies are "did it ever engage / how hot" facts.
    val observed = new java.util.concurrent.ConcurrentHashMap[
      String, Map[String, Long]]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        // anonymous org.apache.spark.sql.Observation instances (the CC
        // convergence counters) carry UUID names — noise here; only
        // NAMED operator observes are evidence
        private val uuidName =
          "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r
        override def onSuccess(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            d: Long): Unit =
          qe.observedMetrics
            .filter { case (name, _) =>
              uuidName.findFirstIn(name).isEmpty }
            .foreach { case (name, row) =>
            val fields = row.schema.fieldNames.zipWithIndex.collect {
              case (f, i) if !row.isNullAt(i) => row.get(i) match {
                case n: Long => Some(f -> n)
                case n: Int => Some(f -> n.toLong)
                case _ => None
              }
            }.flatten.toMap
            observed.merge(name, fields,
              (a, b) => (a.keySet ++ b.keySet).map { k =>
                k -> math.max(a.getOrElse(k, Long.MinValue),
                  b.getOrElse(k, Long.MinValue))
              }.toMap)
          }
        override def onFailure(fn: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })
    // warmup: exercise scan + shuffle + codegen paths once
    try {
      SparkEntry.queries("q1_agg")(spark, sfDir).count()
      SparkEntry.queries("j1_patient_join")(spark, sfDir).count()
    } catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=name1,name2 restricts the run (local profiling aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // 1-minute system load average, sampled per timed run: a recorded
    // time only means something next to the machine state it was taken
    // under (recurring round ambiguity: driver-bench regressions that
    // are pure host load — e_knn_ivf r6, stream_dedup r7)
    def loadAvg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg
    def timeOne(name: String, fn: (SparkSession, String)
        => org.apache.spark.sql.DataFrame): (Double, Boolean, Double) = {
      val la = loadAvg
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false }
      ((System.nanoTime() - t0) / 1e9, ok, la)
    }
    // min-of-3 for EVERY query, taken across three SEEDED-SHUFFLED
    // PASSES over the whole registry rather than three back-to-back
    // runs per query: recorded times drift up to 3× with host load,
    // and with a FIXED alphabetical order a transient load phase maps
    // onto an alphabetically CONTIGUOUS block — all three back-to-back
    // runs of the same queries inflate together and read as a phantom
    // family regression (r15 driver run: the curate_*–d_* block at
    // 2.2–5.9×, median ratio elsewhere 0.98; every round since r12
    // spent adjudication effort on this class). Each pass visits the
    // queries in an independent Random(seed) permutation, so a load
    // phase lands on a DIFFERENT subset each pass and per-query minima
    // stay clean; the seed is recorded in the output ("order_seed" —
    // SPARK_GRAFT_BENCH_SEED pins it for replay), and the reported
    // total is still the sum of per-query minima, so shuffling changes
    // which wall-clock window a query runs in, never the numbers'
    // meaning. The only queries EXEMPT from later passes are failures
    // (intermittent failure is failure, and a crashed rerun's tiny
    // elapsed time must not become the min) and the very long tail
    // (≥ 30 s — none registered today): noise there is proportional
    // and a rerun doubles real cost without sharpening the min.
    // SPARK_GRAFT_RUNS=n forces n passes of EVERY query — the
    // failed/long-tail drop-out below is bypassed, because the whole
    // point of the override is profiling exactly the slow or flaky
    // query (separating per-JVM fixture/cold cost from steady state).
    val forcedRuns = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt)
    val orderSeed = sys.env.get("SPARK_GRAFT_BENCH_SEED")
      .map(_.toLong).getOrElse(System.nanoTime())
    val rng = new scala.util.Random(orderSeed)
    val passCount = forcedRuns.getOrElse(3)
    require(passCount >= 1,
      s"SPARK_GRAFT_RUNS must be >= 1, got $passCount — zero passes " +
        "would report every query as a vacuous success at -1s")
    val runsAcc = scala.collection.mutable.LinkedHashMap(
      selected.map { case (n, _) =>
        n -> (scala.collection.mutable.ArrayBuffer[(Double, Boolean)](),
          scala.collection.mutable.ArrayBuffer[Double]())
      }: _*)
    var active = selected
    // calibration control sampled before pass 1 and after EVERY pass
    // (passCount+1 samples): the min is the host's near-quiet speed
    // this run; comparing mins across rounds load-normalizes totals
    val calibs = scala.collection.mutable.ArrayBuffer[Double]()
    calibs += calibrate(cpus.toInt)
    for (pass <- 1 to passCount) {
      rng.shuffle(active).foreach { case (name, fn) =>
        val (dt, ok, la) = timeOne(name, fn)
        val (rs, ls) = runsAcc(name)
        rs += ((dt, ok)); ls += la
        System.err.println(f"[bench] pass $pass $name $dt%.2fs")
      }
      calibs += calibrate(cpus.toInt)
      if (forcedRuns.isEmpty)
        active = active.filter { case (name, _) =>
          val (rs, _) = runsAcc(name)
          rs.last._2 && rs.last._1 < 30.0
        }
    }
    val calibMin = calibs.min
    val calibsJson = calibs.map(c => f"$c%.3f").mkString("[", ",", "]")
    val results = selected.map { case (name, _) =>
      val (rs, loads) = runsAcc(name)
      val ok = rs.forall(_._2)
      val good = rs.collect { case (t, true) => t }
      val dt = if (good.nonEmpty) good.min else -1.0
      System.err.println(f"[bench] $name $dt%.2fs (runs ${
        rs.map(r => f"${r._1}%.2f").mkString("/")})")
      (name, dt, ok, rs.map(_._1).toSeq, loads.toSeq)
    }
    // a crashed query reports -1, never its (tiny) elapsed time — a crash
    // must not read as a fast run, and the failed list makes it explicit
    val failed = results.collect { case (k, _, false, _, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true, _, _) => v }.sum
    val loadEnd = loadAvg
    // COMPLETE per-query record (min + every run, so round-over-round
    // deltas AND variance are auditable for all queries, not just the
    // slowest) goes to a file — stdout is capped at ~2000 chars by the
    // harness and cannot carry 170 entries.
    // a SPARK_GRAFT_ONLY-filtered profiling run must not clobber the
    // committed complete record — divert it to a scratch name
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      if (only.isEmpty) "BENCH_FULL.json" else "bench_only_latest.json")
    val fullEntries = results.sortBy { case (_, v, ok, _, _) =>
        (if (ok) -v else 1e18) }
      .map { case (k, v, ok, runs, loads) =>
        val rs = runs.map(r => f"$r%.3f").mkString("[", ",", "]")
        val ls = loads.map(l => f"$l%.1f").mkString("[", ",", "]")
        "\"" + k + "\":" + (if (ok) f"""{"sec":$v%.3f,"runs":$rs,"load":$ls}"""
          else s"""{"sec":-1,"runs":$rs,"load":$ls}""")
      }
    // observed metrics arrive on Spark's ASYNC listener bus — settle
    // briefly so the final runs' rows are merged before the snapshot
    // (a cap engaging only on the last query must not vanish from the
    // committed evidence on a race)
    Thread.sleep(3000)
    // guard-engagement digest: any *over_cap*/*capped* counter > 0 is
    // a cap that ENGAGED on this corpus — surfaced as a first-class
    // list so evidence readers don't have to scan the metric map
    import scala.jdk.CollectionConverters._
    val obsMap = observed.asScala.toSeq.sortBy(_._1)
    // engagement fields by family: over_cap_rows/n_capped (drop-style
    // guards), star_edges (the LSH caps' star-reduction counter —
    // engagement there emits edges, not drops)
    val engaged = obsMap.collect { case (name, fs)
        if fs.exists { case (f, v) =>
          (f.contains("over_cap") || f.contains("n_capped") ||
            f == "star_edges") && v > 0L } =>
      "\"" + name + "\""
    }.mkString("[", ",", "]")
    val obsJson = obsMap.map { case (name, fs) =>
      "\"" + name + "\":" + fs.toSeq.sortBy(_._1)
        .map { case (f, v) => "\"" + f + "\":" + v }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath),
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"failed":$failed,"sf":"$sfDir","load_start":$loadStart%.1f,"load_end":$loadEnd%.1f,"order_seed":$orderSeed,"n_passes":$passCount,"calibration_sec":$calibMin%.3f,"calibration_secs":$calibsJson,"caps_engaged":$engaged,"observed":$obsJson,"queries":${fullEntries.mkString("{", ",\n", "}")}}""" + "\n")
    // The harness captures only the LAST ~2000 chars of stdout; a JSON
    // line longer than that loses its head and never parses. Emit the
    // queries map slowest-first, truncated to a hard budget (the slowest
    // queries are the informative ones), and note how many were omitted.
    // The complete per-query listing is in BENCH_FULL.json above.
    val entries = results.sortBy { case (_, v, ok, _, _) => if (ok) -v else 1e18 }
      .map { case (k, v, ok, _, _) =>
        "\"" + k + "\":" + (if (ok) f"$v%.3f" else "-1") }
    val fixed = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"failed":$failed,"sf":"$sfDir","load":[$loadStart%.1f,$loadEnd%.1f],"order_seed":$orderSeed,"calibration_sec":$calibMin%.3f,"full":"$fullPath","queries":{},"omitted":000}"""
    val budget = 1700 - fixed.length
    val kept = new scala.collection.mutable.ArrayBuffer[String]
    var used = 0
    entries.foreach { e =>
      if (used + e.length + 1 <= budget) { kept += e; used += e.length + 1 }
    }
    val omitted = entries.size - kept.size
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"failed":$failed,"sf":"$sfDir","load":[$loadStart%.1f,$loadEnd%.1f],"order_seed":$orderSeed,"calibration_sec":$calibMin%.3f,"full":"$fullPath","queries":${kept.mkString("{", ",", "}")},"omitted":$omitted}""")
    spark.stop()
  }
}
