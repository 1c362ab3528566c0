package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // contract: bench runs at local[32] unless explicitly overridden
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // let AQE re-coalesce reads of CACHED frames (off by default):
      // persisted bounded frames (q204's heaps, q207's label sums, the
      // graph/pair persists) otherwise materialize at the full shuffle
      // width and every consumer stage pays width× task-binary deser —
      // measured opt r08: q204 663→37 tasks/rep, deser 2.4s→0.2s.
      // Scale-adaptive (AQE sizes by bytes), not a local[32] constant.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen warmup outside the timed region
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()

    // Per-stage diagnostics: when a rep is anomalously slow, the wall
    // time alone can't say WHERE it stalled (compute vs GC vs shuffle
    // fetch vs spill vs scheduler). Keep a rolling log of completed
    // stages and dump it to stderr for any rep over the slow bound —
    // driver-environment-only pathologies (q18 hit 16.7s/46.0s in the
    // r01/r02 driver runs but never interactively) then self-diagnose
    // in the next driver log.
    val stageLog = new scala.collection.mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val tm = si.taskMetrics
        val wall = (for (s <- si.submissionTime; c <- si.completionTime)
          yield c - s).getOrElse(-1L)
        val line = f"stage=${si.stageId} tasks=${si.numTasks} wall=${wall}ms " +
          f"run=${tm.executorRunTime}ms gc=${tm.jvmGCTime}ms " +
          f"deser=${tm.executorDeserializeTime}ms " +
          f"fetchWait=${tm.shuffleReadMetrics.fetchWaitTime}ms " +
          f"spill=${tm.diskBytesSpilled}B " +
          f"name=${si.name.takeWhile(_ != '\n').take(80)}"
        stageLog.synchronized { stageLog += line }
      }
    })

    // stable order + inter-query hygiene: ML queries leave broadcast
    // blocks and model state behind; clearing between queries keeps
    // later timings honest. Single-JVM local mode shows >5x GC/JIT
    // swings on identical plans, so each query reports the MEDIAN of
    // 3 runs. A first run over the 30s pathology bound (deliberately
    // above every one-time model/index build — ALS ~13s cold) gets a
    // SECOND rep to tell a one-off stall from a genuinely heavy
    // query: if the second rep is fast it was a stall (report the
    // median of 3 so the steady state wins; the per-rep stderr line
    // keeps the stall visible); if the second rep is also ≥30s the
    // query is really that heavy (report it, skip the third rep to
    // bound bench wall time).
    // A query that throws must NOT hide as a fast median: record the
    // failure per-query and surface it in the final metric line.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        stageLog.synchronized { stageLog.clear() }
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            failures.getOrElseUpdate(name, e.getClass.getSimpleName)
            System.err.println(s"[bench-fail] $name: $e")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        if (dt >= 10.0) {
          // listener bus is async; give it a beat to drain
          Thread.sleep(500)
          System.err.println(f"[bench-diag] $name rep took $dt%.1fs; stages:")
          stageLog.synchronized { stageLog.foreach(l => System.err.println(s"[bench-diag]   $l")) }
        }
        dt
      }
      val first = once()
      val runs3 =
        if (first < 30.0) Seq(first, once(), once())
        else {
          val second = once()
          if (second < 30.0) Seq(first, second, once()) else Seq(first, second)
        }
      // ADAPTIVE reps: local-mode medians still swung up to 2× on
      // unchanged code round-over-round (r04→r05: q03, q74 — pure
      // variance, flagged as phantom regressions). When the 3-rep
      // spread exceeds 50% of the median on a sub-5s query, take two
      // more reps and report the median of 5 — bounded extra cost
      // (only cheap queries re-run), and the reported number stops
      // jumping between the lucky and unlucky tail.
      // (spread is judged over the WARM reps — the first rep is the
      // designed cold artifact/codegen build (warm-median convention,
      // SURVEY §8) and would read as "noise" on almost every query;
      // absolute floor too: a ±0.1s wobble on a 0.2s query is
      // inherent local-mode noise, not worth two more reps)
      def warmSpread(rs: Seq[Double]): Double = {
        val w = rs.drop(1)
        if (w.size < 2) 0.0 else w.max - w.min
      }
      val runs = {
        val s = runs3.sorted
        if (runs3.length == 3 && s(1) < 5.0 &&
          warmSpread(runs3) > 0.5 * s(1) && warmSpread(runs3) > 0.25)
          runs3 ++ Seq(once(), once())
        else runs3
      }
      // per-rep times to stderr so cold artifact builds and one-off
      // stalls stay visible next to the reported median
      System.err.println(
        f"[bench] $name runs=${runs.map(t => f"$t%.2f").mkString(",")}")
      val sorted = runs.sorted
      // odd len → middle; len 2 (both ≥30s) → the second/warm rep ==
      // max is pessimistic, report the min (steady state of a heavy
      // query)
      val med = sorted.length match {
        case 2 => sorted.head
        case n => sorted(n / 2)
      }
      // relative WARM spread of the reps actually taken — surfaced so
      // a round-over-round move can be read against the query's own
      // steady-state noise floor instead of guessed at
      val spread = if (med > 0) warmSpread(runs) / med else 0.0
      name -> (med, spread, runs)
    }.toMap
    val qs = results.map { case (k, (v, _, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-query relative spreads ((max−min)/median over the reps
    // taken) in the DETAILED line only — the judge/driver can read a
    // round-over-round delta against the query's own noise floor
    val sp = results.map { case (k, (_, s, _)) => f""""$k":$s%.2f""" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    // wide = noisy where it MATTERS: >50% relative spread on a query
    // whose median is big enough for the wobble to move the total
    val nWide = results.values.count { case (m, s, _) => s > 0.5 && m * s > 0.25 }
    // Detailed per-query line first (penultimate): ~10 KB, useful for
    // humans/tools reading the full log.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spreads":$sp,"sf":"$sfDir"}""")
    // Top-10 most expensive queries WITH their per-rep times (short
    // id, 1-decimal secs) as a second compact line: a driver-run
    // total that moved can be split into swing vs regression without
    // a rerun — a big first rep + small warm reps is the designed
    // cold artifact build, warm movement is real. Fits the tail
    // budget next to the compact total (~260 chars for 10 entries).
    val top10 = results.toSeq.sortBy { case (_, (m, _, _)) => -m }.take(10)
      .map { case (k, (_, _, runs)) =>
        val short = k.takeWhile(_ != '_')
        s"""\"$short\":[${runs.map(t => f"$t%.1f").mkString(",")}]"""
      }.mkString("{", ",", "}")
    println(s"""{"metric":"top10_reps","unit":"sec","q":$top10}""")
    // Compact line LAST: the driver keeps only a 2000-char tail of
    // stdout, so the parseable metric must fit there (≤200 chars).
    // Failed queries are named (capped at 5) so a regression can't
    // masquerade as a speedup; n_wide = queries still >50% spread
    // after adaptive reps (an environment-noise, not code, signal).
    val errs = failures.keys.take(5).map(n => "\"" + n + "\"").mkString("[", ",", "]")
    // Full per-query detail ALSO lands on disk (r08 verdict item 2):
    // the ~10 KB detailed stdout line does not survive the driver's
    // 2000-char tail, which left PERF_r08's per_query comparison
    // empty. Additions-only: stdout lines above are byte-identical;
    // this writes the same medians/spreads plus per-rep times to
    // BENCH_DETAIL.json (latest run) and a cpus-suffixed twin so the
    // 8-core scaling run does not clobber the 32-core detail.
    val reps = results.map { case (k, (_, _, rs)) =>
      s"\"$k\":[${rs.map(t => f"$t%.3f").mkString(",")}]"
    }.mkString("{", ",", "}")
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","cpus":$cpus,""" +
        s""""queries":$qs,"spreads":$sp,"reps":$reps,""" +
        s""""n_queries":${results.size},"n_failed":${failures.size},""" +
        s""""n_wide":$nWide,"errors":$errs,"sf":"$sfDir"}""" + "\n"
    try {
      for (p <- Seq("/root/repo/BENCH_DETAIL.json",
          s"/root/repo/BENCH_DETAIL_c$cpus.json"))
        java.nio.file.Files.write(java.nio.file.Paths.get(p),
          detail.getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] detail file write failed: $e")
    }
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"n_failed":${failures.size},"n_wide":$nWide,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
