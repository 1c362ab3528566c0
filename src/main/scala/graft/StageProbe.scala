package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev main (Bench's stage-shape twin): run named queries with
  * Bench's exact hygiene (count action, clearCache+gc between reps)
  * and print per-rep wall time plus a per-stage task/wall/deser
  * table — for attributing a slow rep to stage count, task count,
  * task-binary deser or GC without a full Bench pass. Extra session
  * confs can be injected via SPARK_GRAFT_CONF ("k=v,k=v") so a
  * candidate config's effect is measurable without editing Bench. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach { s =>
      s.split(',').filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => b = b.config(k, v)
          case _ => sys.error(s"SPARK_GRAFT_CONF entry has no '=': '$kv'")
        }
      }
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()

    case class St(id: Int, tasks: Int, wall: Long, run: Long, gc: Long,
      deser: Long, name: String)
    val stages = new scala.collection.mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo; val tm = si.taskMetrics
        val wall = (for (s <- si.submissionTime; c <- si.completionTime)
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += St(si.stageId, si.numTasks, wall, tm.executorRunTime,
            tm.jvmGCTime, tm.executorDeserializeTime,
            si.name.takeWhile(_ != '\n').take(60))
        }
      }
    })
    args.foreach { name =>
      for (i <- 1 to 3) {
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        Thread.sleep(300) // listener drain
        val ss = stages.synchronized(stages.toList)
        val nTasks = ss.map(_.tasks).sum
        println(f"$name rep$i t=$dt%.2f stages=${ss.size} tasks=$nTasks " +
          f"deserSum=${ss.map(_.deser).sum}ms gcSum=${ss.map(_.gc).sum}ms")
        if (sys.env.get("SPARK_GRAFT_PROBE_VERBOSE").contains("1") && i == 2)
          ss.sortBy(-_.wall).take(15).foreach(s => println(
            f"  stage=${s.id} tasks=${s.tasks} wall=${s.wall}ms run=${s.run}ms " +
            f"gc=${s.gc}ms deser=${s.deser}ms ${s.name}"))
      }
    }
    spark.stop()
  }
}
