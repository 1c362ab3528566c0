package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
object PqDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val log = new scala.collection.mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val wall = (for (s <- si.submissionTime; c <- si.completionTime) yield c - s).getOrElse(-1L)
        log.synchronized { log += f"stage=${si.stageId} tasks=${si.numTasks} wall=${wall}ms run=${si.taskMetrics.executorRunTime}ms" }
      }
    })
    val sfDir = "/root/testdata/sf0.1"
    SparkEntry.queries("q67_knn_pq")(spark, sfDir).count() // warm: codebooks + codegen
    for (i <- 1 to 2) {
      log.synchronized(log.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries("q67_knn_pq")(spark, sfDir).count()
      val t1 = System.nanoTime()
      Thread.sleep(500)
      println(f"== q67 rep$i total=${(t1-t0)/1e9}%.2f")
      log.synchronized(log.foreach(println))
    }
    spark.stop()
  }
}
