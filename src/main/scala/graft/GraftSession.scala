package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession pre-configured the way graft's
  * operators expect — UTC (oracle/timestamp determinism), AQE on
  * (runtime coalesce + skew-join handling), shuffle parallelism sized
  * to the cluster rather than Spark's 200 default, and graft's native
  * SQL functions registered.
  *
  * On a real cluster, `shufflePartitions` should be ~2-3× total
  * executor cores, and `spark.sql.files.maxPartitionBytes` left at
  * 128 MB so a 100 TB scan fans out to ~800k input splits.
  */
object GraftSession {

  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // cached bounded frames re-coalesce on read (AQE sizes by bytes;
      // default false keeps cache reads at full shuffle width — see
      // OPTIMIZATION_r08.md)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
