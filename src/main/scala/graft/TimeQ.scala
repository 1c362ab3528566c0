package graft
import org.apache.spark.sql.SparkSession

/** Dev main (ExplainQ's timing twin): run named queries 3× at
  * SPARK_GRAFT_SF_DIR and print per-rep wall times — for chasing a
  * single query's cold/warm profile without a full Bench pass. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"$name rep$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
