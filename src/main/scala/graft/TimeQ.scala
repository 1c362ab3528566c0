package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual SparkEntry queries by name.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.TimeQ q35_dedup_clusters q18_asof_custom
  * Each named query is run `SPARK_GRAFT_REPS` times (default 2); all
  * timings are printed so variance is visible.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        dt
      }
      println(f"TIMEQ $name ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
