package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Source/sink operators — re-expression of the reference's file
  * loading surface (redshells/data/load_existing_file.py,
  * load_data_of_task.py: CSV/JSON/pickle via luigi targets) as Spark
  * sources with explicit schemas.
  *
  * `roundTrip` proves fidelity end-to-end: the events table is
  * written out as CSV AND JSON, read back through both sources with
  * explicit schemas, joined 1:1 on the key, and aggregated — the
  * result hash-matches the DuckDB oracle computed on the original
  * parquet, so both text sources are byte-faithful for this schema.
  */
object Sources {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  def roundTrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val base = s"/tmp/graft_sources_${math.abs(dir.hashCode)}"
    src.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    src.write.mode("overwrite").json(s"$base/json")
    val fromCsv = spark.read.option("header", "true").schema(schema).csv(s"$base/csv")
    val fromJson = spark.read.schema(schema).json(s"$base/json")
      .select(col("event_id").as("jid"), col("value").as("jvalue"))
    fromCsv.join(fromJson, col("event_id") === col("jid"))
      .filter(col("value") === col("jvalue")) // fidelity cross-check
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .orderBy(col("event_type"))
  }
}
