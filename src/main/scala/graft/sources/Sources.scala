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
  * written out as CSV, JSON AND ORC, read back through all three sources with
  * explicit schemas, joined 1:1 on the key, and aggregated — the
  * result hash-matches the DuckDB oracle computed on the original
  * parquet, so every source is byte-faithful for this schema.
  */
object Sources {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Collision-free /tmp staging dir per (purpose, input dir). */
  private[graft] def stagingDir(purpose: String, dir: String): String =
    s"/tmp/graft_${purpose}_" + dir.replaceAll("[^A-Za-z0-9]", "_")

  def roundTrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val base = stagingDir("sources", dir)
    src.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    src.write.mode("overwrite").json(s"$base/json")
    src.write.mode("overwrite").orc(s"$base/orc")
    val fromCsv = spark.read.option("header", "true").schema(schema).csv(s"$base/csv")
    val fromJson = spark.read.schema(schema).json(s"$base/json")
      .select(col("event_id").as("jid"), col("value").as("jvalue"))
    val fromOrc = spark.read.schema(schema).orc(s"$base/orc")
      .select(col("event_id").as("oid"), col("value").as("ovalue"))
    fromCsv.join(fromJson, col("event_id") === col("jid"))
      .join(fromOrc, col("event_id") === col("oid"))
      .filter(col("value") === col("jvalue") && col("value") === col("ovalue")) // fidelity
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .orderBy(col("event_type"))
  }

  /** Partitioned sink + partition-pruned read: events written
    * hive-style partitioned by event_type; the filtered read-back
    * must scan ONLY the matching partition directories (the plan's
    * PartitionFilters — asserted in SourcesSkewSpec). This is the
    * layout that turns "scan 100 TB" into "scan the 6 TB partition".
    * The aggregate over the partitioned copy hash-matches the DuckDB
    * oracle on the original parquet. */
  def partitionedSink(spark: SparkSession, dir: String): DataFrame = {
    val base = stagingDir("part", dir)
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"), col("user_id"))
      .write.mode("overwrite").partitionBy("event_type").parquet(base)
    partitionedRead(spark, base)
  }

  private[graft] def partitionedRead(spark: SparkSession, base: String): DataFrame =
    spark.read.parquet(base)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .orderBy(col("event_type"))

  /** Bucketed tables: write lineitem and orders bucketed by the join
    * key, then join the bucketed tables — with matching bucket
    * specs Spark plans a shuffle-FREE sort-merge join. This is the
    * "pre-partition the 100 TB fact table once, join it many times"
    * pattern. Returns the joined aggregate; SourcesSpec asserts the
    * plan has no Exchange. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val db = s"graft_buckets_${math.abs(dir.hashCode)}"
    // the catalog is per-JVM but the warehouse dir persists: drop the
    // table AND clear any stale location before (re)writing
    def freshWrite(name: String, writeIt: String => Unit): Unit =
      if (!spark.catalog.tableExists(name)) {
        spark.sql(s"DROP TABLE IF EXISTS $name")
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), name)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        writeIt(name)
      }
    freshWrite(s"${db}_li", n =>
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(n))
    freshWrite(s"${db}_ord", n =>
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(n))
    val li = spark.table(s"${db}_li")
    val ord = spark.table(s"${db}_ord")
    li.join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  // ---- q164: versioned store + time-travel read (mini-lakehouse) --

  private val versionedCache = graft.SessionRegistry
    .cacheWithCleanup[(SparkSession, String), String](graft.SessionRegistry.deleteDir)

  /** The versioned document store: three deterministic commit
    * batches written as `version=K` partitions (the Delta-log
    * change-file idea reduced to its queryable core — each commit
    * appends ONLY its delta, upserts and deletes as rows):
    * v1 = the base corpus; v2 = revisions for the %13 set, DELETES
    * for the %17 set; v3 = the deleted docs restored. */
  private[graft] def versionedStore(spark: SparkSession, dir: String): String =
    versionedCache.getOrElseUpdate((spark, dir), {
      val base = stagingDir("versioned", dir) +
        "_" + graft.SessionRegistry.sessionToken(spark)
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      def commit(v: Int, df: DataFrame): Unit =
        df.withColumn("version", lit(v.toLong))
          .write.mode("append").partitionBy("version").parquet(base)
      commit(1, docs.select(col("doc_id"), col("text"), lit("upsert").as("op")))
      commit(2, docs.filter(col("doc_id") % 17 === 3)
        .select(col("doc_id"), lit("").as("text"), lit("delete").as("op"))
        .unionByName(docs.filter(col("doc_id") % 17 =!= 3 && col("doc_id") % 13 === 1)
          .select(col("doc_id"), concat(col("text"), lit(" rev")).as("text"),
            lit("upsert").as("op"))))
      commit(3, docs.filter(col("doc_id") % 17 === 3)
        .select(col("doc_id"), concat(col("text"), lit(" back")).as("text"),
          lit("upsert").as("op")))
      base
    })

  /** TIME-TRAVEL read: the store AS OF `version` — per key, the
    * last-writer-wins row among commits ≤ version, dropped if that
    * row is a delete. The version predicate is a PARTITION filter
    * (only the asked-for commit files are scanned — plan-asserted in
    * SourcesSkewSpec); the winner is one argmax window over the
    * commit-bounded delta rows, keyed by doc_id. */
  private[graft] def readVersion(spark: SparkSession, dir: String,
      version: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("version").desc)
    spark.read.parquet(versionedStore(spark, dir))
      .filter(col("version") <= version.toLong)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "upsert")
      .select(col("doc_id"), col("version").as("since_version"),
        md5(col("text").cast("binary")).as("fp"))
  }

  /** q164: the store read AS OF commit 2 — revisions visible,
    * deletions applied, the v3 restore NOT yet visible; every row
    * value-checked against a state the oracle derives directly from
    * the raw corpus (same %-rules). */
  def timeTravel(spark: SparkSession, dir: String): DataFrame =
    readVersion(spark, dir, 2).orderBy(col("doc_id"))

  /** q165: CHANGE FEED between two commits — q164's time-travel reads
    * composed through q146's snapshotDiff operator ("what changed
    * between v1 and v3"): both as-of states collapse to (key,
    * fingerprint) partition-pruned scans, the diff is the same one
    * full-outer equi-join. The oracle derives both states' rules
    * directly from the raw corpus, so the feed is value-checked:
    * %17 docs (deleted at v2, restored at v3) and %13 revisions read
    * 'changed', everything else 'unchanged' — the delete→restore
    * round trip is visible as a CONTENT change, not churn. */
  def versionDiff(spark: SparkSession, dir: String): DataFrame = {
    val v1 = readVersion(spark, dir, 1).select(col("doc_id"), col("fp"))
    val v3 = readVersion(spark, dir, 3).select(col("doc_id"), col("fp"))
    graft.operators.FrameOps.snapshotDiff(v1, v3, "doc_id", col("fp"))
      .select(col("doc_id"), col("status"), col("old_fp"), col("new_fp"))
      .orderBy(col("doc_id"))
  }
}
