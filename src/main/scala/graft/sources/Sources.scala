package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    s"/tmp/graft_${purpose}_" + graft.SessionRegistry.pathKey(dir)

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
      // src_version rides in the PAYLOAD too (== the partition value
      // at commit time): after a vacuum collapses old partitions into
      // a checkpoint, it is what keeps since_version byte-stable
      // keep-schema sink: an EMPTY commit must still leave a schema-
      // bearing file or every later read of the store fails (the
      // empty-corpus sweep class; sentinel version=0 < every commit)
      def commit(v: Int, df: DataFrame): Unit =
        graft.Tables.writePartitionedKeepSchema(
          df.withColumn("src_version", lit(v.toLong))
            .withColumn("version", lit(v.toLong)),
          "append", "version", "0", base)
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

  /** Per-key LAST-WRITER-WINS winner among commits ≤ `version` — THE
    * shared resolution rule of every store read and of vacuum's
    * checkpoint build (one def; the read and the compaction cannot
    * drift). The version predicate is a PARTITION filter; the argmax
    * window runs over commit-bounded delta rows keyed by doc_id. */
  private def lwwRows(store: DataFrame, version: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("version").desc)
    store.filter(col("version") <= version.toLong)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
  }

  /** TIME-TRAVEL read from a store path: LWW winner per key, dropped
    * if the winner is a delete; since_version = the winner's ORIGINAL
    * commit (src_version — stable across vacuum). Partition-pruned:
    * only commit files ≤ version are listed (plan-asserted in
    * SourcesSkewSpec). */
  private[graft] def readVersionFrom(spark: SparkSession, base: String,
      version: Int): DataFrame =
    lwwRows(spark.read.parquet(base), version)
      .filter(col("op") === "upsert")
      .select(col("doc_id"), col("src_version").as("since_version"),
        md5(col("text").cast("binary")).as("fp"))

  private[graft] def readVersion(spark: SparkSession, dir: String,
      version: Int): DataFrame =
    readVersionFrom(spark, versionedStore(spark, dir), version)

  /** q168 retention horizon: time travel below it is given up by the
    * vacuum; reads at/after it are byte-identical. */
  private[graft] val VacuumHorizon = 2

  // keyed by horizon too: a cached horizon-2 store must never be
  // handed to a caller asking for horizon 1 (silent wrong artifact)
  private val vacuumCache = graft.SessionRegistry
    .cacheWithCleanup[(SparkSession, String, Int), String](graft.SessionRegistry.deleteDir)

  /** VACUUM / retention compaction of the versioned store — the
    * maintenance half of the q164 lakehouse block (Delta VACUUM +
    * checkpoint reduced to its queryable core): all commits ≤ the
    * horizon collapse into ONE checkpoint partition holding the LWW
    * state at the horizon (each surviving row keeps its ORIGINAL
    * src_version, so since_version is unchanged for every legal
    * read); tombstones below the horizon are DROPPED (nothing older
    * remains for a delete to mask — absence now encodes it); commits
    * after the horizon ride along verbatim. Written to a fresh dir
    * (the original store stays immutable — a reader mid-scan of the
    * old layout is never broken; the swap is a pointer move, exactly
    * Delta's protocol). Scale shape: the checkpoint build is one
    * argmax window over delta-sized rows + a state-sized write; at
    * 100 TB this is the periodic compaction job that keeps as-of
    * reads from re-walking an unbounded commit tail, and the
    * file-listing cost of every later read drops with the partition
    * count (spec-asserted: the vacuumed store lists only
    * {horizon..latest}). */
  private[graft] def vacuumedStore(spark: SparkSession, dir: String,
      horizon: Int = VacuumHorizon): String =
    vacuumCache.getOrElseUpdate((spark, dir, horizon), {
      val src = spark.read.parquet(versionedStore(spark, dir))
      val base = stagingDir("vacuumed", dir) +
        s"_h${horizon}_" + graft.SessionRegistry.sessionToken(spark)
      graft.Tables.writePartitionedKeepSchema(lwwRows(src, horizon)
        .filter(col("op") === "upsert") // tombstone removal
        .select(col("doc_id"), col("text"), col("op"), col("src_version"),
          lit(horizon.toLong).as("version")),
        "append", "version", "0", base)
      graft.Tables.writePartitionedKeepSchema(
        src.filter(col("version") > horizon.toLong)
          .select(col("doc_id"), col("text"), col("op"), col("src_version"),
            col("version")),
        "append", "version", "0", base)
      base
    })

  /** q168: the VACUUMED store read at the latest commit — proof the
    * compaction preserved every retained read: the full v3 state
    * (deletes applied then restored, revisions visible, each row's
    * since_version = its true original commit) value-checked against
    * an oracle that derives that state directly from the raw corpus
    * with the store's own %-rules. The shared-oracle gate plus the
    * SourcesSkewSpec partition/equality asserts are the "reads
    * at/after the horizon are unchanged, files below it are gone"
    * contract. */
  def vacuumRead(spark: SparkSession, dir: String): DataFrame =
    readVersionFrom(spark, vacuumedStore(spark, dir), 3)
      .orderBy(col("doc_id"))

  /** q180: CHUNK-INDEX DELTA under store revisions — incremental
    * maintenance of a DERIVED artifact: at 100 TB the chunk index
    * (q175/q176's dedup substrate) must update from commit deltas,
    * never by re-chunking the lake. The v1→v2 transition's changed
    * docs (revisions + deletes) are re-chunked on BOTH sides and the
    * per-doc fp multisets diffed: chunks_reused = Σ min(c_old, c_new)
    * per fp — for a revision that appends one token, CDC resync means
    * the whole prefix of chunks survives and only the trailing chunk
    * re-writes, which is precisely the promise q175's spec pins and
    * this query QUANTIFIES on the lakehouse (a fixed-window index
    * would re-write nothing-reusable whenever lengths shift).
    * Scale shape: the changed-candidate set is the version=2 COMMIT
    * PARTITION alone — only keys written in that commit can differ
    * between the v1 and v2 as-of states — so both LWW text reads are
    * restricted (broadcast semi-shape join on the request-bounded id
    * list) BEFORE any window runs, and the full-outer diff join is
    * delta-sized, never store-sized; only truly-changed docs reach
    * the kernel; the rollup is |kinds|-bounded. Oracle derives both
    * sides from the raw corpus with the store's %-rules (q165's
    * pattern) through the SAME generated chunk CTE as q175/q176. */
  def chunkDelta(spark: SparkSession, dir: String): DataFrame = {
    val base = versionedStore(spark, dir)
    val deltaIds = spark.read.parquet(base)
      .filter(col("version") === 2)
      .select(col("doc_id")).distinct()
    def restricted(version: Int) =
      lwwRows(spark.read.parquet(base)
          .join(broadcast(deltaIds), Seq("doc_id")), version)
        .filter(col("op") === "upsert")
        .select(col("doc_id"), col("text"))
    val oldT = restricted(1)
      .select(col("doc_id"), col("text").as("text_old"))
    val newT = restricted(2)
      .select(col("doc_id"), col("text").as("text_new"))
    val changed = oldT.join(newT, Seq("doc_id"), "full_outer")
      .filter(!coalesce(col("text_old") === col("text_new"), lit(false)))
      .withColumn("kind",
        when(col("text_new").isNull, lit("delete"))
          .when(col("text_old").isNull, lit("add"))
          .otherwise(lit("revise")))
      .persist() // delta-sized; feeds both chunk passes and the rollup
    def fpCounts(textCol: String, cName: String) =
      graft.operators.CorpusOps.cdcChunkFrame(
          changed.filter(col(textCol).isNotNull)
            .select(col("doc_id"), col(textCol).as("text")))
        .groupBy(col("doc_id"), col("fp")).agg(count(lit(1)).as(cName))
    val perDoc = fpCounts("text_old", "c_old")
      .join(fpCounts("text_new", "c_new"), Seq("doc_id", "fp"), "full_outer")
      .na.fill(0L, Seq("c_old", "c_new"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c_old")).as("n_old"), sum(col("c_new")).as("n_new"),
        sum(least(col("c_old"), col("c_new"))).as("reused"))
    changed.select(col("doc_id"), col("kind"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_old", "n_new", "reused"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_old") - col("reused")).as("chunks_removed"),
        sum(col("n_new") - col("reused")).as("chunks_added"),
        sum(col("reused")).as("chunks_reused"))
      .orderBy(col("kind"))
  }

  // ---- q174: GDPR erasure (right-to-be-forgotten) ----------------

  /** The deterministic forget set: doc_id ≡ [[ForgetRem]] (mod
    * [[ForgetMod]]) — stands in for the bounded explicit key list a
    * real erasure request carries. */
  private[graft] val ForgetMod = 19L
  private[graft] val ForgetRem = 5L
  private[graft] def isForgotten: Column = col("doc_id") % ForgetMod === ForgetRem

  private val erasedCache = graft.SessionRegistry
    .cacheWithCleanup[(SparkSession, String), String](graft.SessionRegistry.deleteDir)

  /** ERASURE is not deletion: a q164 tombstone only masks a key from
    * later reads — time travel resurrects it, which is exactly what
    * GDPR Art. 17 forbids. Erasure REWRITES history: every commit
    * partition is re-emitted with the forgotten keys physically
    * dropped, so no as-of read at any version can return them, while
    * every retained row (payload, op, src_version, commit) is
    * byte-identical. Fresh-dir pointer-swap like vacuum — the old
    * store stays immutable until the swap. Scale shape: one scan +
    * row-local anti-filter (an explicit forget list would be a
    * broadcast anti-join of a request-bounded table), partitioned
    * write; no shuffle at all. */
  private[graft] def erasedStore(spark: SparkSession, dir: String): String =
    erasedCache.getOrElseUpdate((spark, dir), {
      val src = spark.read.parquet(versionedStore(spark, dir))
      val base = stagingDir("erased", dir) +
        "_" + graft.SessionRegistry.sessionToken(spark)
      graft.Tables.writePartitionedKeepSchema(src.filter(!isForgotten)
        .select(col("doc_id"), col("text"), col("op"), col("src_version"),
          col("version")),
        "append", "version", "0", base)
      base
    })

  /** q174: the ERASURE AUDIT — the compliance record an erasure job
    * must produce: per commit, how many rows were purged vs retained,
    * the live row count of the erased store as of that commit, and a
    * proof-of-absence counter (forgotten keys visible to ANY as-of
    * read — must be 0 at every version; it is computed from the
    * erased store itself, not assumed). Every number is derivable
    * from the raw corpus + the store's deterministic commit rules, so
    * the whole erasure flow sits on the oracle gate. The per-version
    * as-of reads are partition-pruned LWW passes over delta-sized
    * rows (commit count is bounded — the loop is plan metadata, not
    * data). */
  def forgetAudit(spark: SparkSession, dir: String): DataFrame = {
    val orig = spark.read.parquet(versionedStore(spark, dir))
    val erasedBase = erasedStore(spark, dir)
    val purged = orig.groupBy(col("version").cast("long").as("version"))
      .agg(sum(when(isForgotten, 1L).otherwise(0L)).as("n_purged"),
        sum(when(!isForgotten, 1L).otherwise(0L)).as("n_retained"))
    val live = (1 to 3).map { v =>
      readVersionFrom(spark, erasedBase, v)
        .agg(count(lit(1)).as("n_live"),
          coalesce(sum(when(isForgotten, 1L).otherwise(0L)), lit(0L))
            .as("n_forgotten_visible"))
        .withColumn("version", lit(v.toLong))
    }.reduce(_ unionByName _)
    purged.join(live, Seq("version"))
      .select(col("version"), col("n_purged"), col("n_retained"),
        col("n_live"), col("n_forgotten_visible"))
      .orderBy(col("version"))
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

  // ---- q208: store growth trajectory --------------------------------

  /** The store's commit history length (versions 1..this) — the q208
    * oracle's per-version branches are generated from it. */
  private[graft] val StoreVersions = 3

  /** q208: STORE GROWTH TRAJECTORY — the lakehouse ops view over the
    * versioned store: per commit, the commit's OWN size (rows /
    * upserts / deletes — read from that version's partition alone,
    * delta-sized) and the resulting LIVE state (docs, tokens) with
    * deltas vs the previous version. A bad commit (mass delete,
    * runaway revision) shows as a trajectory break here BEFORE
    * downstream consumers re-index against the damaged state — the
    * monitoring row the q164/q165/q168/q180 family reads first.
    *
    * Scale shape: ONE pass over the store computes EVERY version's
    * live state — per doc, a version→(op, tokens) map
    * (map_from_entries over the doc's ≤|versions| commit rows), and
    * the live winner at v is a codegen coalesce chain of
    * element_at(m, v), element_at(m, v−1), … — no per-version LWW
    * re-scan (the naive shape is |versions| full-store window
    * passes); the rollup is |versions|-sized, the delta window runs
    * over that bounded table (the accepted bounded-survivor class).
    * Token counts ride the shared NFC tokenizer. Float-free: every
    * column is an exact long. */
  def storeGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val store = spark.read.parquet(versionedStore(spark, dir))
    val versions = (1 to StoreVersions).map(_.toLong)
    val commits = store.groupBy(col("version").cast("long").as("version"))
      .agg(count(lit(1)).as("n_commit_rows"),
        sum(when(col("op") === "upsert", 1L).otherwise(0L)).as("n_upserts"),
        sum(when(col("op") === "delete", 1L).otherwise(0L)).as("n_deletes"))
    val perDoc = store
      .select(col("doc_id"), col("version").cast("long").as("version"),
        struct(col("op"),
          when(col("op") === "upsert",
            size(graft.functions.TextFns.tokens(col("text"))).cast("long"))
            .otherwise(0L).as("tok")).as("e"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("version"), col("e"))))
        .as("m"))
    val liveCols = versions.map { v =>
      val winner = coalesce((v to 1L by -1L).map(u =>
        element_at(col("m"), lit(u))): _*)
      struct(
        when(winner.getField("op") === "upsert", 1L).otherwise(0L).as("live"),
        when(winner.getField("op") === "upsert", winner.getField("tok"))
          .otherwise(0L).as("tok")).as(s"v$v")
    }
    val live = perDoc.select(liveCols: _*)
      .agg(
        sum(col(s"v${versions.head}.live")).as(s"d${versions.head}"),
        versions.tail.flatMap(v => Seq(sum(col(s"v$v.live")).as(s"d$v"))) ++
          versions.map(v => sum(col(s"v$v.tok")).as(s"t$v")): _*)
      .select(explode(array(versions.map(v => struct(
        lit(v).as("version"),
        col(s"d$v").cast("long").as("live_docs"),
        col(s"t$v").cast("long").as("live_tokens"))): _*)).as("r"))
      .select(col("r.version"), col("r.live_docs"), col("r.live_tokens"))
    val w = Window.orderBy(col("version")) // |versions|-row table
    commits.join(live, Seq("version"))
      .withColumn("docs_delta",
        col("live_docs") - lag(col("live_docs"), 1).over(w))
      .withColumn("tokens_delta",
        col("live_tokens") - lag(col("live_tokens"), 1).over(w))
      .orderBy(col("version"))
  }

  /** q235: STORE QUALITY DRIFT — the Gopher pass rate of the LIVE
    * corpus state at every commit version: the release-gate card a
    * dataset ships between versions ("did v2's revisions regress
    * quality?") — the lakehouse × quality-rule composition (the
    * reference's pipeline re-runs its filter task per dataset
    * version through gokart; here the audit reads the store's own
    * commits). Rules are THE shared Gopher defs (q72's signal
    * columns, rule columns and pass conjunction — one def).
    *
    * Scale shape: ONE store scan — signals are computed once per
    * COMMIT ROW (row-local), and the live winner at each version is
    * q208's map_from_entries + coalesce(element_at(m, v..1)) chain
    * over the per-doc commit map, so the naive |versions| LWW
    * re-scans never happen; the rollup is a |versions|-row explode.
    * pass_rate = one IEEE division of exact longs (lever (c)).
    * Oracle: per-version live states derived from the raw corpus
    * with the store's %-rules (the verified q164/q168 pattern)
    * through the SAME generated signal/rule fragments (lever (t)). */
  def storeQualityDrift(spark: SparkSession, dir: String): DataFrame = {
    val store = spark.read.parquet(versionedStore(spark, dir))
    val versions = (1 to StoreVersions).map(_.toLong)
    val sig = store.select(Seq(col("doc_id"),
      col("version").cast("long").as("version"), col("op")) ++
      graft.operators.TextOps.gopherSignalCols: _*)
    val flags = sig.select(col("doc_id"), col("version"),
      struct(col("op") +: graft.operators.TextOps.gopherRuleCols: _*).as("e"))
    val perDoc = flags.groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("version"), col("e"))))
        .as("m"))
    val liveCols = versions.map { v =>
      val winner = coalesce((v to 1L by -1L).map(u =>
        element_at(col("m"), lit(u))): _*)
      val isLive = winner.getField("op") === "upsert"
      struct(
        when(isLive, 1L).otherwise(0L).as("live"),
        when(isLive && winner.getField("words_ok") && winner.getField("wlen_ok")
          && winner.getField("ttr_ok") && winner.getField("stop_ok"), 1L)
          .otherwise(0L).as("pass")).as(s"v$v")
    }
    val aggs = versions.flatMap(v => Seq(
      sum(col(s"v$v.live")).as(s"d$v"), sum(col(s"v$v.pass")).as(s"p$v")))
    perDoc.select(liveCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(versions.map(v => struct(
        lit(v).as("version"),
        col(s"d$v").cast("long").as("n_docs"),
        col(s"p$v").cast("long").as("n_pass"))): _*)).as("r"))
      .select(col("r.version"), col("r.n_docs"), col("r.n_pass"))
      .withColumn("pass_rate",
        when(col("n_docs") > 0L,
          col("n_pass").cast("double") / col("n_docs").cast("double")))
      .orderBy(col("version"))
  }

  /** The q235 oracle — the three live states from the store's
    * %-rules, each through the SAME generated Gopher signal/rule
    * fragments. */
  private[graft] def storeQualityDriftOracleSql: String = {
    val (w, ml, tr, st) = graft.operators.TextOps
      .gopherRulePredsSql(graft.operators.TextOps.GopherMinWords,
        graft.operators.TextOps.GopherTtrMin)
    val pass = "words_ok AND wlen_ok AND ttr_ok AND stop_ok"
    s"""WITH u AS (
       |  SELECT CAST(1 AS BIGINT) AS version, doc_id, text FROM documents
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT), doc_id,
       |    CASE WHEN doc_id % 13 = 1 THEN text || ' rev' ELSE text END
       |  FROM documents WHERE doc_id % 17 <> 3
       |  UNION ALL
       |  SELECT CAST(3 AS BIGINT), doc_id,
       |    CASE WHEN doc_id % 17 = 3 THEN text || ' back'
       |         WHEN doc_id % 13 = 1 THEN text || ' rev'
       |         ELSE text END
       |  FROM documents),
       |t AS (SELECT version, string_split_regex(trim(nfc_normalize(text)), '\\s+') AS toks FROM u),
       |d AS (SELECT version,
       |    ${graft.operators.TextOps.gopherSignalExprsSql}
       |  FROM t),
       |r AS (SELECT version, $w AS words_ok, $ml AS wlen_ok, $tr AS ttr_ok, $st AS stop_ok FROM d)
       |SELECT version, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN $pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |  CASE WHEN COUNT(*) > 0 THEN
       |    CAST(CAST(SUM(CASE WHEN $pass THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE)
       |  END AS pass_rate
       |FROM r GROUP BY version ORDER BY version""".stripMargin
  }

  /** The q208 oracle — live states re-derived from the raw corpus
    * with the store's %-rules (the q168 pattern), token counts
    * through the same NFC tokenizer fragment, deltas via LAG over
    * the |versions|-row result. */
  private[graft] def storeGrowthOracleSql: String = {
    def tokOf(texpr: String) =
      s"CAST(len(string_split_regex(trim(nfc_normalize($texpr)), '\\s+')) AS BIGINT)"
    s"""WITH t1 AS (SELECT doc_id, ${tokOf("text")} AS tok FROM documents),
       |t2 AS (
       |  SELECT doc_id, ${tokOf(
           "CASE WHEN doc_id % 13 = 1 THEN text || ' rev' ELSE text END")} AS tok
       |  FROM documents WHERE doc_id % 17 <> 3),
       |t3 AS (
       |  SELECT doc_id, ${tokOf(
           "CASE WHEN doc_id % 17 = 3 THEN text || ' back' " +
             "WHEN doc_id % 13 = 1 THEN text || ' rev' ELSE text END")} AS tok
       |  FROM documents),
       |cm(version, n_commit_rows, n_upserts, n_deletes) AS (
       |  SELECT CAST(1 AS BIGINT), CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT) FROM documents
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT),
       |    CAST(SUM(CASE WHEN doc_id % 17 = 3 OR doc_id % 13 = 1 THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN doc_id % 17 <> 3 AND doc_id % 13 = 1 THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN doc_id % 17 = 3 THEN 1 ELSE 0 END) AS BIGINT) FROM documents
       |  UNION ALL
       |  SELECT CAST(3 AS BIGINT),
       |    CAST(SUM(CASE WHEN doc_id % 17 = 3 THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(SUM(CASE WHEN doc_id % 17 = 3 THEN 1 ELSE 0 END) AS BIGINT),
       |    CAST(0 AS BIGINT) FROM documents),
       |lv(version, live_docs, live_tokens) AS (
       |  SELECT CAST(1 AS BIGINT), CAST(COUNT(*) AS BIGINT),
       |    CAST(SUM(tok) AS BIGINT) FROM t1
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
       |    CAST(SUM(tok) AS BIGINT) FROM t2
       |  UNION ALL
       |  SELECT CAST(3 AS BIGINT), CAST(COUNT(*) AS BIGINT),
       |    CAST(SUM(tok) AS BIGINT) FROM t3)
       |SELECT cm.version, cm.n_commit_rows, cm.n_upserts, cm.n_deletes,
       |  lv.live_docs, lv.live_tokens,
       |  lv.live_docs - LAG(lv.live_docs) OVER (ORDER BY cm.version) AS docs_delta,
       |  lv.live_tokens - LAG(lv.live_tokens) OVER (ORDER BY cm.version) AS tokens_delta
       |FROM cm JOIN lv ON cm.version = lv.version
       |ORDER BY cm.version""".stripMargin
  }
}
