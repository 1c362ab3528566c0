package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, FrameOps, SimilaritySearch, TextOps}

/** Plan-shape assertions: these encode the scale design — if a
  * refactor silently turns a broadcast into a shuffle join, or widens
  * a pruned scan, these fail before the bench does.
  */
class PlanShapeSpec extends AnyFunSuite {
  import SparkTest._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** The exact BUILD SUBTREE under each BroadcastExchange, bounded by
    * the plan tree's indentation — not a fixed successor-line window,
    * which both fails spuriously when format shifts push the real
    * build node down and misses offenders past the window (r08
    * ADVICE). A subtree = the following lines whose tree indent is
    * strictly deeper than the exchange's. */
  private def broadcastBuildSides(p: String): Seq[String] = {
    val lines = p.linesIterator.toSeq
    def indent(l: String): Int = l.indexWhere(c => !" :+-".contains(c)) match {
      case -1 => Int.MaxValue // blank/art-only line: belongs to subtree
      case i => i
    }
    lines.zipWithIndex.collect {
      case (l, i) if l.contains("BroadcastExchange") =>
        val d = indent(l)
        val sub = lines.drop(i + 1).takeWhile(x => indent(x) > d)
        if (sub.isEmpty) "<no build subtree under BroadcastExchange>"
        else sub.mkString("\n")
    }
  }

  /** First non-dressing operator line of a build subtree: Project/
    * Filter/codegen/exchange wrappers are presentation, the node
    * under them is what the boundedness asserts are about. */
  private def firstRealOp(subtree: String): String = {
    val dressing = Seq("WholeStageCodegen", "InputAdapter", "Project",
      "Filter", "ColumnarToRow", "Exchange", "AQEShuffleRead",
      "ShuffleQueryStage", "ReusedExchange", "Sort ")
    subtree.linesIterator
      .map(_.dropWhile(c => " :+-".contains(c)).replaceFirst("^\\*\\(\\d+\\) ", ""))
      .find(op => op.nonEmpty && !dressing.exists(op.startsWith))
      .getOrElse("<no operator under BroadcastExchange>")
  }

  test("top-revenue join broadcasts the filtered customer side") {
    val p = plan(FrameOps.topRevenue(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("tfidf broadcasts the vocabulary-sized df table") {
    val p = plan(TextOps.tfidf(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("knn scans only the columns it needs") {
    val p = plan(SimilaritySearch.knnBrute(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // the embeddings scan must not read the label column
    assert(!p.contains("label"), p)
  }

  test("pricing summary pushes the shipdate filter into the scan") {
    val p = plan(FrameOps.pricingSummary(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
  }

  test("dedup verify joins carry no mandatory broadcast hint") {
    // a hardcoded broadcast() of the corpus-sized shingle/embedding
    // table would OOM at 100×; the verify joins must be plain
    // equi-joins whose strategy Catalyst/AQE picks from stats
    for (df <- Seq(Dedup.minhash(spark, sf), Dedup.embedNearDup(spark, sf))) {
      val analyzed = df.queryExecution.analyzed.toString
      assert(!analyzed.contains("ResolvedHint"), analyzed)
    }
    // and the plan still verifies: minhash output is non-empty at sf
    assert(Dedup.minhash(spark, sf).limit(1).count() == 1)
  }

  test("stable ids: parallel ranking, no single-partition funnel") {
    val df = FrameOps.stableIds(spark, sf)
    val p = plan(df)
    // the whole point of q98: the global row_number must NOT serialize
    // the corpus through one task (empty window partitionBy = Exchange
    // SinglePartition); ranking runs per range partition in parallel
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("Window"), p)
    // and the verdict is right: ids are a contiguous 1..N permutation
    val n = df.count()
    assert(df.agg(org.apache.spark.sql.functions.min("new_id")).head.getLong(0) == 1L)
    assert(df.agg(org.apache.spark.sql.functions.max("new_id")).head.getLong(0) == n)
    assert(df.select("new_id").distinct().count() == n)
  }

  test("q23/q124 rank in parallel: every window is pid-keyed, no empty-window rank") {
    // round-7 verdict items 5/6: the vocab dictionary rank and the
    // three RFM quintiles ride the q98 range-partition + offset-table
    // shape — a 10⁸-term vocab / 10⁹-user table must never serialize
    // through one window task. The property: every window spec in the
    // plan partitions by pid (the parallel per-range rank); an
    // empty-window row_number/ntile would print its ORDER columns
    // first. (A SinglePartition blanket check would be a proxy — the
    // 1-row n_docs scalar agg legitimately funnels.)
    for (df <- Seq(graft.operators.TextOps.dictionary(spark, sf),
        FrameOps.rfmSegments(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("ntile("), p)
      val specs = p.split("windowspecdefinition\\(").drop(1)
      assert(specs.nonEmpty && specs.forall(_.startsWith("pid")), p)
    }
  }

  test("click-train negatives are an equi-join, never a cross product") {
    val p = plan(graft.operators.WordItemApp.clickTrainData(spark, sf))
    // the pmod sampling rule is solved for the item residue, so the
    // negative space comes from a residue-class hash join: a cross
    // join + post-filter would scan O(|users|×|items|)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("mf item similarity broadcasts only the probe set") {
    val df = graft.ml.MlOps.mfItemSimilarity(spark, sf)
    val analyzed = df.queryExecution.analyzed.toString
    // exactly the probe-side hint — the full factor table must never
    // carry a mandatory broadcast
    assert(analyzed.contains("ResolvedHint"), analyzed)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("exact dedup shuffles digests, not text") {
    val p = plan(Dedup.exact(spark, sf))
    // after the first aggregate the exchange carries the md5 + partials
    assert(p.contains("md5"), p)
    assert(p.contains("Exchange hashpartitioning(content_hash"), p)
  }

  test("ivfpq broadcasts only the probe side; the coded corpus is never broadcast") {
    val df = SimilaritySearch.knnIvfPq(spark, sf)
    // the one mandatory hint is the bounded (|queries|×nprobe) side
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("ResolvedHint"), analyzed)
    val p = plan(df)
    // cell-probe join present, no cross product over the corpus
    assert(!p.contains("CartesianProduct"), p)
  }

  test("gopher rules: one map-side corpus pass, no explode, single agg exchange") {
    val p = plan(TextOps.gopherRules(spark, sf))
    assert(!p.contains("Generate"), p) // no explode anywhere
    // only the per-source aggregation shuffles (plus nothing else):
    // signals are computed row-local in the scan stage
    assert(p.split("Exchange hashpartitioning").length - 1 == 1, p)
  }

  test("repetition: two-level (doc, gram) aggregation with map-side combine") {
    val p = plan(TextOps.repetition(spark, sf))
    // partial_count before the (doc, gram) exchange = map-side combine;
    // the gram explosion must come from the codegen WordNGrams
    assert(p.contains("word_ngrams"), p)
    assert(p.contains("partial_count"), p)
  }

  test("chunk packing never shuffles: explode + row-local math only") {
    // the sort below the TopK-style output is for the deterministic
    // dump ordering; the chunking itself must add NO hash exchange
    val p = plan(graft.operators.CorpusOps.chunkPack(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("contamination broadcasts the eval grams, never the corpus side") {
    val p = plan(graft.operators.CorpusOps.contamination(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    // every broadcast build side must be BOUNDED: a bounded aggregate
    // (the eval-gram distinct, the per-doc hit counts) or the
    // hit-mass-bounded contamHits disk artifact (opt r08 — the hit
    // table is built once per session and re-read; the eval-gram
    // broadcast property then lives in the artifact's BUILD plan,
    // which runs through the same def). Never the raw corpus gram
    // stream (Generate/explode) or a documents scan.
    val buildSubs = broadcastBuildSides(p)
    assert(buildSubs.nonEmpty, p)
    buildSubs.foreach { h =>
      assert(h.contains("HashAggregate") || h.contains("graft_contam_hits"),
        s"broadcast build side is neither a bounded aggregate nor the hit artifact: $h")
      // the WHOLE build subtree (indent-bounded) must not carry the
      // corpus gram stream
      assert(!h.contains("word_ngrams") && !h.contains("Generate"),
        s"broadcast build side carries the corpus gram stream: $h")
    }
  }

  test("mix apply broadcasts the rate table: corpus side never sort-merge joins") {
    val p = plan(graft.operators.CorpusOps.mixApply(spark, sf))
    // the |sources|-row rate table must reach the corpus scan as a
    // broadcast; an SMJ here would shuffle the whole corpus on source
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("balanced sampling is a map-side filter: no window, no global sort") {
    val p = plan(graft.operators.CorpusOps.sampleBalance(spark, sf))
    assert(!p.contains("Window"), p)
    // corpus joins only against broadcast rate tables
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q173 fuzzy contamination: bipartite posting index, window-free argmax") {
    val p = plan(graft.operators.CorpusOps.fuzzyContam(spark, sf))
    // pairs come from the two-sided posting table, never a corpus
    // self-join or cross product
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("NestedLoopJoin"), p)
    assert(p.contains("collect_list"), p)
    // best-match pick is the partial-aggregable struct max, not a
    // per-doc rank window (lever (h): the oracle states the rank,
    // the plan never runs one)
    assert(!p.contains("Window"), p)
    // the 100 TB prune: the posting exchange sees only shingles that
    // survived the broadcast semi-join against the eval shingle set —
    // the corpus's full shingle stream never shuffles
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("q175 cdc chunking: window-free, keep-rule via partial-agg struct min") {
    spark.catalog.clearCache()
    val p = plan(graft.operators.CorpusOps.cdcChunks(spark, sf))
    // segmentation is the row-local codegen kernel; the keep rule is
    // q30's min-struct pick — no per-fp rank window, no cross product
    assert(p.contains("cdc_chunks"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q176/q179 cdc variants: kernel present, window-free, no cross product") {
    spark.catalog.clearCache()
    for ((df, kernel) <- Seq(
        (graft.operators.CorpusOps.incrementalCdc(spark, sf), "cdc_chunks"),
        (graft.operators.Multimodal.assetCdc(spark, sf), "cdc_bytes"))) {
      val p = plan(df)
      assert(p.contains(kernel), p)
      assert(!p.contains("Window"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("NestedLoopJoin"), p)
    }
  }

  test("span dedup generates pairs row-local: no positional self-join, no cross join") {
    for (df <- Seq(graft.operators.CorpusOps.spanDedup(spark, sf),
        graft.operators.CorpusOps.incrementalSpanDedup(spark, sf))) {
      val p = plan(df)
      // the scale rule: coverage comes from a gram-keyed equi-join,
      // never from joining the corpus to itself on position ranges
      assert(!p.contains("NestedLoopJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
      // cover starts travel as lists and expand row-local
      assert(p.contains("collect_list"), p)
    }
  }

  test("pmi: unigram count joins broadcast, rank window sees only MinCount survivors") {
    val p = plan(TextOps.pmiCollocations(spark, sf))
    // the vocab-bounded unigram table must reach the pair table as a
    // broadcast — an SMJ would shuffle every surviving pair twice
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the n_pair >= MinCount cut must sit below the rank window
    val wIdx = p.indexOf("Window")
    assert(wIdx >= 0, p)
    assert(p.substring(wIdx).contains("HashAggregate") ||
      p.substring(0, wIdx).contains(s">= ${TextOps.PmiMinCount}"), p)
  }

  test("range search streams the corpus map-side against broadcast queries") {
    val p = plan(SimilaritySearch.rangeSearch(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // the corpus is never shuffled before the radius cut: the only
    // Exchange feeds the rank window over tau-passing survivors
    val pre = p.substring(p.indexOf("BroadcastNestedLoopJoin"))
    assert(!pre.contains("Exchange hashpartitioning"), p)
  }

  test("keyness: word/source/total tables broadcast against the cell table") {
    val p = plan(TextOps.keyness(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("rfm: query-time plan touches only the per-user disk artifacts, never the log") {
    val p = plan(FrameOps.rfmSegments(spark, sf))
    // round 8: the corpus collapses ONCE into the per-(session,
    // corpus) per-user rollup artifact (and three ranged quintile
    // artifacts) at first call; the served plan joins only those
    // |users|-slim parquet frames — the event log never re-enters
    assert(p.contains("graft_rfm_"), p)
    assert(!p.contains("events.parquet"), p)
  }

  test("session transitions reuse the session rule's single user shuffle") {
    val p = plan(FrameOps.sessionTransitions(spark, sf))
    // lag + cumulative-sum + lead windows all ride ONE exchange on
    // user_id (the (user_id, session_id) window is satisfied by the
    // subset rule); only |types|^2-bounded rows shuffle after it
    assert(p.split("hashpartitioning\\(user_id").length - 1 == 1, p)
    // the per-from normalizer is a window over the count table — a
    // totals self-join would re-derive the window pyramid twice
    assert(!p.contains("Join"), p)
  }

  test("keyless interval join runs as a bucket equi-join, never a cartesian") {
    val p = plan(FrameOps.intervalJoin(spark, sf))
    // the naive keyless range join is BroadcastNestedLoop/Cartesian;
    // the bucket discretization must turn it into an equi-join
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("bucket"), p)
  }

  test("native session windows: one user shuffle, rollup reuses the clustering") {
    val p = plan(FrameOps.sessionWindow(spark, sf))
    assert(p.split("hashpartitioning\\(user_id").length - 1 == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("resample grid is generated in place, never cross-joined or re-shuffled") {
    val p = plan(FrameOps.resampleFfill(spark, sf))
    // the hour grid comes from sequence+explode over the per-user
    // bounds (linear in output), not a calendar cross join
    assert(p.contains("Generate explode(sequence"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"), p)
    // grid agg (u) + obs agg (u,hid) + obs re-cluster (u): the
    // user-partitioned grid itself is never exchanged again
    assert(p.split("Exchange hashpartitioning").length - 1 <= 3, p)
  }

  test("cohort retention: denominator is a window over the bounded table, no join") {
    val p = plan(FrameOps.cohortRetention(spark, sf))
    assert(!p.contains("Join"), p)
  }

  test("weighted sampling selects via bounded-heap agg, never a per-source sort") {
    val p = plan(graft.operators.CorpusOps.weightedSample(spark, sf))
    // the oracle STATES a window rank; the plan must not contain one —
    // selection is the partial TopK aggregate (k rows per partition
    // cross the shuffle, nothing per-source is ever sorted)
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("z-order scan pushes the box predicates to the parquet scan") {
    val df = graft.sources.ZOrder.zorderScan(spark, sf)
    // data skipping starts with pushdown: BOTH box dimensions must
    // reach the scan (row-group stat pruning happens in the reader).
    // Read the scan's metadata, not the plan string — toString elides
    // long PushedFilters lists.
    val pushed = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metadata("PushedFilters")
      }.get
    Seq("GreaterThanOrEqual(user_id", "LessThanOrEqual(user_id",
      "GreaterThanOrEqual(sec", "LessThanOrEqual(sec").foreach(f =>
      assert(pushed.contains(f), s"$f not pushed: $pushed"))
    // and the aggregate reads only the columns it needs
    val p = plan(df)
    val scanLine = p.split("\n").find(_.contains("ReadSchema")).get
    assert(!scanLine.contains("event_id"), scanLine)
  }

  test("scd2 intervals: lag/cumsum/rollup/lead all ride one user shuffle, no join") {
    val p = plan(FrameOps.scd2Intervals(spark, sf))
    // the gaps-and-islands chain must reuse ONE hashpartitioning(user_id)
    // exchange end-to-end (groupBy(user, version) is satisfied by the
    // subset rule; a self-join formulation would shuffle the log twice)
    assert(p.split("hashpartitioning\\(user_id").length - 1 == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("hopping windows expand map-side, never join a window table") {
    val p = plan(FrameOps.hoppingWindow(spark, sf))
    assert(!p.contains("Join"), p)
    // the 3-windows-per-event expansion happens before the first
    // exchange (map-side), as an Expand/Generate over the scan
    val firstExchange = p.indexOf("Exchange")
    val expand = math.max(p.indexOf("Expand"), p.indexOf("Generate"))
    assert(expand > firstExchange, p) // executedPlan prints root-first:
    // the expansion node sits BELOW (later in the string than) every
    // exchange above it
  }

  test("co-click cosine: marginals broadcast onto the pair table, no corpus SMJ") {
    val p = plan(graft.operators.WordItemApp.coClickCosine(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("psi drift: marginals are windows over the bounded count table") {
    val p = plan(graft.operators.CorpusOps.psiDrift(spark, sf))
    // corpus scans: one for the bucket counts + one distinct-source
    // scan for the dense grid — never a third, and no totals self-join
    // of the corpus (the only joins run on |sources|·|buckets| rows)
    assert(p.split("FileScan parquet").length - 1 <= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("per-event interval matches run as a bucket equi-join, never a cartesian") {
    val p = plan(FrameOps.intervalMatches(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"), p)
    // equi-join on the bucket key: broadcast at small SF (the window
    // side is bounded by the error rate), hash-partitioned otherwise
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("Exchange hashpartitioning(bucket"), p)
  }

  test("profile computes every metric in ONE table scan") {
    val p = plan(FrameOps.profile(spark, sf))
    // all metrics (incl. 3 exact distincts via EXPAND) fuse into a
    // single pass — one FileScan in the whole plan
    assert(p.split("FileScan parquet").length - 1 == 1, p)
    assert(p.contains("Expand"), p)
  }

  test("perceptual dedup shuffles hash rows, never pixel bytes") {
    val p = plan(graft.operators.Multimodal.perceptualDedup(spark, sf))
    // one decode pass; cluster sizes come from slim hash-keyed aggs
    assert(p.contains("Exchange hashpartitioning(ahash"), p)
    assert(p.contains("Exchange hashpartitioning(fp"), p)
    // no pairwise comparison anywhere
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // no EXCHANGE line carries the payload: binary bytes stay in
    // their scan partition (payload appears only in the cached decode
    // stage's lineage text, below the persist boundary)
    p.split("\n").filter(_.contains("Exchange")).foreach { l =>
      assert(!l.contains("payload"), l)
    }
  }

  test("snapshot diff: fingerprints collapse pre-shuffle, text never enters an exchange") {
    val p = plan(FrameOps.snapshotDiffDocs(spark, sf))
    // one equi-join on the key, no nested loop / cartesian fallback
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // no exchange row carries the text payload — only (key, md5) moves
    p.split("\n").filter(_.contains("Exchange")).foreach { l =>
      assert(!l.contains("text"), l)
    }
  }

  test("cube expands the lattice map-side: Expand below one agg exchange") {
    val p = plan(FrameOps.cubeSummary(spark, sf))
    assert(p.contains("Expand"), p)
    assert(!p.contains("Join"), p)
  }

  test("token budget: one source clustering, no join") {
    val p = plan(graft.operators.CorpusOps.tokenBudget(spark, sf))
    assert(p.contains("Exchange hashpartitioning(source"), p)
    assert(!p.contains("Join"), p)
  }

  test("ngram coverage: eval grams broadcast, corpus side single scan") {
    val df = graft.operators.CorpusOps.ngramCoverage(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    // both sides read documents, but the TRAIN side must be exactly
    // one scan (no re-derivation per consumer)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dsir: the lambda table broadcasts; scoring never sort-merge joins the corpus") {
    val p = plan(graft.operators.CorpusOps.dsirWeights(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    // bucket-keyed lambda join must not fall back to a shuffle join
    val scoring = p.substring(p.indexOf("Window"))
    assert(!scoring.contains("SortMergeJoin"), p)
  }

  test("conditional entropy: marginal is a window over the aggregated table, no join") {
    val p = plan(graft.operators.CorpusOps.condEntropy(spark, sf))
    assert(!p.contains("Join"), p)
  }

  test("quantile bands: one rank pass over the event_type clustering") {
    val p = plan(FrameOps.quantileBands(spark, sf))
    assert(!p.contains("Join"), p)
    // both windows and the final agg ride hashpartitioning(event_type)
    assert(p.contains("Exchange hashpartitioning(event_type"), p)
  }

  test("session paths: leads ride the session rule's one user shuffle, no join") {
    val p = plan(FrameOps.sessionPaths(spark, sf))
    assert(!p.contains("Join"), p)
    // exactly one exchange partitions the raw log (user_id); the
    // session-boundary guard is a lead of session_id, never a second
    // (user, session) repartition of the log
    val logShuffles = p.split("\n").count(l =>
      l.contains("Exchange hashpartitioning(user_id"))
    assert(logShuffles == 1, s"expected one user shuffle, got $logShuffles:\n$p")
  }

  test("q166 extract list: no global window, chunk agg only") {
    val p = plan(FrameOps.extractList(spark, sf))
    // the whole design point: the ordered-list extraction must not
    // rank the table through a window (single-partition funnel) —
    // key-range chunking needs only the groupBy shuffle
    assert(!p.contains("Window"), p)
  }

  test("q170 pseudonymize: the quasi-group table broadcasts, no SMJ of the log") {
    val p = plan(FrameOps.pseudonymize(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the PROPERTY, not the proxy (CLAUDE.md plan-assert rule):
    // every broadcast BUILD SIDE must be the bounded group-size
    // aggregate — a plan broadcasting the event log itself would
    // still contain a BHJ and must fail here
    val buildSubs = broadcastBuildSides(p)
    assert(buildSubs.nonEmpty, p)
    buildSubs.foreach(h => assert(firstRealOp(h).contains("HashAggregate"),
      s"broadcast build side is not the bounded aggregate: $h"))
  }

  test("q168 vacuumed-store reads stay partition-pruned") {
    val base = graft.sources.Sources.vacuumedStore(spark, sf)
    val p = plan(graft.sources.Sources.readVersionFrom(spark, base, 2))
    assert(p.contains("PartitionFilters") && p.contains("version"), p)
  }

  test("edit dedup: candidates from posting arrays, only the verify joins touch text") {
    val p = plan(Dedup.editDedupDerive(spark, sf))
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // exactly the two id-keyed text joins of the verify step — the
    // candidate generation itself must contribute NO join (posting
    // arrays, not a shingle self-join)
    val joins = p.split("\n").count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin"))
    assert(joins == 2, s"expected exactly 2 verify joins, got $joins:\n$p")
  }

  test("q182 pii scrub: one scan, row-local regex, no join/window; text never shuffles") {
    val p = plan(graft.operators.CorpusOps.piiScrubReport(spark, sf))
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.split("\n").count(_.contains("FileScan")) == 1, p)
    // scrubbed text must be consumed by the MAP-SIDE partial agg —
    // the child of the hash exchange (the next printed line, plans
    // print root-first) must be the partial HashAggregate, so only
    // |sources|-row partials ever shuffle
    val lines = p.linesIterator.toSeq
    val hashEx = lines.zipWithIndex.collectFirst {
      case (l, i) if l.contains("hashpartitioning") => i }.get
    assert(lines(hashEx + 1).contains("partial_"), p)
  }

  test("q183 zipf slope: head via TopKByKey, window-free at any vocab size") {
    val p = plan(TextOps.zipfSlope(spark, sf))
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
    assert(!p.contains("Join"), p)
  }

  test("q184 distinct-ngrams: per-order two-level aggs, no EXPAND, no join") {
    val p = plan(TextOps.distinctNgrams(spark, sf))
    assert(!p.contains("Expand") && !p.contains("Join") && !p.contains("Window"), p)
  }

  test("q185 source overlap: digest equi-join, never cartesian; counts broadcast") {
    val p = plan(graft.operators.CorpusOps.sourceOverlap(spark, sf))
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q186 embed outliers: wide per-dim sums (no posexplode), centroid broadcasts") {
    spark.catalog.clearCache() // cache-backed frames defeat plan asserts
    val p = plan(SimilaritySearch.embedOutliers(spark, sf))
    // no Generate (posexplode-per-dimension) anywhere — the wide-agg rule
    assert(!p.contains("Generate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // every broadcast build side is a bounded aggregate (|labels|
    // rows): the first non-dressing operator of the indent-bounded
    // build subtree must be the aggregate itself
    val buildSubs = broadcastBuildSides(p)
    assert(buildSubs.nonEmpty, p)
    buildSubs.foreach(h => assert(firstRealOp(h).contains("Aggregate"),
      s"broadcast build side is not the bounded aggregate:\n$h"))
  }

  test("q200 head is a bounded heap (TakeOrderedAndProject), window-free") {
    // the global top-K must be per-partition heaps + a K-row merge,
    // never a window (single-partition exchange) or a full sort
    val p = plan(TextOps.termBurstiness(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), p)
  }

  test("q202 gap window is keyed by user, never a global window") {
    val p = plan(FrameOps.botAudit(spark, sf))
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.nonEmpty, p)
    // the partition spec prints on the Window line — every gap window
    // must be keyed (a partition-less window is the single-partition
    // antipattern this suite bans elsewhere)
    assert(winLines.forall(_.contains("user_id")),
      s"window not partitioned by user:\n$p")
  }

  test("round-14 curve/report family: window-free, cartesian-free plans") {
    // q204: all nprobe levels from bounded heaps — never a rank window
    val p204 = plan(SimilaritySearch.ivfRecallCurve(spark, sf))
    assert(!p204.contains("Window"), p204)
    assert(!p204.contains("CartesianProduct"), p204)
    // q205: the tau sweep rides the pair artifact + TakeOrdered-free
    // bounded aggs; no window, no cartesian against the corpus
    val p205 = plan(Dedup.dedupThresholdCurve(spark, sf))
    assert(!p205.contains("Window"), p205)
    assert(!p205.contains("CartesianProduct"), p205)
    // q206: one tagged-gram stream per side; the gram generators are
    // codegen explodes, never a window or cartesian
    val p206 = plan(operators.CorpusOps.contamSensitivity(spark, sf))
    assert(!p206.contains("Window"), p206)
    assert(!p206.contains("CartesianProduct"), p206)
    // q207: wide per-dim sums + |labels|-row joins — no window, no
    // posexplode-per-dimension (the Summarizer-shape rule: the only
    // generator anywhere would be a per-dim explode, which is banned)
    val p207 = plan(SimilaritySearch.embedSeparation(spark, sf))
    assert(!p207.contains("Window"), p207)
    assert(!p207.contains("Generate"), p207)
  }

  test("q167 sketch profile has no Expand; q135's exact distincts do") {
    // q135's multiple exact count-distincts ride EXPAND (row
    // multiplication per distinct) — acceptable as the exact gate;
    // q167 is the DECLARED 100 TB path: approx_count_distinct keeps
    // mergeable HLL state, single pass, no row expansion. This pins
    // the documented contrast as an executable contract.
    val exact = plan(FrameOps.profile(spark, sf))
    val sketch = plan(FrameOps.profileSketch(spark, sf))
    assert(exact.contains("Expand"), exact)
    assert(!sketch.contains("Expand"), sketch)
    assert(sketch.contains("approx_count_distinct") || sketch.contains("HyperLogLog"), sketch)
  }

  test("q188 lsh calibration: rides the disk artifacts, no corpus scan") {
    val p = plan(Dedup.lshCalibration(spark, sf))
    assert(!p.contains("documents.parquet"), p)
    assert(p.contains("graft_"), p) // the staged pair artifacts
  }

  test("q187 signal corr: sample via TopKByKey (no rank window), signals row-local") {
    val p = plan(TextOps.signalCorr(spark, sf))
    assert(!p.contains("Window"), p)
    // the bounded selection broadcasts against the signal scan
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // ORDER: the expensive signal projection (tokenize + interpreted
    // char-count fold, recognizable by array_distinct) sits ABOVE the
    // broadcast join — i.e. runs only on the K-per-source survivors,
    // never the whole corpus (round-7 fix of the round-6 `weak`).
    // explain prints parents first, so the Project line must come
    // strictly before the join line.
    val lines = p.linesIterator.toSeq
    val sigLine = lines.indexWhere(_.contains("array_distinct"))
    val joinLine = lines.indexWhere(_.contains("BroadcastHashJoin"))
    assert(sigLine >= 0 && joinLine >= 0, p)
    assert(sigLine < joinLine,
      s"signal projection (line $sigLine) must be computed above the sample join (line $joinLine):\n$p")
  }

  test("round-15 planning family: one-scan curve, bounded joins, heap-limited sample windows") {
    // q212: the whole context-length grid from ONE corpus scan — no
    // join, no window; the only Generate is the |grid| explode over
    // the AGGREGATED (|sources|-row) table
    val p212 = plan(operators.CorpusOps.packEfficiency(spark, sf))
    assert(!p212.contains("Join"), p212)
    assert(!p212.contains("Window"), p212)
    assert("Scan parquet".r.findAllIn(p212).length == 1, p212)
    // q213: the mix denominator is the lever-(g) WINDOW over the
    // |sources|-row table (opt r09 — the old 1-row decimal-total
    // cross join consumed the corpus rollup twice), so no nested-loop
    // join remains; no cartesian, no Expand
    val p213 = plan(operators.CorpusOps.epochPlan(spark, sf))
    assert(p213.contains("Window"), p213)
    assert(!p213.contains("CartesianProduct"), p213)
    assert(!p213.contains("BroadcastNestedLoopJoin"), p213)
    assert(!p213.contains("Expand"), p213)
    // q214: the suite-bounded eval gram side is the BROADCAST build of
    // the inner gram join — the corpus gram stream must never reach a
    // shuffle join; the one Expand services the two distinct counts
    // over the HIT-sized pair table (documented)
    val p214 = plan(operators.CorpusOps.evalDecontam(spark, sf))
    assert(p214.contains("BroadcastHashJoin"), p214)
    assert(!p214.contains("SortMergeJoin Inner"), p214)
    assert("Expand".r.findAllIn(p214).length <= 1, p214)
    // q215: both sample-rank windows are WindowGroupLimit-pushed —
    // Spark keeps per-partition top-K heaps below the exchange, so
    // the K-cut never sorts more than K survivors per group globally
    val p215 = plan(operators.CorpusOps.qualityTrainset(spark, sf))
    assert(p215.contains("WindowGroupLimit"), p215)
    assert(!p215.contains("CartesianProduct"), p215)
    // q220: both rule sets are row-local columns over ONE scan —
    // no join, no window, |sources|-row rollup (q72's shape, A/B'd)
    val p220 = plan(TextOps.ruleChangeImpact(spark, sf))
    assert(!p220.contains("Join"), p220)
    assert(!p220.contains("Window"), p220)
    assert("Scan parquet".r.findAllIn(p220).length == 1, p220)
    // q221: quantize→reconstruct→measure is ONE codegen kernel in the
    // final plan (the q175 kernel-present contract); one scan, no
    // join/window, |labels|-row rollup
    val p221 = plan(SimilaritySearch.sq8Distortion(spark, sf))
    assert(p221.contains("sq8_err2q"), p221)
    assert(!p221.contains("Join"), p221)
    assert(!p221.contains("Window"), p221)
    assert("Scan parquet".r.findAllIn(p221).length == 1, p221)
    // q218: the ingest leak gate is a narrow map stage — the kernel
    // in the plan, no join/shuffle besides the presentation sort
    val p218 = plan(SimilaritySearch.leakGate(spark, sf))
    assert(p218.contains("max_cosine") || p218.contains("max_cos"), p218)
    assert(!p218.contains("Join"), p218)
    assert(!p218.contains("Window"), p218)
  }

  test("round-16 knob cards: one-scan curves, window normalizer, no joins") {
    // q232: the whole merge-budget curve costs ONE corpus scan (the
    // vocab word count); the BpeSteps+1 fold levels live on the
    // bounded vocab table — no join, no window anywhere
    val p232 = plan(TextOps.bpeMergeCurve(spark, sf))
    assert(!p232.contains("Join"), p232)
    assert(!p232.contains("Window"), p232)
    assert("Scan parquet".r.findAllIn(p232).length == 1, p232)
    // q233: one corpus scan; the per-α normalizer is a WINDOW over
    // the |sources|×4 grid (lever (g)) — a totals self-join would
    // re-derive the corpus rollup per consumer
    val p233 = plan(operators.CorpusOps.temperatureMix(spark, sf))
    assert(!p233.contains("Join"), p233)
    assert(p233.contains("Window"), p233)
    assert("Scan parquet".r.findAllIn(p233).length == 1, p233)
    // q236: one corpus scan into the rollup Expand; no join, no window
    val p236 = plan(operators.CorpusOps.partitionPlan(spark, sf))
    assert(!p236.contains("Join"), p236)
    assert(!p236.contains("Window"), p236)
    assert("Scan parquet".r.findAllIn(p236).length == 1, p236)
    // q237: the top-10 mass rides the SAME aggregation as the stats
    // through the bounded TopKByKey heap (opt r09 — the separate
    // TakeOrdered consumed the count table a second time: 2 base
    // scans per family); no window, no sort-merge join, no join at
    // all — three independent one-scan agg arms unioned
    val p237 = plan(FrameOps.skewAudit(spark, sf))
    assert(p237.contains("topkagg"), p237)
    assert(!p237.contains("Join"), p237)
    assert(!p237.contains("Window"), p237)
  }
}
