package graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Session-scoped artifact registries (the reference's shared gokart
  * task outputs): every cached model/frame/index dir is keyed by a
  * tuple whose FIRST element is the owning SparkSession — per
  * CLAUDE.md, never by dir alone — and is EVICTED when that
  * session's SparkContext ends, so a long-lived multi-session JVM
  * can't leak dead sessions' cached frames/models. The first access
  * from a context installs one listener on its bus; onApplicationEnd
  * sweeps every registry for keys owned by that context (all
  * sessions of a context die with it).
  *
  * API matches TrieMap's (`getOrElseUpdate(key, value)` / `get`),
  * but with a STRONGER build contract: the by-name builder for a key
  * runs at most once even under concurrent first access (per-key
  * lazy slot), because builders here side-effect (they overwrite a
  * per-key parquet path) and a double-run could hand a reader a
  * partially rewritten artifact.
  */
object SessionRegistry {
  /** Declared ceiling for any COLLECTED-ROWS registry entry (mad
    * thresholds: |event types|; ML experiments: eval-summary tables).
    * Corpus-shaped outputs must never ride a rows registry (they go
    * to disk artifacts); PropertySpec drives the consumers at sf0.1
    * and asserts every live entry honors this bound — the "bounded by
    * construction" claims as an executable contract. */
  private[graft] val CollectedRowsCeiling = 4096

  private val all = new java.util.concurrent.CopyOnWriteArrayList[Cache[_ <: Product, _]]()
  private val hooked = TrieMap.empty[SparkContext, Boolean]

  /** Memoized builder slot: `value` is a lazy val, so JVM lazy-init
    * locking guarantees the by-name builder runs AT MOST ONCE per
    * key even under concurrent first access — TrieMap's own
    * getOrElseUpdate may evaluate the by-name argument in two racing
    * threads and discard one result, which is unsafe for our
    * side-effecting builders (parquet overwrites to a fixed path). */
  private final class Slot[V](builder: () => V) {
    @volatile private var built = false
    lazy val value: V = { val r = builder(); built = true; r }
    def isBuilt: Boolean = built
  }

  final class Cache[K <: Product, V] private[SessionRegistry] (
      clean: Option[V => Unit]) {
    private val m = TrieMap.empty[K, Slot[V]]
    private def session(k: K): SparkSession =
      k.productElement(0).asInstanceOf[SparkSession]
    def getOrElseUpdate(k: K, v: => V): V = {
      hook(session(k))
      val slot = new Slot[V](() => v)
      m.putIfAbsent(k, slot).getOrElse(slot).value
    }
    def get(k: K): Option[V] = m.get(k).filter(_.isBuilt).map(_.value)
    private[graft] def evict(sc: SparkContext): Unit =
      m.keys.filter(k => session(k).sparkContext eq sc).foreach { k =>
        m.remove(k).foreach(s =>
          if (s.isBuilt) clean.foreach(f => scala.util.Try(f(s.value))))
      }
    private[graft] def liveKeyCount(spark: SparkSession): Int =
      m.keys.count(k => session(k) eq spark)
    /** Built values owned by the session — lets specs turn "this
      * registry only ever holds bounded artifacts" from a doc claim
      * into an executable contract (PropertySpec's registry-ceiling
      * test). */
    private[graft] def liveValues(spark: SparkSession): Seq[V] =
      m.toSeq.collect {
        case (k, s) if (session(k) eq spark) && s.isBuilt => s.value
      }
  }

  def cache[K <: Product, V](): Cache[K, V] = {
    val c = new Cache[K, V](None)
    all.add(c)
    c
  }

  /** Cache whose values own external resources (tmp artifact dirs):
    * `clean` runs on each evicted value so a context's disk
    * artifacts die with its registry entries. */
  def cacheWithCleanup[K <: Product, V](clean: V => Unit): Cache[K, V] = {
    val c = new Cache[K, V](Some(clean))
    all.add(c)
    c
  }

  /** Session-unique token for disk-artifact paths. applicationId
    * alone is shared by every `newSession()` of one context, so two
    * sessions' registries (keyed per-session) would map to the SAME
    * path and the second build would mode-overwrite a dir the first
    * session may still be lazily reading. Adding the session's
    * identity hash makes path ownership match registry ownership. */
  def sessionToken(spark: SparkSession): String =
    spark.sparkContext.applicationId + "_s" +
      Integer.toHexString(System.identityHashCode(spark))

  /** Collision-free path component for disk-artifact dirs: the
    * readable sanitized form of the raw key PLUS a short hash of the
    * raw bytes. Character sanitization alone is lossy — two distinct
    * registry keys can map to one /tmp path (e.g. dirs differing only
    * in '/' vs '_', or multi-part keys whose parts contain the
    * separator), and the second build would mode-overwrite an
    * artifact the first key still reads (r08 ADVICE). Multi-part keys
    * join their raw parts with a separator before calling this. */
  def pathKey(raw: String): String = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(raw.getBytes("UTF-8"))
    raw.replaceAll("[^A-Za-z0-9._-]", "_") + "_h" +
      md5.take(4).map(b => f"$b%02x").mkString
  }

  /** Recursive delete for tmp artifact dirs (the standard cleanup). */
  def deleteDir(path: String): Unit = {
    val root = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** Sweep every registry for the context's keys (the listener body;
    * package-visible so the eviction path is unit-testable without
    * stopping the suite's shared context). */
  private[graft] def evictContext(sc: SparkContext): Unit = {
    all.forEach(_.evict(sc))
    hooked.remove(sc)
  }

  private[graft] def isHooked(sc: SparkContext): Boolean = hooked.contains(sc)

  /** Total entries owned by the session across every registry (test
    * observability). */
  private[graft] def liveKeyCount(spark: SparkSession): Int = {
    var n = 0
    all.forEach(c => n += c.liveKeyCount(spark))
    n
  }

  private def hook(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    if (hooked.putIfAbsent(sc, true).isEmpty) {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evictContext(sc)
      })
    }
  }
}
