package graft.queries

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo for materialized intermediates that multiple
  * catalog queries (or repeated invocations of one query) share: the
  * near-dup component table consumed by both q_doc_dup_clusters and
  * q_doc_cluster_rep, signature/band-key frames, trained k-means
  * centroids, BPE merge tables.
  *
  * Design (the round-4 verdict's cache-hygiene + aux-hoisting asks):
  *
  *   - Frames stored here are localCheckpoint-materialized with
  *     SERIALIZED storage (MEMORY_AND_DISK_SER — the deserialized
  *     default's unroll builds an object vector per partition with
  *     amortized doubling, which is what actually blew the 16-32 GiB
  *     sf10 heaps: 32 concurrent ~250 MB unrolls), NOT
  *     `.cache()`d: nothing is registered in the CacheManager, so
  *     repeated invocations of a query can never emit "already cached"
  *     warnings or stack duplicate cache entries, and
  *     `spark.catalog.clearCache()` (Bench's between-queries reset)
  *     cannot silently drop a frame another query still needs.
  *   - Oracle-aux parquet writes live INSIDE the memoized block, so a
  *     session performs each write exactly once per corpus: Verify pays
  *     it once per query family (as before), while Bench's min-of-two
  *     timing discards the first (write-bearing) run and measures the
  *     pure query.
  *   - Keys embed the corpus dir, so different fixtures in one session
  *     (specs at sf0.001, a probe at a temp dir) never collide. The
  *     corpus under a dir is assumed immutable for the session — the
  *     same assumption the corpus-keyed oracle-aux layout already makes.
  *
  * RELEASE STORY (round-10 verdict #3 — the full-catalog sf10 sweep
  * used to OOM a 16 GiB local-mode driver from memo blocks that only
  * died with the session): the memo is now an LRU with a BYTE budget.
  *
  *   - Each frame's checkpoint RDD is captured at insert (the
  *     `LogicalRDD` at the root of a localCheckpoint'd plan) along with
  *     its block footprint from the BlockManager; when the summed
  *     footprint exceeds [[budgetBytes]] (`SPARK_GRAFT_SHARED_BUDGET_MB`,
  *     default a quarter of the driver heap), least-recently-used
  *     frames are dropped AND their blocks unpersisted immediately —
  *     deterministic release, not GC-whenever ContextCleaner
  *     reclamation. Eviction runs BEFORE a miss builds as well as
  *     after it inserts: the heavy build is exactly when the heap
  *     needs the old families' blocks gone.
  *   - Eviction never touches an entry accessed during the CURRENT
  *     query ([[setContext]] bumps an access epoch): a query whose plan
  *     laces several memo frames together cannot have one evicted from
  *     under its own pending materialization. An evicted frame that a
  *     LATER query needs is simply rebuilt (memo miss) — correctness
  *     never depends on residency.
  *   - Driver-side values (centroid arrays, merge lists) are
  *     byte-negligible and never evicted.
  *
  * Every build is also logged — (key, seconds, triggering query, bytes)
  * — and surfaced by Bench in the artifact's "frame_builds" map, so
  * memoized family build costs adjudicate mechanically (round-10
  * verdict #4) instead of by hand-written exponent-table notes.
  */
object SharedFrames {

  private final case class Entry(value: AnyRef, rdd: Option[RDD[_]],
                                 bytes: Long, var lastEpoch: Long)

  private val memo =
    scala.collection.mutable.LinkedHashMap.empty[(SparkSession, String), Entry]
  private val builds =
    scala.collection.mutable.ArrayBuffer
      .empty[(SparkSession, String, Double, String, Long, String)]

  @volatile private var epoch: Long = 0L
  @volatile private var context: String = ""
  @volatile private var phase: String = "timed"

  /** Byte budget for resident frame blocks (mem + disk). Default: a
    * QUARTER of the driver's max heap — local-mode blocks live in the
    * same JVM as execution memory, so a fixed budget either starves a
    * small driver or under-uses a big one (an 8 GiB default measurably
    * OOM'd the 16 GiB sf10 sweep: retained deserialized checkpoint
    * blocks squeezed the unified-memory execution pool). At the gate/
    * bench SFs the whole-catalog footprint sits far below a 16 GiB
    * driver's 4 GiB quarter — zero behavior change there.
    */
  val budgetBytes: Long = sys.env.get("SPARK_GRAFT_SHARED_BUDGET_MB")
    .map(_.toLong * 1024L * 1024L)
    .getOrElse(Runtime.getRuntime.maxMemory / 4)

  /** Test seam: SharedFramesSpec exercises eviction without a
    * multi-GiB corpus. Production reads [[budgetBytes]].
    */
  private[graft] var budgetOverride: Option[Long] = None
  private def effectiveBudget: Long = budgetOverride.getOrElse(budgetBytes)

  /** Mark the start of a new consumer (Bench calls this per query).
    * Bumps the access epoch that eviction respects and labels
    * subsequent builds in the build log.
    */
  def setContext(query: String): Unit = synchronized {
    epoch += 1; context = query; phase = "timed"
  }

  /** Label subsequent builds with an execution phase. Bench marks its
    * UNTIMED oracle-aux prepare window as "prepare": a build paid
    * there (centroid training, index materialization) never inflates
    * the query's own timing, so the exponent adjudication in
    * tools/update_pins.py must not count it toward build-domination —
    * before this flag, a prepare-hook build made a sub-second index
    * READ look build-dominated and family-sum against whatever shared
    * its probe subset (r13).
    */
  def setPhase(p: String): Unit = synchronized { phase = p }

  /** Memoized materialized frame (caller's block must return an eagerly
    * materialized frame — `localCheckpoint(true)` or equivalent).
    *
    * The build itself runs OUTSIDE the global lock: `f` is an eager
    * localCheckpoint — a full Spark job lasting seconds to minutes at
    * sf10 — and holding `this` for its duration would serialize every
    * concurrent frame/value/setContext/buildLog caller (parallel test
    * suites, a second session) behind one build. On a lost insert race
    * the duplicate's blocks are unpersisted and the winner returned, so
    * at worst a rare concurrent miss pays one redundant build — the
    * same cost as an LRU-evicted rebuild, and correctness never
    * depended on residency anyway.
    */
  def frame(s: SparkSession, key: String)(f: => DataFrame): DataFrame = {
    val k = (s, key)
    val hit = synchronized {
      val h = memo.get(k)
      h match {
        case Some(e) => e.lastEpoch = epoch
        case None =>
          // make room FIRST: the miss's build is the heap-hungry
          // moment, and stale families' blocks must not sit under it
          evict(s)
      }
      h
    }
    hit match {
      case Some(e) => e.value.asInstanceOf[DataFrame]
      case None =>
        val t0 = System.nanoTime()
        val df = f
        val sec = (System.nanoTime() - t0) / 1e9
        val rdd = df.queryExecution.analyzed.collectFirst {
          case l: LogicalRDD => l.rdd
        }
        val bytes = rdd.flatMap(r =>
          s.sparkContext.getRDDStorageInfo.find(_.id == r.id))
          .map(i => i.memSize + i.diskSize).getOrElse(0L)
        synchronized {
          memo.get(k) match {
            case Some(e) =>
              // lost the race: release this build's blocks, keep the winner
              rdd.foreach(_.unpersist(blocking = false))
              e.lastEpoch = epoch
              e.value.asInstanceOf[DataFrame]
            case None =>
              memo.put(k, Entry(df, rdd, bytes, epoch))
              builds += ((s, key, sec, context, bytes, phase))
              evict(s)
              df
          }
        }
    }
  }

  /** Memoized driver-side artifact (centroid table, merge list) —
    * byte-negligible, never evicted. Same build-outside-the-lock shape
    * as [[frame]]: training centroids or a BPE merge table runs Spark
    * jobs for seconds, and must not serialize the whole process.
    */
  def value[T <: AnyRef](s: SparkSession, key: String)(f: => T): T = {
    val k = (s, key)
    val hit = synchronized {
      val h = memo.get(k)
      h.foreach(_.lastEpoch = epoch)
      h
    }
    hit match {
      case Some(e) => e.value.asInstanceOf[T]
      case None =>
        val t0 = System.nanoTime()
        val v = f
        val sec = (System.nanoTime() - t0) / 1e9
        synchronized {
          memo.get(k) match {
            case Some(e) => e.lastEpoch = epoch; e.value.asInstanceOf[T]
            case None =>
              builds += ((s, key, sec, context, 0L, phase))
              memo.put(k, Entry(v, None, 0L, epoch))
              v
          }
        }
    }
  }

  /** LRU eviction to the byte budget: drop (and unpersist NOW) frames
    * not touched in the current epoch, least-recent first.
    *
    * The budget is accounted PER SESSION, matching the candidate
    * filter: summing JVM-wide while evicting only session-local frames
    * meant another session's resident blocks (a test harness's
    * `newSession()`, a future concurrent server) could pin the total
    * above budget forever, churning this session's frames through
    * needless evict/rebuild cycles — or, symmetrically, leave the JVM
    * over budget with nothing this call was allowed to drop. Each
    * session owning budgetBytes is the correct local-mode contract:
    * Bench/Verify run one session, and the multi-session case (specs)
    * is bounded by #sessions × budget, each independently reclaimable.
    */
  private def evict(s: SparkSession): Unit = {
    var total = memo.iterator
      .collect { case (k, e) if k._1 eq s => e.bytes }.sum
    if (total <= effectiveBudget) return
    // eviction exists to reclaim BYTES: a frame whose footprint is a
    // rounding error of the budget cannot meaningfully reduce `total`,
    // but dropping it forfeits its build (the r11 sf10 sweep evicted a
    // 1.7 MB pair table by LRU order and paid a 44.5 s rebuild). Such
    // frames stay resident — bounded by #keys × negligible.
    val minEvictBytes = effectiveBudget >> 8
    val candidates = memo.toSeq
      .filter { case (k, e) => (k._1 eq s) && e.rdd.isDefined &&
        e.bytes >= math.max(1L, minEvictBytes) && e.lastEpoch < epoch }
      .sortBy(_._2.lastEpoch)
    val it = candidates.iterator
    while (total > effectiveBudget && it.hasNext) {
      val (k, e) = it.next()
      e.rdd.foreach(_.unpersist(blocking = false))
      memo.remove(k)
      total -= e.bytes
    }
  }

  /** Build log for a session: (key, build seconds, query that
    * triggered the build, block bytes). Bench dumps this into the
    * artifact so memo accounting adjudicates itself.
    */
  def buildLog(s: SparkSession): Seq[(String, Double, String, Long, String)] = synchronized {
    builds.collect { case (ss, k, sec, q, b, ph) if ss eq s => (k, sec, q, b, ph) }.toSeq
  }

  /** Drop every entry for a session, unpersisting frame blocks. */
  def clear(s: SparkSession): Unit = synchronized {
    memo.keys.filter(_._1 eq s).toSeq.foreach { k =>
      memo.remove(k).foreach(_.rdd.foreach(_.unpersist(blocking = false)))
    }
    builds.filterInPlace(_._1 ne s)
  }
}
