package graft

import org.apache.spark.sql.SparkSession

/** Registry of the suite's memoized SHARED-BUILD artifacts (the
  * co-purchase edge frame, the triangle bundle, the BM25 run, the
  * unigram-LM training run, the Lloyd k-means bundle).
  *
  * Why this exists (r12 advice): a memoized bundle built lazily inside
  * the first consuming query makes the bench artifact dishonest — the
  * build lands in one sample of one arbitrary query, median-of-3
  * discards it, and the artifact's totals no longer contain the
  * suite's dominant costs at all. The registry lets [[graft.Bench]]
  * CLEAR every cache at the start of each sample pass and rebuild each
  * artifact as its OWN timed line item (`b_*` entries in the per-query
  * map, listed under `shared_builds`), so the build cost is measured
  * median-of-3 like every query, counted in the total, and labeled —
  * while consuming queries keep measuring exactly their compose-only
  * cost.
  *
  * Registration happens in each query pack's object initializer, which
  * `SparkEntry.queries` forces before any bench/verify loop runs.
  */
object SharedBuilds {

  /** One memoized artifact: `clear` drops the given session's cached
    * frames (so `force` rebuilds from scratch); `force(session, dir)`
    * builds and MATERIALIZES the artifact for a fixture dir (the
    * builders end in eager `localCheckpoint(true)`, so returning is
    * materializing). */
  final case class Entry(name: String,
      clear: SparkSession => Unit,
      force: (SparkSession, String) => Unit)

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  def register(name: String)(clear: SparkSession => Unit)(
      force: (SparkSession, String) => Unit): Unit =
    reg.put(name, Entry(name, clear, force))

  /** All registered artifacts, name-sorted — dependency order is by
    * NAME (e.g. `copurchase_edges` sorts before `tri_bundle`), so a
    * dependent bundle's timing measures only its own increment. */
  def all: Seq[Entry] =
    reg.values().toArray(new Array[Entry](0)).toSeq.sortBy(_.name)
}
