package graft

/** Session-wide registry that pairs oracle-literal captures with the dir the
  * harness is actually driving.
  *
  * The literal-constant oracle mechanism (see [[operators.Clustering]]
  * scaladoc) freezes run-time constants — seeded-fit centroids, sketch
  * estimates — into dynamically built oracle SQL. Storing them in single-slot
  * last-write-wins globals mis-pairs capture and dump the moment one process
  * fits on two dirs or with non-default params (a phantom oracle mismatch
  * with no code defect). So: capture sites store into a [[Captured]] keyed by
  * (dir, params), Verify/Bench pin [[currentDir]] before running queries, and
  * oracle builders select the entry matching the pinned dir. Un-pinned
  * sessions (specs) fall back to the most recent capture with matching
  * params, or the unique one across dirs.
  */
object OracleCapture {

  /** The sfDir the harness process is driving; set by Verify/Bench mains
    * before any query runs. */
  @volatile var currentDir: Option[String] = None

  /** Keyed capture store: (dir, params) → value, with a last-write pointer
    * for un-pinned (spec) sessions. */
  final class Captured[P, V] {
    private val m = scala.collection.concurrent.TrieMap.empty[(String, P), V]
    @volatile private var last: Option[(String, P)] = None

    def put(dir: String, p: P, v: V): Unit = {
      m((dir, p)) = v
      last = Some((dir, p))
    }

    /** Dir-EXACT lookup — for pure fit caches where serving a different
      * dir's capture is a correctness bug, not a convenience (the q233
      * eigenvector fitted at one SF fails the eigen gate at another; the
      * shared-JVM test suite hit exactly that through [[get]]'s no-pin
      * "most recent" fallback). */
    def getFor(dir: String, p: P): Option[V] = m.get((dir, p))

    /** The capture for `params` in the harness's pinned dir; when no dir is
      * pinned, the most recent capture with those params, else the unique
      * cross-dir one (ambiguity → None, never a wrong-dir literal). */
    def get(p: P): Option[V] = currentDir match {
      case Some(d) => m.get((d, p))
      case None =>
        last.filter(_._2 == p).flatMap(m.get).orElse {
          val hits = m.collect { case ((_, pp), v) if pp == p => v }.toSeq
          if (hits.size == 1) Some(hits.head) else None
        }
    }
  }
}
