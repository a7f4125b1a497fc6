package graft

/** SINGLE registry for the once-per-session protocol-gate caches
  * (q314–q337: medallion/variant/snapshot/serving/tiered-stream gates).
  *
  * Before this registry the bench replay's invalidate-before-retime hook
  * and the gates' cache declarations were two hand-maintained parallel
  * lists (`ExtQueries.invalidateGate` + `Substrates.invalidators`) — a
  * future cached gate that was added to one but not the other silently
  * reverted to the unadjudicable-flag blind spot r14 closed (the replay
  * returned the memoized frame, so a tripwire flag on the gate could
  * never be adjudicated). Now a gate cache EXISTS only by registering
  * here under its query name, and [[Substrates.invalidate]] asks this
  * registry directly — registration IS invalidator coverage, there is no
  * second list to forget. Round15Spec additionally pins that every
  * registered name resolves to a real query and that no raw
  * session-keyed TrieMap reappears in the query files outside the
  * documented substrate/durable-artifact exemptions.
  *
  * Keys are (applicationId, fixtureDir) — the same session scoping every
  * gate used individually. Values stay fully typed per gate via the
  * [[Gate]] wrapper; the registry itself is heterogeneous.
  */
object SessionCaches {
  /** A typed session cache registered under one query name. */
  final class Gate[T] private[SessionCaches] (val query: String) {
    private[SessionCaches] val m =
      scala.collection.concurrent.TrieMap.empty[(String, String), T]
    def getOrElseUpdate(key: (String, String), v: => T): T =
      m.getOrElseUpdate(key, v)
    private[SessionCaches] def drop(app: String): Unit =
      m.keys.filter(_._1 == app).foreach(m.remove)
  }

  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, Gate[_]]

  /** Create (or fetch) the cache for `query`. Called from a gate
    * object's `val` initializer, so registration happens at class-init —
    * strictly before any bench replay could need to invalidate it.
    */
  def gate[T](query: String): Gate[T] =
    registry.getOrElseUpdate(query, new Gate[T](query)).asInstanceOf[Gate[T]]

  /** Query names with a registered session cache (spec surface). */
  def registeredGates: Set[String] = registry.keys.toSet

  /** Drop `query`'s cached frame for one application so the bench
    * replay's retime re-runs the whole protocol (safe: every gate builds
    * in fresh [[TempDirs]] per run). Unknown names are a no-op — the
    * dispatch is total by construction.
    */
  def invalidate(query: String, app: String): Unit =
    registry.get(query).foreach(_.drop(app))
}
