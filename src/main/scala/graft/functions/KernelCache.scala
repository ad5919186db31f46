package graft.functions

/** Small bounded LRU for per-JVM kernel state (automatons, parsed rule
  * tables, vocab tries). Executors are long-running: an UNbounded
  * ConcurrentHashMap keyed by expression payload accumulates one
  * blocklist-sized structure per distinct payload for the JVM's
  * lifetime. This cache holds the hot few (access-order LRU) and lets
  * evicted entries be rebuilt on demand — a duplicate concurrent build
  * is benign (both results are valid; one wins).
  */
private[functions] final class KernelCache[K, V](maxEntries: Int) {
  require(maxEntries > 0)
  private val m = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        size() > maxEntries
    })

  def getOrCompute(k: K, f: java.util.function.Function[K, V]): V =
    m.computeIfAbsent(k, f)

  private[functions] def sizeNow: Int = m.size()
}
