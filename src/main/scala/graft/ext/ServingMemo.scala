package graft.ext

import org.apache.spark.sql.DataFrame
import scala.collection.concurrent.TrieMap

/** The serving-memo discipline shared by the LM / bigram / NB serving
  * caches: `getOrElseUpdate` keyed on (application id, artifact dir,
  * params, artifact meta) — the additive fingerprint in the meta key
  * bumps on every append/remove, so a mutated artifact re-nets — plus
  * PREFIX EVICTION. Without eviction a long-lived session scoring
  * against an appending artifact (e.g. streaming ingest) accumulates
  * one stale localCheckpointed frame set per mutation, and their
  * cached blocks are never freed (r9 advice). When a new meta key is
  * inserted for the same app#dir#params prefix, every entry built
  * against an older meta is released: its pinned frames are
  * unpersisted and the entry dropped.
  */
object ServingMemo {

  /** A memo value plus the localCheckpointed frames it pins. `pins`
    * must list EVERY frame the entry keeps cached (returned frames
    * and any intermediates not unpersisted inside the build).
    */
  final case class Entry[V](value: V, pins: Seq[DataFrame])

  private def release(e: Entry[_]): Unit =
    e.pins.foreach(f => try f.unpersist() catch { case _: Throwable => () })

  /** Look up `prefix#metaKey`; on miss, evict stale same-prefix
    * entries (unpersisting their pins), build, and insert. A racing
    * duplicate build is released, never leaked: `putIfAbsent` keeps
    * the winner.
    */
  def cached[V](memo: TrieMap[String, Entry[V]], prefix: String,
                metaKey: String)(build: => Entry[V]): V = {
    val full = prefix + "#" + metaKey
    memo.get(full) match {
      case Some(e) => e.value
      case None =>
        memo.keysIterator
          .filter(k => k.startsWith(prefix + "#") && k != full)
          .toList
          .foreach(k => memo.remove(k).foreach(release))
        val e = build
        memo.putIfAbsent(full, e) match {
          case Some(prev) => release(e); prev.value
          case None => e.value
        }
    }
  }
}
