package graft.ops

/** Crash-safe in-place rewrite of a directory layout — the commit
  * protocol shared by the band-index compaction
  * ([[graft.dedup.Dedup.compactBandIndex]]) and the IVF index recenter
  * ([[graft.similarity.Knn.recenterIvfIndex]]): rewrite to a sibling
  * `.compacting` dir, then swap via rename-aside (live → `.old`,
  * rewritten → live, delete `.old`). No instant exists at which neither
  * a live nor a `.old` copy is intact, so a crash anywhere in the swap
  * window loses nothing — [[recover]] (run on entry) restores `.old`
  * when the live dir is missing and drops a stale `.old` next to an
  * intact live dir. On a real lake the identical rewrite commits via
  * the table format's atomic metadata swap (Iceberg/Delta
  * rewrite-files).
  *
  * SINGLE-WRITER, like the table-format commit protocols this stands in
  * for: recovery racing a LIVE rewrite inside its swap window could
  * restore `.old` under the writer's feet and abort a healthy swap.
  */
object AtomicSwap {

  /** Idempotent crash recovery — see object doc for the two windows. */
  def recover(path: String): Unit = {
    import graft.queries.Scratch.rmTree
    val live = new java.io.File(path)
    val old = new java.io.File(path + ".old")
    if (old.isDirectory) {
      if (!live.exists())
        require(old.renameTo(live), s"swap recovery failed for $path")
      else rmTree(old)
    }
  }

  /** Run `write` against the sibling `.compacting` dir, then commit it
    * over `path` with the rename-aside swap. A stale `.compacting` from
    * a crashed run is cleared first; a failed `write` leaves the live
    * dir untouched.
    */
  def rewrite(path: String)(write: String => Unit): Unit = {
    import graft.queries.Scratch.rmTree
    recover(path)
    val tmp = path + ".compacting"
    val old = path + ".old"
    rmTree(new java.io.File(tmp)) // stale rewrite from a crashed run
    write(tmp)
    require(new java.io.File(path).renameTo(new java.io.File(old)),
      s"rewrite aside-rename failed for $path")
    require(new java.io.File(tmp).renameTo(new java.io.File(path)),
      s"rewrite swap failed for $path")
    rmTree(new java.io.File(old))
  }
}
