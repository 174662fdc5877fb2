package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Root-granularity atomic-replace protocol for stored trees — ONE
  * definition shared by the deletion-vector store
  * ([[DocumentSources.softDelete]]/readVisible) and the ANN index
  * rebuild ([[graft.ops.SimilarityOps.executeRebuild]]):
  *
  *   write `$path-staging` → park live as `$path-old` → rename staging
  *   in → drop parked
  *
  * with a recovery sweep at every entry point so a crash between any
  * two steps heals on the NEXT touch (parked-without-live restores;
  * parked-beside-live drops the parked copy; a stale staging tree is
  * swept only by WRITER entries — a reader deleting `-staging` would
  * destroy a concurrent writer's in-flight work). The table-level
  * single-writer contract still applies to the renames themselves: two
  * concurrent writers, or a writer racing a reader's park-restore, are
  * out of scope (callers serialize writes).
  */
private[graft] object StoreSwap {

  private def mustFs(who: String)(ok: Boolean, what: String): Unit =
    if (!ok) throw new java.io.IOException(
      s"$who: filesystem step failed (returned false): $what")

  /** The staging sibling a writer fills before [[swapIn]]. */
  def stagingPath(path: String): String = s"$path-staging"

  /** Recovery sweep: heal a crashed swap, optionally sweep stale
    * staging (writers only — see class doc).
    */
  def recover(fs: FileSystem, path: String, who: String,
              sweepStaging: Boolean = true): Unit = {
    val must = mustFs(who) _
    val live = new Path(path)
    val parked = new Path(s"$path-old")
    val staging = new Path(stagingPath(path))
    if (fs.exists(parked)) {
      if (!fs.exists(live)) must(fs.rename(parked, live), s"restore $parked")
      else must(fs.delete(parked, true), s"drop parked $parked")
    }
    if (sweepStaging && fs.exists(staging))
      must(fs.delete(staging, true), s"drop stale $staging")
  }

  /** Swap the (complete) staging tree in as the live root. */
  def swapIn(fs: FileSystem, path: String, who: String): Unit = {
    val must = mustFs(who) _
    val live = new Path(path)
    val parked = new Path(s"$path-old")
    val staging = new Path(stagingPath(path))
    must(fs.exists(staging), s"staging tree missing: $staging")
    if (fs.exists(live)) must(fs.rename(live, parked), s"park $live")
    must(fs.rename(staging, live), s"swap in $staging")
    if (fs.exists(parked)) must(fs.delete(parked, true), s"drop $parked")
  }
}
