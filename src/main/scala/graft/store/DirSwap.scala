package graft.store

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Atomic directory replace shared by the index stores: write to a tmp dir
  * OUTSIDE the target (a tmp INSIDE a partitioned table would be parsed as a
  * partition value), rename the old target aside, rename tmp into place,
  * drop the old — every rename checked, the original restored on failure.
  * Same discipline as ChunkStore.swapDir (which swaps a DataFrame write). */
private[store] object DirSwap {

  /** `base` anchors the tmp/old siblings (the store root); `write` receives
    * the tmp path and must produce the complete new directory there. */
  def swapInto(fs: FileSystem, base: String, target: String)
              (write: String => Unit): Unit = {
    val nano = System.nanoTime()
    val tmp = s"$base-swap-$nano"
    val old = s"$base-old-$nano"
    write(tmp)
    val tp = new HPath(target)
    val parent = tp.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
    if (fs.exists(tp) && !fs.rename(tp, new HPath(old)))
      throw new java.io.IOException(s"swap failed: could not move $target aside")
    if (!fs.rename(new HPath(tmp), tp)) {
      if (fs.exists(new HPath(old))) fs.rename(new HPath(old), tp)
      throw new java.io.IOException(s"swap failed: could not move $tmp into place")
    }
    if (fs.exists(new HPath(old))) fs.delete(new HPath(old), true)
  }
}
