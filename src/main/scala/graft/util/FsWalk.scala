package graft.util

import java.io.File

/** The one recursive file walk the on-disk witnesses share (index
  * bytes-shrunk comparisons, RocksDB checkpoint-layout checks) — three
  * private copies had already drifted once; a shared helper keeps null
  * `listFiles()` handling in one place. */
object FsWalk {

  /** Every regular file under `p` (empty if `p` does not exist). */
  def files(p: String): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory)
        Option(f.listFiles()).fold(Seq.empty[File])(_.toSeq.flatMap(walk))
      else Seq(f)
    val root = new File(p)
    if (root.exists()) walk(root) else Seq.empty
  }

  /** Total bytes of parquet data files under `p` — the numerator and
    * denominator of every index bytes-shrunk witness. */
  def parquetBytes(p: String): Long =
    files(p).filter(_.getName.endsWith(".parquet")).map(_.length()).sum

  /** Number of parquet data files under `p` — the small-file-residue
    * measure the compaction witnesses compare. */
  def parquetFileCount(p: String): Long =
    files(p).count(_.getName.endsWith(".parquet")).toLong
}
