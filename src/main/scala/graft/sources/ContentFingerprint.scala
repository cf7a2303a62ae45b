package graft.sources

/** Cheap content fingerprint of a parquet table (file names + sizes +
  * mtimes — metadata only, no data read). Used as the staleness key for
  * every per-process cache that memoizes derived state for a dataset path
  * (index builds, searchers, persisted cell assignments): if the data at
  * the path is regenerated — even in-process — the fingerprint changes and
  * the cache entry is rebuilt instead of silently serving stale results. */
object ContentFingerprint {

  def of(parquetPath: String): String = {
    val src = new java.io.File(parquetPath)
    val files =
      if (src.isDirectory) src.listFiles().filter(_.isFile).sortBy(_.getName)
      else Array(src)
    val h = java.security.MessageDigest.getInstance("MD5")
    files.foreach { f =>
      h.update(s"${f.getName}:${f.length}:${f.lastModified}".getBytes("UTF-8"))
    }
    h.digest().map(b => f"$b%02x").mkString
  }
}
