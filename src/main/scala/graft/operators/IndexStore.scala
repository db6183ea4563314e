package graft.operators

import java.security.MessageDigest

/** Registry for persisted per-corpus artifacts — ANN indexes, verified
  * dedup pair sets — that are BUILT ONCE and probed by many queries (the
  * reference's own split: /root/reference/database.py:459 builds its
  * ivfflat index once, every query only probes it).
  *
  * Paths are content-addressed by corpus dir + artifact version, so two
  * corpora (or two artifact formats) never collide. An artifact is rebuilt
  * on first use per JVM — a stale on-disk artifact from an older engine
  * version must never silently serve probes. At production scale this
  * per-JVM set is replaced by a version manifest written next to the data
  * (two concurrent builders could otherwise race `mode("overwrite")` on
  * the same path; acceptable for this single-JVM rig).
  */
private[graft] object IndexStore {

  def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Scratch root for persisted artifacts; production points this at the
    * warehouse (env `SPARK_GRAFT_INDEX_DIR`).
    */
  def root: String =
    sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft-index")

  /** Content-addressed artifact path: `<root>/<kind>-<hash(corpus dir)>`. */
  def path(kind: String, dir: String): String =
    s"$root/$kind-${md5hex(dir).substring(0, 12)}"

  private val built = scala.collection.mutable.Set[String]()

  def ensureBuilt(path: String)(build: => Unit): Unit =
    built.synchronized {
      if (!built.contains(path)) { build; built += path }
    }
}
