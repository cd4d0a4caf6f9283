package graft

/** Ship the driver's Hadoop configuration into executor tasks.
  *
  * `new Configuration()` inside a task sees only the classpath defaults —
  * every `spark.hadoop.*` setting (object-store credentials, fs.defaultFS
  * overrides, custom schemes) is silently absent, so code that works on
  * file:// in local mode breaks on a real cluster FS. Spark's own
  * SerializableConfiguration is private[spark]; the public equivalent is a
  * plain Map snapshot taken on the driver and replayed per task.
  */
object HadoopConfs {

  /** Driver side: snapshot every entry of the session's Hadoop conf. */
  def pack(conf: org.apache.hadoop.conf.Configuration): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    val it = conf.iterator()
    while (it.hasNext) {
      val e = it.next()
      b += e.getKey -> e.getValue
    }
    b.result()
  }

  /** Task side: rebuild a Configuration from the shipped snapshot. */
  def unpack(entries: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Untrusted-id → safe path segment: gml:id flows into output file names
    * (`<prefix>_<building_id>_local_.gml`), so path separators, traversal
    * dots, and control characters must not survive (hostile-input
    * contract — the sibling of GmlSink.jesc for the filesystem).
    */
  def fileSafe(s: String): String = {
    val cleaned = s.map {
      case c if c.isLetterOrDigit || c == '-' || c == '_' => c
      case _ => '_' // incl. '.', '/', '\\': no ".." segments or separators
    }.mkString
    val base = if (cleaned.isEmpty) "_" else cleaned.take(200)
    // distinct raw ids must never map to one path (e.g. 'b.1' vs 'b_1', or
    // two ids sharing a 200-char prefix — the second write would silently
    // overwrite the first): whenever sanitization or truncation CHANGED the
    // id, disambiguate with a short stable hash of the raw id
    if (base == s) base
    else {
      val h = java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(s).toLong & 0xffffffffL)
      s"${base}_h$h"
    }
  }
}
