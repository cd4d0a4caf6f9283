package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Chunked ingest of HUGE single CityGML documents (SURVEY.md O-2 at scale).
  *
  * `GmlXml.ingest` takes one XML string per row — fine for per-tile files,
  * but a multi-GB city-wide export (one document) would hit the 2 GB JVM
  * string ceiling and parse on a single task. This path removes both limits:
  * the driver lists files (metadata only) and fabricates (file, byte-range)
  * splits; each task seeks to its range and STREAMS it, scanning for
  * `<bldg:Building …>…</bldg:Building>` spans — a split starts at the first
  * building that OPENS at/after its range start and reads past its range end
  * only to finish the building it already started (the standard
  * record-boundary protocol of Hadoop text splits, re-expressed for XML).
  * Memory per task is O(read buffer + one building), never O(file).
  *
  * Each extracted span is wrapped in the document's own root envelope (the
  * root open tag with its xmlns declarations, read from the file head) and
  * handed to the normal StAX parser, so version sniffing, class dispatch,
  * ring extraction, and attribute extraction are byte-for-byte the same code
  * path as whole-document ingest. Building ordinals become the building's
  * absolute byte offset — monotone in document order, which is all the OBJ
  * emission-order contract needs.
  */
object ChunkedGml {

  /** Marker bytes for `<tag` / `</tag` with a boundary check so
    * `<bldg:Building` never matches `<bldg:BuildingPart`.
    */
  private def isBoundary(b: Int): Boolean =
    b == ' ' || b == '>' || b == '/' || b == '\t' || b == '\n' || b == '\r'

  /** Extract the root element's open tag (with all xmlns declarations) and
    * name from the head bytes of a document. Never throws: returns a
    * namespace-less fallback envelope when the head is garbage.
    */
  private[sources] def rootEnvelope(head: Array[Byte]): (String, String) = {
    val s = new String(head, java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i >= 0 && i < s.length) {
      i = s.indexOf('<', i)
      if (i >= 0) {
        val c = if (i + 1 < s.length) s.charAt(i + 1) else ' '
        if (c.isLetter || c == '_') {
          val close = s.indexOf('>', i)
          if (close > 0) {
            val open = s.substring(i, close + 1)
            val name = open.drop(1).takeWhile(ch => !ch.isWhitespace && ch != '>' && ch != '/')
            return (open, name)
          } else return ("<CityModel>", "CityModel")
        } else i += 1
      }
    }
    ("<CityModel>", "CityModel")
  }

  /** Stream one split of one file: emit (absoluteByteOffset, fragmentXml)
    * for every building whose open tag starts in [start, end); the last one
    * may be completed by reading past `end`. Bounded memory: a fixed read
    * buffer plus the bytes of the building currently being captured.
    */
  private[sources] def scanSplit(in: java.io.InputStream, fileStart: Long,
                                 end: Long, tag: String,
                                 envelope: (String, String),
                                 bufSize: Int = 1 << 20): Iterator[(Long, String)] = {
    val openPat = ("<" + tag).getBytes("UTF-8")
    val closePat = ("</" + tag).getBytes("UTF-8")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val buf = new Array[Byte](bufSize)
    var carry = Array.empty[Byte]     // tail bytes re-scanned across blocks
    var carryOffset = fileStart       // absolute offset of carry(0)
    var capturing = false
    var depth = 0
    var captureStart = 0L
    var body: ByteArrayOutputStream = null
    var pendingClose = false          // saw closePat, waiting for its '>'
    var eof = false
    var stop = false

    def matchesAt(a: Array[Byte], i: Int, pat: Array[Byte], limit: Int): Int = {
      // 1 = match, 0 = no match, -1 = need more bytes
      if (i + pat.length + 1 > limit) {
        var j = 0
        var ok = true
        while (ok && j < pat.length && i + j < limit) {
          if (a(i + j) != pat(j)) ok = false
          j += 1
        }
        if (ok) -1 else 0
      } else {
        var j = 0
        while (j < pat.length) {
          if (a(i + j) != pat(j)) return 0
          j += 1
        }
        if (isBoundary(a(i + pat.length) & 0xFF)) 1 else 0
      }
    }

    while (!stop && (!eof || carry.nonEmpty)) {
      // window = carry ++ next block
      var n = 0
      if (!eof) {
        n = in.read(buf)
        if (n < 0) { n = 0; eof = true }
      }
      val win = new Array[Byte](carry.length + n)
      System.arraycopy(carry, 0, win, 0, carry.length)
      if (n > 0) System.arraycopy(buf, 0, win, carry.length, n)
      val winOffset = carryOffset
      val limit = win.length
      var i = 0
      var consumed = limit // how far we can safely discard (default: all)
      var done = false
      while (!done && i < limit) {
        if (!capturing) {
          if (win(i) == '<') {
            matchesAt(win, i, openPat, limit) match {
              case 1 =>
                val abs = winOffset + i
                if (abs >= end) { stop = true; done = true }
                else {
                  capturing = true
                  depth = 1
                  captureStart = abs
                  body = new ByteArrayOutputStream(1 << 16)
                  body.write(openPat)
                  i += openPat.length
                }
              case -1 if !eof => consumed = i; done = true // re-scan next block
              case _ => i += 1
            }
          } else i += 1
        } else {
          // capturing: copy bytes while watching for nested opens / closes
          if (win(i) == '<') {
            matchesAt(win, i, openPat, limit) match {
              case 1 =>
                depth += 1
                body.write(win, i, openPat.length); i += openPat.length
              case -1 if !eof => consumed = i; done = true
              case _ =>
                matchesAt(win, i, closePat, limit) match {
                  case 1 =>
                    depth -= 1
                    body.write(win, i, closePat.length); i += closePat.length
                    if (depth == 0) pendingClose = true
                  case -1 if !eof => consumed = i; done = true
                  case _ => body.write(win(i).toInt); i += 1
                }
            }
          } else {
            body.write(win(i).toInt)
            if (pendingClose && win(i) == '>') {
              // end of </tag …> — emit the completed fragment
              val frag = new String(body.toByteArray,
                java.nio.charset.StandardCharsets.UTF_8)
              out += ((captureStart,
                envelope._1 + frag + s"</${envelope._2}>"))
              capturing = false
              pendingClose = false
              body = null
              // whether anything later can still open before `end` is
              // rechecked by the normal loop (the `abs >= end` guard)
            }
            i += 1
          }
        }
      }
      if (stop) { carry = Array.empty }
      else if (done && consumed < limit) {
        carry = java.util.Arrays.copyOfRange(win, consumed, limit)
        carryOffset = winOffset + consumed
      } else {
        carry = Array.empty
        carryOffset = winOffset + limit
      }
      // safety: if we are past `end` and not capturing, stop scanning
      if (!capturing && carryOffset >= end && carry.isEmpty) stop = true
      if (eof && capturing && carry.isEmpty) {
        // truncated document: salvage what was captured (never-fail)
        val frag = new String(body.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8)
        out += ((captureStart, envelope._1 + frag + s"</${envelope._2}>"))
        capturing = false
      }
    }
    out.iterator
  }

  /** Distributed chunked ingest: every `.gml` file under `pathOrGlob` is cut
    * into `chunkBytes` byte-range splits, one task each. Returns the same
    * (surfaces, rejects) pair as [[GmlXml.ingest]]; `building_ord` is the
    * building's absolute byte offset in its file (document order).
    */
  def ingestFiles(spark: SparkSession, pathOrGlob: String,
                  chunkBytes: Long = 64L << 20,
                  buildingTag: String = "bldg:Building"): (DataFrame, DataFrame) = {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    require(chunkBytes >= (1L << 16), "chunkBytes must be at least 64 KiB")
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(pathOrGlob)
    val fs = p.getFileSystem(conf)
    val stats = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      .flatMap(s => if (s.isDirectory) fs.listStatus(s.getPath).toSeq else Seq(s))
      .filter(s => s.isFile && s.getLen > 0)
    val splits = stats.flatMap { s =>
      val len = s.getLen
      (0L until len by chunkBytes).map(st =>
        (s.getPath.toString, st, math.min(st + chunkBytes, len)))
    }
    val nPart = math.max(1, splits.size)
    // ship the driver's Hadoop conf — a bare new Configuration() in the
    // task loses every spark.hadoop.* setting (credentials, fs overrides)
    val confMap = graft.HadoopConfs.pack(conf)
    val frags = spark.createDataset(splits).repartition(nPart)
      .mapPartitions { it =>
        val hconf = graft.HadoopConfs.unpack(confMap)
        it.flatMap { case (pathStr, start, end) =>
          val path = new Path(pathStr)
          val tfs = path.getFileSystem(hconf)
          // envelope from the file head (tiny read, any split can do it)
          val headIn = tfs.open(path)
          val head = new Array[Byte](1 << 16)
          var got = 0
          var r = 0
          while (r >= 0 && got < head.length) {
            r = headIn.read(head, got, head.length - got)
            if (r > 0) got += r
          }
          headIn.close()
          val env = rootEnvelope(java.util.Arrays.copyOf(head, got))
          val in = tfs.open(path)
          in.seek(start)
          val fileName = path.getName
          val res = scanSplit(in, start, end, buildingTag, env).map {
            case (off, xml) => (s"$fileName#$off", off, xml)
          }.toVector
          in.close()
          res
        }
      }
    val raw = frags.flatMap { case (docId, off, xml) =>
      GmlXml.parseDocument(xml, docId).map(rp => rp.copy(building_seq = off))
    }.toDF()
    val numeric = "map_filter(transform_values(%s, (k, v) -> try_cast(v AS double)), (k, v) -> v IS NOT NULL)"
    val (ok, rejects) = GmlIngest.route(raw
      .withColumnRenamed("building_seq", "building_ord")
      .withColumnRenamed("poly_seq", "poly_ord"))
    (ok.withColumn("attrs", org.apache.spark.sql.functions.expr(numeric.format("attrs")))
      .withColumn("battrs", org.apache.spark.sql.functions.expr(numeric.format("battrs"))),
      rejects)
  }
}
