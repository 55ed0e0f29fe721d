package graft.streaming

/** The one spelling of the replay-chunk write contract, shared by
  * every file-ingress harness (taxi CSV, docs/events/embeddings/media
  * JSONL): optional gzip, then a mod time stamped STRICTLY INCREASING
  * by chunk index. FileStreamSource orders files by modification
  * time; two chunks written in the same clock tick would tie and
  * could replay out of feed order (dropping a whole chunk as late
  * under a watermark) — centralizing the stamp here keeps that trap
  * fixed in exactly one place.
  */
object ReplayChunks {

  def write(
      dir: String,
      fileName: String,
      index: Int,
      payload: Array[Byte],
      gzip: Boolean): Unit = {
    val data =
      if (gzip) {
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(payload); gz.close()
        bos.toByteArray
      } else payload
    val p = java.nio.file.Files.write(
      java.nio.file.Paths.get(dir).resolve(fileName), data)
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L + index * 1000L))
  }

  /** JSONL-lines convenience: UTF-8 join + gz + stamp. */
  def writeJsonlGz(dir: String, fileName: String, index: Int, lines: Seq[String]): Unit =
    write(dir, fileName, index, lines.mkString("\n").getBytes("UTF-8"), gzip = true)
}
