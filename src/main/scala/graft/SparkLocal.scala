package graft

/** Scratch-space selection for Spark's shuffle/spill files.
 *
 * Shuffle-file creation on this container's virtio/ext4 root measured
 * 10–100 ms per `FileOutputStream.open` under load (sampled profiles show
 * `DiskBlockObjectWriter.open` dominating small queries), with large
 * run-to-run swings. Small-scale shuffles fit trivially in memory, so
 * point `spark.local.dir` at tmpfs when one is writable — on a production
 * cluster this setting comes from the cluster manager and this helper is
 * simply not consulted. */
object SparkLocal {
  lazy val dir: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft-spark")
      d.mkdirs()
      d.getAbsolutePath
    } else sys.props.getOrElse("java.io.tmpdir", "/tmp")
  }

  /** Mirror a small parquet directory into tmpfs and return the copy's
   * path, or the original when tmpfs is unavailable or the copy fails.
   *
   * The INPUT side of the same disk problem `dir` solves for shuffles:
   * this container's virtio disk takes sporadic multi-second D-state
   * stalls, and a benchmark reading even a 17 MB scale-factor directory
   * from it bills whole stalls to whichever query is scanning at the
   * time. Benchmarks copy their input here once, untimed, so timed runs
   * measure the engine. Refuses inputs that would not comfortably fit
   * (tmpfs is RAM): caller keeps the stalling-disk path beyond 2 GiB. */
  def stageInput(srcDir: String): String = {
    import java.nio.file._
    val src = Paths.get(srcDir)
    val shm = Paths.get("/dev/shm")
    if (!Files.isDirectory(src) || !Files.isWritable(shm)) return srcDir
    try {
      val files = {
        val s = Files.walk(src)
        try {
          val it = s.iterator()
          val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
          while (it.hasNext) { val p = it.next(); if (Files.isRegularFile(p)) buf += p }
          buf.toSeq
        } finally s.close()
      }
      val bytes = files.map(Files.size).sum
      if (bytes > (2L << 30)) return srcDir
      val dst = shm.resolve("graft-bench-input").resolve(src.getFileName.toString)
      files.foreach { f =>
        val out = dst.resolve(src.relativize(f).toString)
        Files.createDirectories(out.getParent)
        Files.copy(f, out, StandardCopyOption.REPLACE_EXISTING)
      }
      dst.toString
    } catch { case e: Throwable => System.err.println(s"[graft] stageInput: $e"); srcDir }
  }
}
