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
}
