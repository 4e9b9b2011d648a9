package graft.tools

/** Child-JVM helper for the cross-process maintenance-lock test: grab
  * the artifact's maintenance lock, signal acquisition via a marker
  * file, hold for the requested time. No Spark — starts in well under
  * a second, so the spec's timing bounds are comfortable.
  */
object LockHolder {
  def main(args: Array[String]): Unit = {
    val Array(dir, holdMs) = args
    graft.core.ArtifactStore.withMaintenanceLock(dir) {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "held"), "1")
      Thread.sleep(holdMs.toLong)
    }
  }
}
