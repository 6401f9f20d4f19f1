package graft

/** Bench/verify artifact output, shared by the JSON-emitting mains.
  *
  * The artifacts double as the machine-parse fallback when the driver's
  * log-tail misses the printed JSON line, so their location must be
  * predictable: `GRAFT_TARGET_DIR` when set, else `target/` under the
  * launch cwd — and the absolute path is always logged, so a run launched
  * from an unexpected directory is diagnosable instead of silently writing
  * somewhere nobody looks.
  */
object Artifacts {
  def write(name: String, content: String): java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_TARGET_DIR", "target"))
    java.nio.file.Files.createDirectories(dir)
    val out = dir.resolve(name).toAbsolutePath
    java.nio.file.Files.write(out,
      (content + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[artifact] wrote $out")
    out
  }
}
