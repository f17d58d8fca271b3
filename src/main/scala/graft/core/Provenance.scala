package graft.core

/** Run provenance for emitted artifacts (bench_full.json, Verify
  * dumps): the git commit and wall-clock stamp tie an artifact to the
  * exact tree that produced it, so a stale artifact can't masquerade
  * as current evidence. Failure-safe: provenance must never fail a
  * run, so everything degrades to "unknown". */
object Provenance {
  lazy val commit: String =
    try {
      val p = new ProcessBuilder("git", "rev-parse", "--short", "HEAD")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes, "UTF-8").trim
      if (p.waitFor() == 0 && out.nonEmpty && !out.contains(" ")) out
      else "unknown"
    } catch { case _: Throwable => "unknown" }

  def stamp: String =
    java.time.format.DateTimeFormatter.ISO_INSTANT.format(
      java.time.Instant.now().truncatedTo(java.time.temporal.ChronoUnit.SECONDS))

  /** `"commit":"abc1234","ts":"2026-08-14T16:00:00Z"` — splice into a
    * hand-built JSON object. */
  def jsonFields: String = s""""commit":"$commit","ts":"$stamp""""
}
