package graft

/** Single source of truth for the repo-committed fixture paths.
  *
  * Derived from the process working directory rather than hardcoded
  * absolute paths (r05 ADVICE: `/root/repo/...` constants, duplicated
  * between Ingest and FixtureGen, silently broke in05/in06 and their
  * oracles on any other checkout). Every entry point that touches
  * fixtures — sbt compile/test, `tools/check.py` (which subprocesses
  * with `cwd=/root/repo`), FixtureGen — runs from the repo root, so the
  * cwd-anchored absolute path is stable AND checkout-relocatable. The
  * path is absolutised eagerly because it is embedded verbatim in oracle
  * SQL strings that DuckDB later executes from its own process.
  */
object Fixtures {
  val dir: String = new java.io.File("fixtures").getAbsolutePath

  def path(rel: String): String = s"$dir/$rel"
}
