package graft

/** Single source of truth for the repo-committed fixture paths.
  *
  * Derived from the process working directory rather than hardcoded
  * absolute paths (r05 ADVICE: `/root/repo/...` constants, duplicated
  * between Ingest and FixtureGen, silently broke in05/in06 and their
  * oracles on any other checkout). Every entry point that touches
  * fixtures — sbt compile/test, `tools/check.py` (which subprocesses
  * with `cwd=/root/repo`), FixtureGen — runs from the repo root, so the
  * cwd-anchored absolute path is stable AND checkout-relocatable. A JVM
  * launched from anywhere else (r06 ADVICE) sets `GRAFT_FIXTURES_DIR`
  * (or `-Dgraft.fixtures.dir=`) instead; either way the resolved dir is
  * checked eagerly so a bad launch dir fails at first touch with one
  * clear message, not as 20 per-query file-not-found oracles. The path
  * is absolutised eagerly because it is embedded verbatim in oracle SQL
  * strings that DuckDB later executes from its own process.
  */
object Fixtures {
  val dir: String = {
    val d = sys.env.get("GRAFT_FIXTURES_DIR")
      .orElse(sys.props.get("graft.fixtures.dir"))
      .getOrElse("fixtures")
    val f = new java.io.File(d).getAbsoluteFile
    require(f.isDirectory,
      s"fixtures dir not found: $f — run from the repo root or set GRAFT_FIXTURES_DIR")
    f.getPath
  }

  def path(rel: String): String = s"$dir/$rel"
}
