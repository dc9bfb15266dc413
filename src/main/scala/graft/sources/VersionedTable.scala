package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal append-only versioned table — the snapshot/ledger core of
  * the table formats (Iceberg snapshots, Delta's transaction log),
  * small enough to reason about and shared by [[Ingest.in20]] and its
  * spec. Layout under `base/`:
  *
  *  - `data/c{N}/` — commit N's immutable parquet files (landed by ONE
  *    atomic directory rename from staging; never rewritten after);
  *  - `ledger/v{N}` — one line per live data file at version N (the
  *    previous version's list plus commit N's files). The atomic
  *    rename of this entry IS the commit point: a concurrent reader
  *    sees version N whole or not at all, and `AS OF v` is pure
  *    metadata — read exactly the files `v` lists.
  *
  * History costs O(Σ batches) bytes total: snapshots share data files,
  * nothing is copied to keep old versions readable, and the diff
  * between adjacent versions is answerable from the ledger alone.
  * (Reference scope note: the reference app overwrite-publishes its
  * batch outputs with no history — `news_summarization_batch.py`
  * keeps only the latest digest. This is the [EXT] metadata plane a
  * 100 TB curation pipeline needs for reproducible `AS OF` reads.) */
final class VersionedTable(s: SparkSession, base: String) {

  private def ledgerEntry(v: Int) =
    java.nio.file.Paths.get(s"$base/ledger/v$v")

  /** Live data files at version `v` (ledger order: commit order, then
    * lexicographic within a commit). */
  def files(v: Int): Seq[String] = {
    require(java.nio.file.Files.exists(ledgerEntry(v)),
      s"version $v does not exist in the ledger")
    java.nio.file.Files.readAllLines(ledgerEntry(v))
      .toArray(Array.empty[String]).toSeq
  }

  /** Highest committed version, 0 for an empty table. Listed from the
    * ledger directory, not probed from v1 upward — after a vacuum has
    * expired the leading versions, v1's absence must not hide a live
    * head. */
  def head: Int = {
    val d = new java.io.File(s"$base/ledger")
    Option(d.listFiles()).toSeq.flatten.map(_.getName)
      .filter(_.matches("v\\d+")).map(_.drop(1).toInt)
      .maxOption.getOrElse(0)
  }

  /** Stage `df`, gate it on `audit` (over the STAGED bytes — what a
    * reader would see), land the files atomically, and commit the new
    * ledger entry. Returns the new version. A batch that fails the
    * audit is refused with the staging retained for forensics, and
    * the table is untouched — in15's write-audit-publish contract.
    * With `replace = true` the new entry lists ONLY this commit's
    * files (a REWRITE commit — Delta `OPTIMIZE` / Iceberg rewrite:
    * the caller asserts the new files carry the table's content);
    * otherwise the entry appends to the previous version's list.
    * `carry` (only meaningful with `replace`) additionally retains
    * the named files from the previous version — the SCOPED rewrite
    * of Iceberg's rewrite-data-files: new snapshot = previous −
    * rewritten + new, so files a rewrite never touched stay shared
    * across the commit instead of being recopied. Must be a subset
    * of the previous version's file list. */
  def commit(df: DataFrame, audit: DataFrame => Boolean = _ => true,
      replace: Boolean = false, carry: Seq[String] = Nil): Int = {
    val v = head + 1
    // carry contracts are validated BEFORE any I/O: a refused commit
    // must leave no staging or landed bytes behind
    require(carry.isEmpty || (replace && v > 1),
      "carry is only meaningful on a replace commit over an existing version")
    require(v == 1 || carry.forall(files(v - 1).contains),
      "carry must name files from the previous version")
    val stage = s"$base/staging/c$v"
    df.write.parquet(stage)
    require(audit(s.read.parquet(stage)),
      s"commit $v failed the staging audit (staging retained at $stage)")
    val landed = s"$base/data/c$v"
    new java.io.File(landed).getParentFile.mkdirs()
    java.nio.file.Files.move(java.nio.file.Paths.get(stage),
      java.nio.file.Paths.get(landed),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val added = new java.io.File(landed).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted.toSeq
    val live =
      (if (replace || v == 1) carry else files(v - 1)) ++ added
    new java.io.File(s"$base/ledger").mkdirs()
    val tmp = java.nio.file.Paths.get(s"$base/ledger/.v$v.tmp")
    java.nio.file.Files.writeString(tmp, live.mkString("\n"))
    // the ledger rename IS the commit point: entry appears whole
    java.nio.file.Files.move(tmp, ledgerEntry(v),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Retention vacuum (Iceberg expire-snapshots + remove-orphans;
    * Delta VACUUM): expire every version below `retainFrom`, then
    * delete the data files no RETAINED version references. Ledger
    * entries go first — a crash mid-vacuum must never leave a
    * readable version pointing at deleted bytes; files shared with a
    * retained version (append-only lineage) survive untouched.
    * Returns (expired versions, deleted file paths). Time travel to
    * an expired version refuses loudly afterwards — that is the
    * retention CONTRACT, not a failure mode. */
  def vacuum(retainFrom: Int): (Seq[Int], Seq[String]) = {
    val h = head
    require(retainFrom >= 1 && retainFrom <= h,
      s"vacuum retainFrom $retainFrom outside the ledger (head $h)")
    val keep = (retainFrom to h)
      .filter(v => java.nio.file.Files.exists(ledgerEntry(v)))
      .flatMap(files).toSet
    val expired = (1 until retainFrom)
      .filter(v => java.nio.file.Files.exists(ledgerEntry(v)))
    val orphaned = expired.flatMap(files).distinct.filterNot(keep)
    expired.foreach(v => java.nio.file.Files.delete(ledgerEntry(v)))
    orphaned.foreach(p =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p)): Unit)
    (expired, orphaned)
  }

  /** Time-travel read: exactly the files version `v`'s entry lists. */
  def readAsOf(v: Int): DataFrame = s.read.parquet(files(v): _*)
}
