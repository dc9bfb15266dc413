package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables

/** Entity resolution / record linkage — the pipeline that precedes every
  * dedup cascade when records have FIELDS rather than one text body:
  * derive candidate pairs by blocking, score them field-by-field
  * (Fellegi–Sunter agreement weights), and threshold into links.
  *
  * The dirty registry is DERIVED deterministically from `customer` with
  * md5-seeded perturbations (one-character name deletion for every
  * record; balance drift for the `custkey % 15` "heavy" cohort), so
  * DuckDB rebuilds the identical registry and the whole pipeline —
  * perturbation, blocking, scoring, threshold — oracles exactly, the
  * ml04 frozen-inputs discipline without needing committed fixtures.
  *
  * Scale design: candidate generation is an equi JOIN on the block key
  * (nationkey, mktsegment) — never an all-pairs comparison. Pair count
  * is Σ_blocks |A_b|·|B_b| (≈ |A|·|B| / #blocks under uniform keys;
  * `EntityResolutionSpec` pins the measured bound), and the expensive
  * comparator (banded edit distance, [[graft.functions.EditDistance]])
  * runs only inside blocks. Blocked fields carry no score weight — they
  * are equal by construction (the Fellegi–Sunter rule); the weights ride
  * on acctbal cents (+24) and the name-edit gradient (12 − 4·min(ed,3)),
  * so the 28 threshold separates true links (32) from best wrong-pair
  * scores (≤ 4 + impossible-24) with a wide margin.
  */
object EntityResolution {

  /** md5-derived deletion seed, per engine (same hex, same value). */
  private val HSpark = "CAST(conv(substr(md5(c_name), 1, 8), 16, 10) AS BIGINT)"
  private val HDuck =
    "CAST(concat('0x', substr(md5(c_name), 1, 8)) AS BIGINT)"

  /** Shared perturbation fragments (identical text in both engines —
    * the zero-drift convention): one-char deletion at the seeded
    * position, heavy-cohort balance drift. */
  private val PosSql = "1 + (h % length(c_name))"
  private val NameDelSql =
    "concat(substr(c_name, 1, pos - 1), substr(c_name, pos + 1))"
  private val AcctSql =
    "CASE WHEN c_custkey % 15 = 0 THEN c_acctbal + 17.29 ELSE c_acctbal END"
  private val ScoreSql =
    """CASE WHEN round(acct_b * 100) = round(c_acctbal * 100)
      |     THEN 24 ELSE 0 END
      |  + greatest(0, 12 - 4 * ed""".stripMargin + ")"

  /** The dirty registry (Spark side): every third customer, re-keyed,
    * name-deleted, heavy cohort balance-drifted. */
  private[graft] def registry(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter("c_custkey % 3 = 0")
      .selectExpr("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment", s"$HSpark AS h")
      .selectExpr("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment", s"$PosSql AS pos")
      .selectExpr("c_custkey + 10000000 AS b_id",
        s"$NameDelSql AS name_b", s"$AcctSql AS acct_b",
        "c_nationkey AS nat_b", "c_mktsegment AS seg_b")

  /** er01's scored links (b_id, a_custkey, score ≥ 28) — shared with
    * er02's consolidation pass. */
  private[graft] def links(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val cust = Tables.customer(s, d)
    registry(s, d)
      .join(cust, col("nat_b") === col("c_nationkey") &&
        col("seg_b") === col("c_mktsegment"))
      .selectExpr("b_id", "c_custkey", "acct_b", "c_acctbal",
        // k=3 returns min(lev, 4); least(..., 3) = the oracle's
        // least(levenshtein, 3), by the d17 bounded-distance law
        "least(bounded_edit_distance(name_b, c_name, 3), 3) AS ed")
      .selectExpr("b_id", "c_custkey AS a_custkey", s"$ScoreSql AS score")
      .filter(col("score") >= 28)
      .selectExpr("b_id", "a_custkey", "CAST(score AS BIGINT) AS score")
  }

  /** Production-blocked links — THRESHOLD-AWARE blocking (the d05→d09
    * validation-vs-production pattern applied to linkage): the 28
    * threshold is unreachable without the +24 acctbal agreement (the
    * name gradient maxes at 12), so exact cents can join the block key
    * with ZERO output change — candidate generation becomes an equi
    * join on (nation, segment, cents) whose blocks are near-singleton,
    * and the Σ_blocks |A_b|·|B_b| cost stops growing quadratically with
    * corpus scale (er01's validation-tier blocks grow 16× a side →
    * 256× comparisons; these stay ~linear). The standard multi-pass
    * blocking refinement of Winkler-style production linkage, with the
    * pass set chosen from the score structure instead of heuristics.
    * `EntityResolutionSpec` pins link-for-link equality with [[links]]. */
  private[graft] def linksProd(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val cust = Tables.customer(s, d)
    registry(s, d)
      .join(cust, col("nat_b") === col("c_nationkey") &&
        col("seg_b") === col("c_mktsegment") &&
        expr("round(acct_b * 100)") === expr("round(c_acctbal * 100)"))
      .selectExpr("b_id", "c_custkey", "acct_b", "c_acctbal",
        "least(bounded_edit_distance(name_b, c_name, 3), 3) AS ed")
      .selectExpr("b_id", "c_custkey AS a_custkey", s"$ScoreSql AS score")
      .filter(col("score") >= 28)
      .selectExpr("b_id", "a_custkey", "CAST(score AS BIGINT) AS score")
  }

  /** Shared oracle CTE text: the dirty registry + scored links. */
  private val LinksCtesSql =
    s"""b AS (
      |  SELECT c_custkey + 10000000 AS b_id, $NameDelSql AS name_b,
      |         $AcctSql AS acct_b, c_nationkey AS nat_b,
      |         c_mktsegment AS seg_b
      |  FROM (
      |    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      |           $PosSql AS pos
      |    FROM (
      |      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      |             $HDuck AS h
      |      FROM customer WHERE c_custkey % 3 = 0))),
      |scored AS (
      |  SELECT b_id, c_custkey AS a_custkey,
      |         $ScoreSql AS score
      |  FROM (
      |    SELECT b_id, c_custkey, acct_b, c_acctbal,
      |           least(levenshtein(name_b, c_name), 3) AS ed
      |    FROM b JOIN customer
      |      ON nat_b = c_nationkey AND seg_b = c_mktsegment)),
      |links AS (SELECT b_id, a_custkey, score FROM scored WHERE score >= 28)""".stripMargin

  // ---------------------------------------------------------------- er01
  val er01 = Q("er01_record_linkage",
    s"""WITH b AS (
      |  SELECT c_custkey + 10000000 AS b_id, $NameDelSql AS name_b,
      |         $AcctSql AS acct_b, c_nationkey AS nat_b,
      |         c_mktsegment AS seg_b
      |  FROM (
      |    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      |           $PosSql AS pos
      |    FROM (
      |      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      |             $HDuck AS h
      |      FROM customer WHERE c_custkey % 3 = 0))),
      |scored AS (
      |  SELECT b_id, c_custkey AS a_custkey,
      |         $ScoreSql AS score
      |  FROM (
      |    SELECT b_id, c_custkey, acct_b, c_acctbal,
      |           least(levenshtein(name_b, c_name), 3) AS ed
      |    FROM b JOIN customer
      |      ON nat_b = c_nationkey AND seg_b = c_mktsegment))
      |SELECT b_id, a_custkey, CAST(score AS BIGINT) AS score
      |FROM scored WHERE score >= 28
      |ORDER BY b_id, a_custkey""".stripMargin) { (s, d) =>
    links(s, d).orderBy("b_id", "a_custkey")
  }

  // ---------------------------------------------------------------- er02
  /** Golden-record consolidation — the survivorship pass that FOLLOWS
    * linkage: every master customer becomes one entity (absorbing its
    * linked registry records — name and balance survive from the master,
    * the authoritative source, since the registry copies are the
    * perturbed ones), and registry records that linked to nothing
    * surface as their own single-source entities instead of being
    * silently dropped — the completeness property a dedup-merge must
    * keep (an unmatched record is a NEW entity, not noise). Balances
    * are exact integer cents (the money discipline), provenance is
    * explicit (n_sources + origin), so the whole consolidated table
    * oracles cross-engine.
    *
    * Scale shape: link counts are one keyed agg off er01's blocked
    * equi-join links; the master enrichment is a left join against that
    * links-sized side (broadcast-eligible); orphan detection is a
    * left_anti on b_id. No all-pairs anything, nothing driver-side. */
  val er02 = Q("er02_golden_records",
    s"""WITH $LinksCtesSql,
      |lc AS (SELECT a_custkey, count(*) AS n_links FROM links GROUP BY a_custkey),
      |masters AS (
      |  SELECT c_custkey AS entity_id, c_name AS name,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS acct_cents,
      |    CAST(1 + coalesce(n_links, 0) AS BIGINT) AS n_sources,
      |    CASE WHEN n_links IS NOT NULL THEN 'merged'
      |         ELSE 'master_only' END AS origin
      |  FROM customer LEFT JOIN lc ON c_custkey = a_custkey),
      |orphans AS (
      |  SELECT b_id AS entity_id, name_b AS name,
      |    CAST(round(acct_b * 100) AS BIGINT) AS acct_cents,
      |    CAST(1 AS BIGINT) AS n_sources, 'registry_only' AS origin
      |  FROM b ANTI JOIN links USING (b_id))
      |SELECT * FROM masters
      |UNION ALL
      |SELECT * FROM orphans
      |ORDER BY entity_id""".stripMargin) { (s, d) =>
    // the production-blocked candidate pass — output-identical to the
    // er01 validation tier (spec-pinned), near-linear at corpus scale
    val lk = linksProd(s, d)
    val lc = lk.groupBy("a_custkey").agg(count(lit(1)).as("n_links"))
    val masters = Tables.customer(s, d)
      .join(broadcast(lc), col("c_custkey") === col("a_custkey"), "left")
      .select(col("c_custkey").as("entity_id"), col("c_name").as("name"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("acct_cents"),
        (lit(1L) + coalesce(col("n_links"), lit(0L))).cast("long")
          .as("n_sources"),
        when(col("n_links").isNotNull, "merged").otherwise("master_only")
          .as("origin"))
    val orphans = registry(s, d)
      .join(lk.select("b_id"), Seq("b_id"), "left_anti")
      .select(col("b_id").as("entity_id"), col("name_b").as("name"),
        expr("CAST(round(acct_b * 100) AS BIGINT)").as("acct_cents"),
        lit(1L).as("n_sources"), lit("registry_only").as("origin"))
    masters.unionByName(orphans).orderBy("entity_id")
  }

  def all: Seq[Q] = Seq(er01, er02)
}
