package graft.ops

import org.apache.spark.sql.functions._

import graft.Q
import graft.model.Tables

/** The flagship composition: the corpus-cleaning job a training-data
  * pipeline actually runs at 100 TB, assembled from this engine's own
  * operators — nothing here is new logic, which is the point: the
  * operators compose as DataFrames, and Catalyst plans the whole as one
  * query.
  *
  * Stages (each individually oracled elsewhere):
  *  1. held-out split: drop the eval slice (`doc_id % 10 = 0`) — t07's
  *     benchmark stand-in;
  *  2. near-dup dedup: keep only cluster keepers from d08's connected
  *     components over the d02 edge set (at production scale the edges
  *     come from d03's LSH candidates + verification; the exact edge set
  *     keeps this oracle-checkable end to end);
  *  3. decontamination: anti-join t07's contaminated set — the corpus
  *     side never shuffles for this (broadcast eval shingles);
  *  4. language selection + quality gate (t02's score).
  *
  * The oracle composes the SAME shared CTE strings the stage oracles
  * use ([[Dedup.clustersSql]], [[TextAnalysis.contaminationSql]],
  * [[TextAnalysis.qualitySql]]) — one definition per stage, so the
  * composition cannot drift from its parts.
  */
object CleanCorpus {

  val QualityThreshold = 0.10

  val p01 = Q("p01_clean_corpus",
    s"""WITH RECURSIVE ${Dedup.shinglesSql},
       |${Dedup.clustersSql},
       |${TextAnalysis.contaminationSql},
       |${TextAnalysis.qualitySql}
       |SELECT d.doc_id, d.source, d.lang, q.quality
       |FROM documents d
       |JOIN clusters c ON c.doc_id = d.doc_id
       |JOIN quality q ON q.doc_id = d.doc_id
       |LEFT JOIN contaminated x ON x.doc_id = d.doc_id
       |WHERE d.doc_id % 10 <> 0
       |  AND c.cluster = d.doc_id
       |  AND x.doc_id IS NULL
       |  AND d.lang = 'en'
       |  AND q.quality >= $QualityThreshold
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val keepers = Dedup.d08.run(s, d)
      .filter(col("is_keeper")).select("doc_id")
    val contaminated = TextAnalysis.t07.run(s, d).select("doc_id")
    val quality = TextAnalysis.t02.run(s, d).select("doc_id", "quality")
    docs
      .filter(col("doc_id") % 10 =!= 0 && col("lang") === "en")
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(quality, "doc_id")
      .filter(col("quality") >= QualityThreshold)
      .select("doc_id", "source", "lang", "quality")
      .orderBy("doc_id")
  }

  def all: Seq[Q] = Seq(p01)
}
