package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class TypedAndMLSpec extends SparkSpec {
  import spark.implicits._

  test("TopKByScore equals window ranking on literal data") {
    val topk = new functions.TopKByScore(2)
    val data = Seq((1L, 10L, 5.0), (1L, 11L, 9.0), (1L, 12L, 9.0),
      (2L, 20L, 1.0))
    val out = data.toDF("g", "k", "s").as[(Long, Long, Double)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(topk.toColumn.name("topk"))
      .collect().toMap
    // score desc, key asc tiebreak: 11 before 12 (both 9.0)
    assert(out(1L) == Seq((9.0, 11L), (9.0, 12L)))
    assert(out(2L) == Seq((1.0, 20L)))
  }

  test("mllib classifier: schema contract, label domain, confidence bounds") {
    val out = ops.MLClassify.classifyWithModel(model.Tables.documents(spark, sf))
    assert(out.columns.toSet ==
      Set("doc_id", "category", "confidence", "teacher_category"))
    val rows = out.collect()
    val domain = ops.NewsPipeline.lexicon.map(_._1).toSet
    rows.foreach { r =>
      assert(domain.contains(r.getString(1)))
      val c = r.getDouble(2)
      assert(c > 0.0 && c <= 1.0)
    }
    // distillation should mostly agree with the teacher on training data
    val agree = rows.count(r => r.getString(1) == r.getString(3)).toDouble /
      rows.length
    assert(agree > 0.9, s"agreement $agree")
  }

  test("multimodal decode stub: pinned features, mapPartitions shape") {
    val f = Multimodal.decodeStub("abcd".getBytes("UTF-8"))
    assert(f.toSeq == Seq(97 / 255.0, 98 / 255.0, 99 / 255.0, 100 / 255.0))
    val media = Multimodal.mediaFrame(model.Tables.documents(spark, sf))
      .as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == 500)
    // md5 hex = 32 bytes of utf8
    assert(feats.filter(col("n_bytes") =!= 32).isEmpty)
  }
}
