package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

class JsonRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val digestSchema = new StructType()
    .add("content", StringType).add("category", StringType)

  test("to_json ∘ from_json = id on the digest schema (SURVEY §5.3)") {
    // deterministic pseudo-random digest contents incl. newlines, quotes,
    // unicode, empty strings — the shapes n05 actually produces
    val cases = Seq(
      ("- a\n- b\nDate: 2024-01-31", "arts"),
      ("quote\" and \\ backslash", "technology"),
      ("", "social"),
      ("unicode: é 中 🙂", "sports")) ++
      (1 to 40).map(i => (s"- line$i\n" * (i % 5 + 1), s"cat$i"))
    val df = cases.toDF("content", "category")
    val roundTripped = df
      .select(to_json(struct(col("content"), col("category"))).as("value"))
      .select(from_json(col("value"), digestSchema).as("d"))
      .select(col("d.content").as("content"), col("d.category").as("category"))
    assert(roundTripped.collect().map(r => (r.getString(0), r.getString(1)))
      .toSeq == cases)
  }

  test("digest consumer shape: lower(category) + field probe (ref §2.3)") {
    val value = """{"content":"- x\nDate: 2024-01-31","category":"Arts"}"""
    val out = Seq(value).toDF("value")
      .select(from_json(col("value"), digestSchema).as("d"))
      .select(lower(col("d.category")).as("category"), col("d.content").as("content"))
      .head()
    assert(out.getString(0) == "arts")
    assert(out.getString(1).startsWith("- x"))
  }
}
