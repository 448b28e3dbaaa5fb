package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("stub decode is deterministic and schema-stable across partitions") {
    val a = Multimodal.featuresQuery(spark, sf0001).orderBy("id").collect()
    val b = Multimodal.featuresQuery(spark, sf0001).repartition(7)
      .orderBy("id").collect()
    assert(a.length == b.length && a.length > 0)
    // same rows regardless of partitioning (decoder is partition-scoped
    // but content-deterministic)
    assert(a.map(_.getLong(0)).sameElements(b.sortBy(_.getLong(0)).map(_.getLong(0))))
    val fa = Multimodal.featuresQuery(spark, sf0001)
    assert(fa.schema.fieldNames.toSeq ==
      Seq("id", "modality", "byteLength", "width", "height", "nFrames",
        "contentHash", "embedding"))
  }

  test("byte length survives the decode (payload integrity)") {
    val f = Multimodal.featuresQuery(spark, sf0001)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id").as("id"), length(col("text")).cast("long").as("n"))
    val joined = f.join(docs, "id")
    assert(joined.filter(col("byteLength") =!= col("n")).count() == 0)
  }

  test("embedding stub is 8-dim and bounded") {
    // typed surface: real array
    import spark.implicits._
    val typed = Multimodal.decodeAll(
      Multimodal.payloadsFromDocuments(spark, sf0001)).toDF()
    assert(typed.filter(size(col("embedding")) =!= 8).count() == 0)
    assert(typed.filter(exists(col("embedding"),
      x => abs(x) > 0.5001)).count() == 0)
    // DataFrame surface: CSV string (scalar-only for the rows checker)
    val f = Multimodal.featuresQuery(spark, sf0001)
    assert(f.schema("embedding").dataType.typeName == "string")
    assert(f.filter(size(split(col("embedding"), ",")) =!= 8).count() == 0)
  }
}
