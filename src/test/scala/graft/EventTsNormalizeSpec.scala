package graft

import org.apache.spark.sql.functions._

/** Pins the events.ts ingestion convention (VERDICT r9 #2): whatever
  * physical type the testdata generator writes — epoch-nanos LONG (parquet
  * TIMESTAMP(NANOS) under nanosAsLong), TIMESTAMP_NTZ (parquet
  * TIMESTAMP(MICROS) isAdjustedToUTC=false), or TIMESTAMP_LTZ
  * (isAdjustedToUTC=true) — [[Tables.normalizeEventTs]] must hand the
  * engine identical LONG epoch-nanos rows. A silent testdata flip then
  * fails THIS named spec instead of zeroing 29 oracles at analysis time.
  *
  * Each variant round-trips through a real parquet file so the assertion
  * covers the physical parquet type mapping, not just the in-memory cast.
  */
class EventTsNormalizeSpec extends SparkSpec {

  private val micros = Seq(0L, 1L, 1723575000123456L, 4102444800000000L)

  private def roundTrip(dir: String): Seq[(Long, Int)] =
    Tables.normalizeEventTs(spark.read.parquet(dir))
      .select(col("ts"), col("id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .toSeq
      .sortBy(_._2)

  test("long-nanos, NTZ-micros and LTZ-micros parquet normalize identically") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("tsnorm").toString
    val expected = micros.zipWithIndex.map { case (u, i) => (u * 1000L, i) }

    // 1) the nanosAsLong generation: ts arrives as LONG epoch-nanos
    micros.zipWithIndex.map { case (u, i) => (u * 1000L, i) }
      .toDF("ts", "id").write.parquet(s"$base/long")

    // 2) the timestamp[us] isAdjustedToUTC=false generation → TIMESTAMP_NTZ
    micros.zipWithIndex.toDF("u", "id")
      .select(timestamp_micros(col("u")).cast("timestamp_ntz").as("ts"),
        col("id"))
      .write.parquet(s"$base/ntz")

    // 3) instant-semantics timestamp[us] → TIMESTAMP (LTZ)
    micros.zipWithIndex.toDF("u", "id")
      .select(timestamp_micros(col("u")).as("ts"), col("id"))
      .write.parquet(s"$base/ltz")

    assert(roundTrip(s"$base/long") == expected, "long-nanos passthrough")
    assert(roundTrip(s"$base/ntz") == expected, "TIMESTAMP_NTZ generation")
    assert(roundTrip(s"$base/ltz") == expected, "TIMESTAMP_LTZ generation")
  }

  test("an unknown ts physical type fails loudly with a named message") {
    import spark.implicits._
    val weird = Seq(("2026-08-13", 1)).toDF("ts", "id")
    val e = intercept[IllegalArgumentException] {
      Tables.normalizeEventTs(weird)
    }
    assert(e.getMessage.contains("unsupported physical type string"))
  }

  test("normalized sf0.001 events.ts is LONG nanos regardless of generation") {
    val df = Tables.events(spark, sf0001)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    // sanity: values are epoch nanos (i.e. a plausible 2020s instant when
    // divided down to seconds), not micros or millis mis-scaled
    val s = df.select(expr("ts div 1000000000")).head().getLong(0)
    assert(s > 1_500_000_000L && s < 4_200_000_000L,
      s"ts=$s sec not in plausible epoch-seconds range — wrong scale?")
  }
}
