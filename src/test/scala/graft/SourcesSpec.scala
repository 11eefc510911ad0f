package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV/JSON source round-trips (SURVEY.md §2.4-A 🔶 rows — unit-tested
  * rather than oracle-declared: the fixture layout is parquet-only). */
class SourcesSpec extends SparkSpec {

  private lazy val nation = Tables.nation(spark, sf)

  test("CSV round-trip with header + explicit schema preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toFile.getAbsolutePath
    nation.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.count() === 25)
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("CSV schema inference + custom delimiter/quote options") {
    val dir = java.nio.file.Files.createTempDirectory("csv2").toFile.getAbsolutePath
    nation.write.mode("overwrite")
      .option("header", "true").option("sep", "|").csv(dir)
    val back = spark.read
      .option("header", "true").option("sep", "|").option("inferSchema", "true").csv(dir)
    assert(back.schema("n_nationkey").dataType === IntegerType)
    assert(back.count() === 25)
  }

  test("JSON lines round-trip, including a nested struct column") {
    val dir = java.nio.file.Files.createTempDirectory("json").toFile.getAbsolutePath
    val enriched = nation.withColumn("geo",
      struct(col("n_regionkey").as("region"), lit("earth").as("planet")))
    enriched.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() === 25)
    assert(back.select(col("geo.planet")).distinct().head().getString(0) === "earth")
    val total = back.agg(sum(col("geo.region"))).head().getLong(0)
    val expect = nation.agg(sum(col("n_regionkey"))).head().getLong(0)
    assert(total === expect)
  }

  test("in-memory range source") {
    assert(spark.range(1, 101).agg(sum("id")).head().getLong(0) === 5050)
  }

  test("ORC round-trip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toFile.getAbsolutePath
    nation.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === nation.schema)
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("text source round-trip (single string column, line per row)") {
    val dir = java.nio.file.Files.createTempDirectory("txt").toFile.getAbsolutePath
    nation.select(concat_ws("|", col("n_nationkey"), col("n_name")).as("value"))
      .write.mode("overwrite").text(dir)
    val back = spark.read.text(dir)
    assert(back.count() === 25)
    val parsed = back.select(split(col("value"), "\\|").getItem(1).as("n_name"))
    assert(parsed.exceptAll(nation.select("n_name")).isEmpty)
  }

  test("write modes: append doubles, ignore no-ops, overwrite resets") {
    val dir = java.nio.file.Files.createTempDirectory("modes").toFile.getAbsolutePath
    nation.write.mode("overwrite").parquet(dir)
    nation.write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() === 50)
    nation.write.mode("ignore").parquet(dir)
    assert(spark.read.parquet(dir).count() === 50)
    nation.write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).count() === 25)
  }
}
