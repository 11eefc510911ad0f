package graft

import org.apache.spark.sql.functions._

/** The two physical-layout levers that carry a 100 TB deployment
  * (SURVEY.md §4): partitioned writes with partition pruning, and
  * bucketed tables that co-locate join keys so the join plans with no
  * shuffle. Fixture-scale data, plan-level assertions.
  */
class BucketingSpec extends SparkSpec {

  test("partitionBy write + filter read prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("part").toFile.getAbsolutePath
    val o = Tables.orders(spark, sf).withColumn("o_year", year(col("o_orderdate")))
    o.write.mode("overwrite").partitionBy("o_year").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("o_year") === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan)
    // only the 1997 directory is read
    val files = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("o_year=1997")), files.mkString("\n"))
    // and the row set is exactly the filtered original
    assert(pruned.count() === o.filter(col("o_year") === 1997).count())
  }

  test("declared key q_part_pruned reads 1 of 12 month partitions (PartitionFilters in ITS plan)") {
    val df = queries.Layout.qPartPruned(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_month"), plan)
    assert(plan.contains("(o_month") && plan.contains("= 3)"), plan)
    val files = spark.read.parquet(queries.Layout.layoutDir(sf))
      .filter(col("o_month") === 3)
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("o_month=3")), files.mkString("\n"))
  }

  test("declared key q_bucket_join: co-located SMJ over bucket files, no join-key Exchange") {
    val df = queries.Layout.qBucketJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("SelectedBucketsCount"), plan)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle either side on the join key:\n$plan")
  }

  test("bucketed+sorted tables join with zero Exchange (co-located join)") {
    // default warehouse dir (./spark-warehouse, gitignored) — the
    // warehouse conf is static and can't move after session start.
    // The in-memory catalog forgets tables between JVMs but the
    // directories persist: clear both.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) {
        java.nio.file.Files.walk(d.toPath).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.lineitem(spark, sf)
      .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    // disable broadcast so the join would otherwise shuffle both sides
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = joined.queryExecution.executedPlan.toString
      val exchangesBeforeAgg = plan.split("HashAggregate").head
      assert(!exchangesBeforeAgg.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join must not shuffle the fact side:\n$plan")
      // co-located SMJ over bucket files
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("SelectedBucketsCount"), plan)
      // correctness unchanged vs unbucketed formulation
      val expect = queries.Joins.qJoinSmj(spark, sf).select("o_orderstatus", "n")
      assert(joined.exceptAll(expect).isEmpty && expect.exceptAll(joined).isEmpty)
    }
  }

  private def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
