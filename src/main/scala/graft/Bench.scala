package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-wh").toString)
      .config("javax.jdo.option.ConnectionURL",
        "jdbc:derby:;databaseName=" + java.nio.file.Files
          .createTempDirectory("graft-ms").toString + "/metastore_db;create=true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up (untimed): touch every table once so footer parsing, codegen
    // JIT and the FS cache don't all land on whichever query runs first.
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      try graft.model.Tables.table(spark, sfDir, t).count()
      catch { case _: Throwable => }
    }
    try graft.model.Tables.events(spark, sfDir).count()
    catch { case _: Throwable => }
    // ... and exercise the execution machinery once (shuffle + AQE replan
    // + window + HLL sketch + codegen paths): ~2.5 s of one-time init was
    // otherwise billed to whichever query happened to run first.
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val a = spark.range(10000).toDF("x").withColumn("g", col("x") % 7)
      val b = spark.range(7).toDF("g2")
      a.groupBy("g")
        .agg(count(lit(1)).as("n"), approx_count_distinct(col("x"), 0.02).as("d"))
        .join(b, col("g") === col("g2"))
        .withColumn("r", row_number().over(
          Window.partitionBy("g").orderBy("n")))
        .queryExecution.toRdd.count()
    } catch { case _: Throwable => }
    // Time via queryExecution.toRdd.count(): a bare df.count() lets
    // Catalyst prune every projection (map-heavy queries would be timed
    // without computing their output columns); toRdd materializes each
    // result row in full, so the timed work is the real work.
    val errors = scala.collection.mutable.Buffer[String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case e: Throwable =>
        errors += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // a failed query must be visible in the artifact, not silently timed
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
