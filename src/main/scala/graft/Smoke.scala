package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: drives SparkEntry.entry exactly as the driver's t1
  * gate does (sf0.001, rows > 0) and prints the report row. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    df.printSchema()
    rows.foreach(println)
    println(s"[smoke] rows=${rows.length}")
    spark.stop()
  }
}
