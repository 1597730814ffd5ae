package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    e.printSchema()
    e.show(3, false)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    e.select(min("value"), max("value")).show()
    e.select(col("value").cast("string")).show(5, false)
    e.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).show(3, false)
    spark.stop()
  }
}
