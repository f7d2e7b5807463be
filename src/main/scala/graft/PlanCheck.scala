package graft
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    println("=== q09 plan ===")
    SparkEntry.queries("q09_point_in_time")(spark, dir).explain("formatted")
    println("=== q10 plan ===")
    SparkEntry.queries("q10_history_limit")(spark, dir).explain("formatted")
    spark.stop()
  }
}
