package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      // same extension set as Verify/Bench so plans shown here match
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.explain("formatted")
    spark.stop()
  }
}
