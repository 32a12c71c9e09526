package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, "/root/testdata/sf0.001")
    t.lineitem.createOrReplaceTempView("lineitem")
    def tryQ(tag: String, q: String): Unit =
      try println(s"[probe] $tag OK rows=" + spark.sql(q).count())
      catch { case e: Throwable => println(s"[probe] $tag FAIL: " + e.getMessage.take(120)) }
    tryQ("group_by_all", "SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem GROUP BY ALL")
    tryQ("order_by_all", "SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem GROUP BY ALL ORDER BY ALL")
    tryQ("select_except", "SELECT * EXCEPT (l_tax, l_discount) FROM lineitem LIMIT 5")
    spark.stop()
  }
}
