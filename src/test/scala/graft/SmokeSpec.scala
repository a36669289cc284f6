package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

class SmokeSpec extends AnyFunSuite {
  test("events parquet (nanos timestamps) is readable") {
    val spark = TestSpark.spark
    val e = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
    e.printSchema()
    e.show(3, truncate = false)
    assert(e.count() == 1000)
  }
}
