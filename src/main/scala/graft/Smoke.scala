package graft

import graft.engine.Sessions

/** Dev smoke: replicates the driver's t1 check (entry rows > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4, "graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n SCHEMA=${df.schema.map(_.name).mkString(",")}")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
