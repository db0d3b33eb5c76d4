package graft.tools
import org.apache.spark.sql.functions._
object CcRounds {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val adj = graft.operators.GraphQueries.cachedAdjDeg(spark, "/root/testdata/sf0.1")
    def step(cur: org.apache.spark.sql.DataFrame) = {
      val nb = adj.join(cur.select(col("node").as("dst"), col("lbl").as("nl")), "dst")
        .groupBy("src").agg(min("nl").as("nl")).select(col("src").as("node"), col("nl"))
      val gp = cur.select(col("node").as("g_node"), col("lbl").as("gl"))
      cur.join(nb, Seq("node"), "left").join(gp, col("lbl") === col("g_node"))
        .select(col("node"), least(col("lbl"), coalesce(col("nl"), col("lbl")), col("gl")).as("lbl"))
    }
    def run(stride: Int): Double = {
      val t0 = System.nanoTime()
      var lbl = adj.select(col("src").as("node")).distinct().withColumn("lbl", col("node"))
      var r = 0
      while (r < 6) {
        val n = math.min(stride, 6 - r)
        for (_ <- 1 to n) lbl = step(lbl)
        lbl = lbl.localCheckpoint()
        r += n
      }
      lbl.groupBy("lbl").agg(count(lit(1))).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    for (s <- Seq(1, 2, 3); rep <- 1 to 3) println(f"stride=$s rep$rep sec=${run(s)}%.3f")
    spark.stop()
  }
}
