package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

// scratch measurement main (deleted after the floor is recorded)
object RecallScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = graft.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val q = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
      val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val w = Window.partitionBy(col("query_id")).orderBy(col("l2"), col("neighbor_id"))
      val truth = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (dot(col("qemb"), col("qemb")) - lit(2.0) * dot(col("qemb"), col("emb"))
            + dot(col("emb"), col("emb"))).as("l2"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"))
      for (kShort <- Seq(3, 25, 50, 100, 200)) {
        val df = Similarity.pqAdcShortlistScratch(spark, dir, kShort)
        val eng = df.select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
        val rec = truth.join(eng, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("nt"), sum(coalesce(col("hit"), lit(0L))).as("nh"))
          .agg(avg(col("nh").cast("double") / col("nt")).as("mean_recall"),
            min(col("nh")).as("min_hits"))
          .head()
        println(s"CONTAIN $dir k=$kShort mean=${rec.getDouble(0)} minPerQueryHits=${rec.getLong(1)}")
      }
    }
    spark.stop()
  }
}
