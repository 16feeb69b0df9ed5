package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Scratch probe: quantization error of seeded vs trained PQ codebooks. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val quant = embs.select(col("vec_id"), Similarity.quantized(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val m = 8; val ksub = 16; val dims = 64; val dsub = dims / m
    def sub(v: Array[Long], j: Int) = v.slice(j * dsub, (j + 1) * dsub)
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def mse(cb: Array[Array[Array[Long]]]): Double = {
      quant.values.map { v =>
        (0 until m).map { j =>
          cb(j).map(w => d2(sub(v, j), w)).min
        }.sum.toDouble
      }.sum / quant.size
    }
    val seeded = Similarity.seedPqCodebooks(embs, m, ksub)
    val trained = Similarity.trainedPqCodebooks(embs, m, ksub)
    println(s"seeded  MSE: ${mse(seeded)}")
    println(s"trained MSE: ${mse(trained)}")
    // driver-side ADC recall vs exact L2 over a query set
    def recall(cb: Array[Array[Array[Long]]], qids: Seq[Long], k: Int): Int = {
      val codes = quant.map { case (id, v) =>
        id -> (0 until m).map { j =>
          cb(j).zipWithIndex.minBy { case (w, c) => (d2(sub(v, j), w), c) }._2
        }
      }
      qids.map { qid =>
        val qv = quant(qid)
        val others = quant.keys.filter(_ != qid).toSeq
        val exact = others.map(n => (n, d2(qv, quant(n))))
          .sortBy { case (n, d) => (d, n) }.take(k).map(_._1).toSet
        val adc = others.map { n =>
          (n, (0 until m).map(j => d2(sub(qv, j), cb(j)(codes(n)(j)))).sum)
        }.sortBy { case (n, d) => (d, n) }.take(k).map(_._1).toSet
        (exact intersect adc).size
      }.sum
    }
    for (nq <- Seq(5, 20, 50)) {
      val qids = (0L until nq.toLong).toSeq
      val rs = recall(seeded, qids, 10)
      val rt = recall(trained, qids, 10)
      println(s"nq=$nq k=10: seeded recall $rs/${nq * 10}, trained $rt/${nq * 10}")
    }
    spark.stop()
  }
}
