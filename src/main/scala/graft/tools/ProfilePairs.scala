package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ShingleExpressions
import org.apache.spark.sql.types.LongType

object ProfilePairs {
  def pairsNative(docs: DataFrame, threshold: Double): DataFrame = {
    val arr = ShingleExpressions.shingles(col("text"))
    val e = docs.select(col("doc_id"), arr.as("shingles"))
      .select(col("doc_id"), size(col("shingles")).cast(LongType).as("n"),
        explode(col("shingles")).as("s"))
    e.as("a").join(e.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          greatest(col("a.n"), col("b.n")) * (threshold - 5e-7) <=
            least(col("a.n"), col("b.n")) + 1)
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.n").as("n1"), col("b.n").as("n2"))
      .agg(count(lit(1)).as("inter"))
      .select(col("d1"), col("d2"), col("inter"),
        round(col("inter") / (col("n1") + col("n2") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("d1"), col("d2"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.t(spark, sfDir, "documents")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
    }
    // equivalence: native shingle rows == window shingle rows (as multisets)
    val winRows = TextOps.shingleRows(docs)
    val natRows = docs.select(col("doc_id"),
      explode(ShingleExpressions.shingles(col("text"))).as("s"))
    val diff1 = winRows.exceptAll(natRows).count()
    val diff2 = natRows.exceptAll(winRows).count()
    println(s"[equiv] shingleRows win\\nat=$diff1 nat\\win=$diff2")
    // equivalence: native minhash mins == groupBy min(xxhash64(i, s))
    val k = 16
    val winMins = winRows.groupBy(col("doc_id")).agg(
      min(xxhash64(lit(0), col("s"))).as("m0"),
      (1 until k).map(i => min(xxhash64(lit(i), col("s"))).as(s"m$i")): _*)
    val natMins = docs.select(col("doc_id"),
        ShingleExpressions.minhashMins(col("text"), k).as("m"))
      .filter(col("m").isNotNull)
      .select(col("doc_id") +: (0 until k).map(i => col("m")(i).as(s"m$i")): _*)
    val md1 = winMins.exceptAll(natMins).count()
    val md2 = natMins.exceptAll(winMins).count()
    println(s"[equiv] minhashMins win\\nat=$md1 nat\\win=$md2")
    time("window pairs 1")(TextOps.neardupJaccardAt(docs, 0.5).count())
    time("window pairs 2")(TextOps.neardupJaccardAt(docs, 0.5).count())
    time("native pairs 1")(pairsNative(docs, 0.5).count())
    time("native pairs 2")(pairsNative(docs, 0.5).count())
    time("native rows only")(natRows.count())
    time("native mins only")(natMins.count())
    // r15 q_curate_delta adjudication: the row's dominant cost is this
    // one-time pair build — is the prefix-filtered (AllPairs) form
    // faster at sf0.1 than the direct shingle self-join?
    time("prefix pairs 1")(TextOps.neardupJaccardPrefixAt(docs, 0.5).count())
    time("prefix pairs 2")(TextOps.neardupJaccardPrefixAt(docs, 0.5).count())
    // r15: the media banding's radius-1 multi-probe cost at 50k hashes
    // (uniform random — worst case for probe fan-out, no pair output)
    val hashes = spark.range(50000)
      .select(col("id").cast("string").as("med_id"),
        xxhash64(col("id")).as("ahash"))
      .localCheckpoint(true)
    time("banded exact 50k")(graft.operators.BandedHamming
      .pairs(hashes, "med_id", "ahash").count())
    time("banded multiprobe 50k")(graft.operators.BandedHamming
      .pairs(hashes, "med_id", "ahash", multiProbe = true).count())
    spark.stop()
  }
}
