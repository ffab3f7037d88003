package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the vec_pairs_cosine_lsh warm build —
  * the #2 row of the r19 healthy windows (5.9-7.9 s) whose knobs
  * (16 planes / 8 bands, threshold 0.35) are contract-pinned. Attributes
  * the build's wall-clock to its stages (signatures, candidate join,
  * cross-band distinct, exact verify, checkpoint) so an optimization
  * targets the measured cost, not the guessed one. Not part of the
  * contract; a local perf tool.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.queries.CosLshProfile [sfDir]"
  */
object CosLshProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
      n
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }

    val base = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        VectorOps.norm2(col("embedding")).as("n2"))
    time("embeddings.count")(base.count())

    // the r18 form: distinct candidates first, then verify (what
    // neardupCosineLshAt computed before the r19 dedup deferral)
    def oldForm(): org.apache.spark.sql.DataFrame = {
      val cands = VectorOps.cosineLshCandidates(base, numPlanes = 16, bands = 8)
      VectorOps.verifyCosine(cands, base, base, 0.35)
        .orderBy(col("v1"), col("v2"))
    }
    val newForm = () => VectorOps.neardupCosineLshAt(base, threshold = 0.35,
      numPlanes = 16, bands = 8)

    // equality gate: same pair set, same cos values (order-insensitive)
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.select(
        count(lit(1)).as("n"),
        bit_xor(xxhash64(col("v1"), col("v2"), col("cos"))).as("x")).head()
      (r.getLong(0), r.getLong(1))
    }
    val so = sig(oldForm()); val sn = sig(newForm())
    println(s"[equiv] old=$so new=$sn equal=${so == sn}")
    require(so == sn, "dedup-deferred form is NOT pair-identical")

    // alternated A/B/B/A, noop sink + memo-shaped checkpoint arm
    for (pass <- 1 to 2; (name, form) <- {
      val arms = Seq("old" -> oldForm _, "new" -> newForm)
      if (pass % 2 == 1) arms else arms.reverse
    }) {
      time(s"$name verified (noop) p$pass")(noop(form()))
      time(s"$name ckpt+count p$pass") {
        form().localCheckpoint(true).count()
      }
    }
    // commit-able plan evidence: the warm build's formatted plan, both
    // forms (the contract row q_neardup_cosine_lsh itself only scans
    // the memoized checkpoint, so the build plan lives here)
    val dir = java.nio.file.Paths.get("plans/r19")
    java.nio.file.Files.createDirectories(dir)
    for ((name, df) <- Seq("before" -> oldForm(), "after" -> newForm())) {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        dir.resolve(s"vec_pairs_cosine_lsh_build_$name.txt"),
        plan.getBytes("UTF-8"))
      val ex = plan.linesIterator.count(_.trim.startsWith("Exchange"))
      println(s"[plandump] vec_pairs_cosine_lsh_build_$name: $ex Exchange nodes")
    }
    spark.stop()
  }
}
