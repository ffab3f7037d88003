package graft.extract

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** An in-memory extraction task (upstream: extract(tasks=[(name, bytes
  * [, page])], small=True)). page = None ⇒ fan out to all pages.
  */
case class ExtractTask(path: String, content: Array[Byte], page: Option[Int])

/** A registered feature: name, output type, and the per-page computation.
  * Mirrors upstream's @feature-decorated task methods (extract_task.py):
  * registering a new feature adds a column with automatic schema and error
  * capture.
  */
case class Feature(
    name: String,
    dataType: DataType,
    compute: (DocExtractor, Array[Byte], Int) => Any)

/** `image` feature output options (upstream CLI `--image-size WxH` /
  * `--image-format`, default JPEG). Both unset ⇒ the extractor's raw
  * rendered bytes pass through untouched; either set ⇒ the rendered page
  * is decoded, resized (if a size is given) and re-encoded — a feature
  * row whose bytes aren't a decodable image captures the failure in the
  * error column like any other feature exception.
  */
case class ImageOptions(size: Option[(Int, Int)] = None,
    format: Option[String] = None) {
  def active: Boolean = size.isDefined || format.isDefined
  def fmt: String = format.getOrElse("jpeg")
}

object ImageOptions {
  /** Parse CLI-shaped specs: size "WxH" (e.g. "64x48"), format name.
    * An unknown format (no ImageIO encoder) fails HERE — a usage error
    * before any Spark work, not an error column full of
    * "no encoder for format" after a complete run.
    */
  def parse(sizeSpec: Option[String], format: Option[String]): ImageOptions = {
    val size = sizeSpec.map { s =>
      val parts = s.toLowerCase.split("x")
      val dims = try parts.map(_.trim.toInt)
        catch { case _: NumberFormatException => Array.empty[Int] }
      if (dims.length != 2 || dims.exists(_ <= 0))
        throw new IllegalArgumentException(
          s"image size must be WxH with positive integers, got '$s'")
      (dims(0), dims(1))
    }
    val fmt = format.map(_.toLowerCase)
    fmt.foreach { f =>
      if (!javax.imageio.ImageIO.getImageWritersByFormatName(f).hasNext)
        throw new IllegalArgumentException(
          s"no image encoder for format '$f' (try png/jpeg/bmp/gif)")
    }
    ImageOptions(size, fmt)
  }
}

object Features {
  /** Built-in feature set (upstream: text, image, ocr). */
  def builtin(ocrLang: String = "eng",
      imageOpts: ImageOptions = ImageOptions()): Seq[Feature] = Seq(
    Feature("text", StringType, (ex, b, p) => ex.pageText(b, p)),
    Feature("image", BinaryType, (ex, b, p) => {
      val raw = ex.pageImage(b, p)
      if (imageOpts.active) Multimodal.transcode(raw, imageOpts.size, imageOpts.fmt)
      else raw
    }),
    Feature("ocr", StringType, (ex, b, p) => ex.ocrText(b, p, ocrLang)))

  /** The single place the `all` policy lives: `all` = every builtin
    * except OCR (upstream's default set); the ocr flag appends it.
    */
  def expand(names: Seq[String], ocr: Boolean = false): Seq[String] = {
    val base =
      if (names == Seq("all")) builtin().map(_.name).filterNot(_ == "ocr")
      else names
    if (ocr && !base.contains("ocr")) base :+ "ocr" else base
  }

  def select(names: Seq[String], ocrLang: String = "eng",
      imageOpts: ImageOptions = ImageOptions()): Seq[Feature] = {
    val all = builtin(ocrLang, imageOpts)
    expand(names).map(n => all.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"unknown feature: $n")))
  }
}

/** The pdf2dataset pipeline, Spark-native (SURVEY.md §2.A / §3):
  *
  *   corpus scan → page fan-out → per-feature extraction with error
  *   capture → resume anti-join → chunked parquet sink / small-mode
  *   collect.
  *
  * Everything is one narrow stage per partition (scan → flatMap → project
  * → sink): no exchange at all unless resume needs the anti-join — the
  * shape that makes this workload embarrassingly scalable (upstream runs
  * the same DAG over a Ray pool; here executors and `binaryFile`
  * partitioning replace it, and 100 TB just means more partitions).
  */
object Pipeline {

  /** Recursive binary corpus scan (upstream: directory walk + glob).
    * Emits (path, content) with path relative to the input root.
    */
  def corpus(spark: SparkSession, inputDir: String,
      glob: String = "*.doc"): DataFrame = {
    val root = new java.io.File(inputDir).toURI.toString.stripSuffix("/")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(inputDir)
      .select(
        regexp_replace(col("path"), java.util.regex.Pattern.quote(root + "/"), "")
          .as("path"),
        col("content"))
  }

  /** In-memory task source (upstream: extract(tasks=...)). */
  def fromTasks(spark: SparkSession, tasks: Seq[ExtractTask]): DataFrame = {
    import spark.implicits._
    tasks.toDS().select(col("path"), col("content"),
      col("page").as("only_page"))
  }

  /** Fan a corpus of whole documents out to per-page tasks. A document
    * whose page count cannot be determined survives as a single row with
    * page = -1 and the error captured (upstream sentinel).
    *
    * The UDF returns a Row against an explicit schema — the
    * [[extractFeatures]] pattern — NOT a case class: the Scala-reflective
    * encoder for a `Seq[Int]` field fails whole-stage codegen on this
    * Spark/Scala pair ("no applicable method pages()"), costing a failed
    * janino compile per session plus interpreted per-row encoding on an
    * ORACLED query's path (q_page_fanout) — caught by the r15 warning
    * sweep.
    */
  def fanout(docs: DataFrame, extractor: DocExtractor): DataFrame = {
    val fanSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pages",
        org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)),
      org.apache.spark.sql.types.StructField("error",
        org.apache.spark.sql.types.StringType)))
    val countUdf = udf(new org.apache.spark.sql.api.java
        .UDF2[Array[Byte], Integer, org.apache.spark.sql.Row] {
      override def call(content: Array[Byte],
          onlyPage: Integer): org.apache.spark.sql.Row =
        try {
          val n = extractor.pageCount(content)
          if (onlyPage != null) org.apache.spark.sql.Row(Seq(onlyPage.intValue), null)
          else org.apache.spark.sql.Row((1 to n).toSeq, null)
        } catch {
          // NonFatal: never-fail covers extraction errors, not OOM/interrupt
          case scala.util.control.NonFatal(e) =>
            org.apache.spark.sql.Row(Seq(-1), s"pagecount: ${e.getMessage}")
        }
    }, fanSchema)
    val withOnly =
      if (docs.columns.contains("only_page")) docs
      else docs.withColumn("only_page", lit(null).cast(IntegerType))
    withOnly
      .withColumn("fan", countUdf(col("content"), col("only_page")))
      .select(col("path"), col("content"),
        explode(col("fan.pages")).as("page"), col("fan.error").as("doc_error"))
  }

  /** Compute the selected features per (path, page) row, capturing every
    * per-feature exception into the `error` column ("<feature>: <msg>",
    * upstream extract_task.py) — the job never dies on a bad input.
    */
  def extractFeatures(tasks: DataFrame, features: Seq[Feature],
      extractor: DocExtractor): DataFrame = {
    import org.apache.spark.sql.Row
    val withFeatures = features.foldLeft(tasks) { (df, f) =>
      val fUdf = udf(new org.apache.spark.sql.api.java.UDF2[Array[Byte], Int, Row] {
        override def call(content: Array[Byte], page: Int): Row =
          try { Row(f.compute(extractor, content, page), null) }
          catch { case scala.util.control.NonFatal(e) =>
            Row(null, s"${f.name}: ${e.getMessage}") }
      }, StructType(Seq(
        StructField("value", f.dataType, nullable = true),
        StructField("err", StringType, nullable = true))))
      df.withColumn(s"__${f.name}",
        when(col("page") === -1 || col("doc_error").isNotNull,
          struct(lit(null).cast(f.dataType).as("value"),
            lit(null).cast(StringType).as("err")))
          .otherwise(fUdf(col("content"), col("page"))))
    }
    val errCols = col("doc_error") +: features.map(f => col(s"__${f.name}.err"))
    withFeatures.select(
      col("path") +: col("page") +:
        features.map(f => col(s"__${f.name}.value").as(f.name)) :+
        coalesce(errCols: _*).as("error"): _*)
  }

  /** Resume: drop tasks whose (path, page) already exist in the output
    * (upstream: anti-join against the partially-written parquet).
    *
    * No broadcast hint: the done-set grows with the corpus (on a resumed
    * 100 TB run it is nearly the whole corpus), so it must stay a shuffle
    * anti-join keyed on (path, page); AQE still downgrades to broadcast at
    * runtime whenever the done-set is actually small.
    */
  def resume(tasks: DataFrame, outPath: String): DataFrame = {
    val spark = tasks.sparkSession
    val existing = scala.util.Try(
      spark.read.parquet(outPath).select(col("path"), col("page"))).toOption
    existing match {
      case Some(done) => tasks.join(done, Seq("path", "page"), "left_anti")
      case None => tasks
    }
  }

  /** Full pipeline to a parquet sink. `chunkRecords` bounds rows per
    * output file (upstream saving_interval); a path ending in `.gzip`
    * selects gzip compression (upstream CLI convention). While the write
    * job runs, a [[ProgressListener]] reports task completions through
    * `progress` (stderr by default; None disables) — the upstream tqdm
    * analog, per-task granularity tunable via `progressEvery`.
    */
  def extractToParquet(spark: SparkSession, docs: DataFrame, outPath: String,
      features: Seq[String] = Seq("text"), extractor: DocExtractor = StubExtractor,
      chunkRecords: Int = 1000, doResume: Boolean = true,
      ocrLang: String = "eng", imageOpts: ImageOptions = ImageOptions(),
      progress: Option[String => Unit] = Some(ProgressListener.stderr),
      progressEvery: Int = 1): Unit = {
    val tasks0 = fanout(docs, extractor)
    val tasks = if (doResume) resume(tasks0, outPath) else tasks0
    val rows = extractFeatures(tasks,
      Features.select(features, ocrLang, imageOpts), extractor)
    val compression = if (outPath.endsWith(".gzip")) "gzip" else "snappy"
    val listener = progress.map(new ProgressListener(outPath, _, progressEvery))
    listener.foreach(spark.sparkContext.addSparkListener)
    try
      rows.write.mode("append")
        .option("maxRecordsPerFile", chunkRecords.toLong)
        .option("compression", compression)
        .parquet(outPath)
    finally listener.foreach { l =>
      // the listener bus delivers asynchronously; give in-flight task-end
      // events a bounded drain before detaching so the final line prints
      org.apache.spark.sql.graft.ListenerBusHook.drain(spark.sparkContext, 2000)
      spark.sparkContext.removeSparkListener(l)
    }
  }

  /** Small mode: materialize locally instead of writing (upstream
    * small=True returning a pandas DataFrame).
    */
  def extractSmall(spark: SparkSession, docs: DataFrame,
      features: Seq[String] = Seq("text"),
      extractor: DocExtractor = StubExtractor,
      ocrLang: String = "eng",
      imageOpts: ImageOptions = ImageOptions()): Array[org.apache.spark.sql.Row] =
    extractFeatures(fanout(docs, extractor),
      Features.select(features, ocrLang, imageOpts), extractor)
      .orderBy(col("path"), col("page"))
      .collect()
}
