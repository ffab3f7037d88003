package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.extract._

/** End-to-end tests of the extraction engine over a synthetic corpus —
  * the ScalaTest analog of upstream's tests/test_extraction.py over
  * tests/samples (multi-page docs, nested dirs, one invalid file, resume,
  * chunked sinks, feature selection, custom features). See FIXTURES.md §3.
  */
class ExtractionSpec extends AnyFunSuite with SparkSessionFixture {

  /** corpus/a.doc (3 pages), corpus/sub1/b.doc (1), corpus/sub1/sub2/c.doc
    * (2), corpus/invalid.doc (no magic), corpus/note.txt (ignored).
    */
  def buildCorpus(): Path = {
    val root = Files.createTempDirectory("graft-corpus")
    def write(rel: String, content: Array[Byte]): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, content)
    }
    def doc(pages: String*): Array[Byte] =
      (StubExtractor.Magic + pages.mkString("\f")).getBytes("UTF-8")
    write("a.doc", doc("alpha one", "alpha two", "alpha three"))
    write("sub1/b.doc", doc("bravo only"))
    write("sub1/sub2/c.doc", doc("charlie one", "charlie two"))
    write("invalid.doc", Array[Byte](0x13, 0x37, -1, -2, -3))
    write("note.txt", "not a doc".getBytes("UTF-8"))
    root
  }

  test("corpus scan: recursive glob keeps only *.doc, paths relative") {
    val root = buildCorpus()
    val docs = Pipeline.corpus(spark, root.toString)
    val paths = docs.select("path").collect().map(_.getString(0)).sorted
    assert(paths.toSeq == Seq("a.doc", "invalid.doc", "sub1/b.doc", "sub1/sub2/c.doc"))
  }

  test("fan-out: one row per page, invalid doc gets page=-1 + error") {
    val root = buildCorpus()
    val rows = Pipeline.fanout(Pipeline.corpus(spark, root.toString), StubExtractor)
      .select("path", "page", "doc_error").collect()
    val byPath = rows.groupBy(_.getString(0))
    assert(byPath("a.doc").map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3))
    assert(byPath("sub1/b.doc").map(_.getInt(1)).toSeq == Seq(1))
    assert(byPath("sub1/sub2/c.doc").map(_.getInt(1)).sorted.toSeq == Seq(1, 2))
    val inv = byPath("invalid.doc")
    assert(inv.length == 1 && inv.head.getInt(1) == -1)
    assert(inv.head.getString(2).startsWith("pagecount:"))
  }

  test("feature extraction: text values per page, error rows null-featured") {
    val root = buildCorpus()
    val out = Pipeline.extractSmall(spark,
      Pipeline.corpus(spark, root.toString), Seq("text"))
    val m = out.map(r => (r.getString(0), r.getInt(1)) ->
      (Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(m(("a.doc", 2))._1.contains("alpha two"))
    assert(m(("sub1/b.doc", 1))._1.contains("bravo only"))
    // error row: feature null, error set; (error IS NULL) XOR (text IS NULL)
    assert(m(("invalid.doc", -1))._1.isEmpty)
    assert(m(("invalid.doc", -1))._2.exists(_.startsWith("pagecount:")))
    assert(out.forall(r => r.isNullAt(2) != r.isNullAt(3)))
  }

  test("per-feature failure captured, job survives (FailingExtractor)") {
    val root = buildCorpus()
    val valid = Pipeline.corpus(spark, root.toString)
      .filter(!col("path").contains("invalid"))
    // page counting works (Stub), the text feature explodes (Failing):
    val tasks = Pipeline.fanout(valid, StubExtractor)
    val rows = Pipeline.extractFeatures(tasks,
      Features.select(Seq("text")), FailingExtractor).collect()
    assert(rows.length == 6)
    assert(rows.forall(r => r.getString(r.fieldIndex("error")).startsWith("text:")))
  }

  test("ocr + image features and feature selection") {
    val root = buildCorpus()
    val out = Pipeline.extractSmall(spark,
      Pipeline.corpus(spark, root.toString).filter(col("path") === "sub1/b.doc"),
      Seq("text", "image", "ocr"))
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(r.fieldIndex("text")) == "bravo only")
    assert(new String(r.getAs[Array[Byte]]("image"), "UTF-8") == "IMG:1:bravo only")
    assert(r.getString(r.fieldIndex("ocr")) == "[eng] bravo only")
  }

  test("custom feature registration adds a typed column") {
    val root = buildCorpus()
    val nWords = Feature("n_words",
      org.apache.spark.sql.types.IntegerType,
      (ex, b, p) => ex.pageText(b, p).split(" ").length)
    val rows = Pipeline.extractFeatures(
      Pipeline.fanout(Pipeline.corpus(spark, root.toString)
        .filter(col("path") === "a.doc"), StubExtractor),
      Seq(nWords), StubExtractor).collect()
    assert(rows.map(_.getInt(2)).toSeq == Seq(2, 2, 2))
  }

  test("resume skips already-done (path, page); rerun after completion is empty") {
    val root = buildCorpus()
    val outDir = Files.createTempDirectory("graft-out").resolve("out.parquet").toString
    val docs = Pipeline.corpus(spark, root.toString)
    Pipeline.extractToParquet(spark, docs, outDir)
    val firstRun = spark.read.parquet(outDir)
    assert(firstRun.count() == 7) // 3 + 1 + 2 pages + 1 error row
    // re-running must add nothing (everything resumes away)
    Pipeline.extractToParquet(spark, docs, outDir)
    assert(spark.read.parquet(outDir).count() == 7)
    // dropping part of the output makes exactly the dropped tasks rerun
    val kept = firstRun.filter(col("path") =!= "a.doc")
    val outDir2 = Files.createTempDirectory("graft-out2").resolve("out.parquet").toString
    kept.write.parquet(outDir2)
    Pipeline.extractToParquet(spark, docs, outDir2)
    val redone = spark.read.parquet(outDir2)
    assert(redone.count() == 7)
    assert(redone.filter(col("path") === "a.doc").count() == 3)
  }

  test("chunked sink bounds records per file; .gzip selects gzip codec") {
    val root = buildCorpus()
    val outDir = Files.createTempDirectory("graft-out3").resolve("out.gzip").toString
    Pipeline.extractToParquet(spark, Pipeline.corpus(spark, root.toString),
      outDir, chunkRecords = 2, doResume = false)
    val files = new java.io.File(outDir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.forall(_.getName.contains(".gz.")), "gzip codec in file names")
    val back = spark.read.parquet(outDir)
    assert(back.count() == 7)
  }

  test("progress listener reports task completions for a chunked run") {
    val root = buildCorpus()
    val outDir = Files.createTempDirectory("graft-prog").resolve("out.parquet").toString
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    Pipeline.extractToParquet(spark, Pipeline.corpus(spark, root.toString),
      outDir, chunkRecords = 2, doResume = false,
      progress = Some(lines.add(_: String)))
    assert(spark.read.parquet(outDir).count() == 7)
    val got = lines.toArray(Array.empty[String])
    // the tqdm analog: per-task counter lines plus an authoritative
    // job-done line, each carrying the sink label
    assert(got.nonEmpty, "progress listener emitted no lines")
    assert(got.forall(l => l.startsWith("[progress] ") && l.contains(outDir)))
    val counter = """(\d+)/(\d+) tasks""".r.unanchored
    assert(got.forall(counter.matches(_)), s"malformed lines: ${got.take(3).toSeq}")
    assert(got.exists(!_.contains("job done")), "no per-task counter lines")
    // the completion signal is the job-end line; this 1-job run has no
    // skipped stages, so its counter is also complete (done == total > 0)
    assert(got.last.contains("job done"), s"last line: ${got.last}")
    val (d, t) = got.last match { case counter(a, b) => (a.toLong, b.toLong) }
    assert(d == t && t > 0, s"final progress $d/$t")
  }

  test("CLI parse: flags map to config; malformed input gets usable errors") {
    val cfg = Main.parse(Seq("/in", "/out.parquet.gzip",
      "--features", "text,image", "--ocr", "--lang", "deu",
      "--image-size", "64x48", "--image-format", "png",
      "--saving-interval", "250", "--num-cpus", "4", "--no-resume",
      "--glob", "*.pdf", "--progress-every", "100", "--no-progress"))
    assert(cfg == Main.Config("/in", "/out.parquet.gzip",
      Seq("text", "image"), ocr = true, lang = "deu",
      imageSize = Some("64x48"), imageFormat = Some("png"),
      savingInterval = 250, numCpus = Some(4), resume = false, glob = "*.pdf",
      progress = false, progressEvery = 100))
    assert(Main.featureNames(cfg) == Seq("text", "image", "ocr"))
    assert(Main.featureNames(Main.parse(Seq("/i", "/o", "--features", "all")))
      == Seq("text", "image"))
    intercept[IllegalArgumentException](Main.parse(Seq("/in"))) // missing out
    intercept[IllegalArgumentException](Main.parse(Seq("/in", "/out", "--nope")))
    intercept[IllegalArgumentException](
      Main.parse(Seq("/in", "/out", "--saving-interval", "zero")))
    intercept[IllegalArgumentException](
      Main.parse(Seq("/in", "/out", "--image-size", "64by48")))
    intercept[IllegalArgumentException](
      Main.parse(Seq("/in", "/out", "--features"))) // flag without value
    // unknown encoder fails at parse time, not after a full Spark run
    intercept[IllegalArgumentException](
      Main.parse(Seq("/in", "/out", "--image-format", "webp")))
  }

  test("CLI e2e: gzip sink, saving interval, ocr lang, and resume") {
    val root = buildCorpus()
    val out = Files.createTempDirectory("graft-cli").resolve("out.parquet.gzip").toString
    val argv = Seq(root.toString, out, "--features", "text", "--ocr",
      "--lang", "deu", "--saving-interval", "2")
    Main.run(spark, Main.parse(argv))
    val first = spark.read.parquet(out)
    assert(first.count() == 7) // 6 pages + 1 error row
    assert(first.filter(col("ocr").startsWith("[deu]")).count() == 6)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.forall(_.getName.contains(".gz.")), "gzip codec from .gzip suffix")
    // resume path: a second identical invocation adds nothing
    Main.run(spark, Main.parse(argv))
    assert(spark.read.parquet(out).count() == 7)
    // --no-resume redoes everything (append doubles the rows)
    Main.run(spark, Main.parse(argv :+ "--no-resume"))
    assert(spark.read.parquet(out).count() == 14)
  }

  test("in-memory task source with explicit page") {
    val payload = (StubExtractor.Magic + "p1\fp2\fp3").getBytes("UTF-8")
    val tasks = Pipeline.fromTasks(spark, Seq(
      ExtractTask("mem.doc", payload, Some(2)),
      ExtractTask("mem2.doc", payload, None)))
    val out = Pipeline.extractFeatures(
      Pipeline.fanout(tasks, StubExtractor),
      Features.select(Seq("text")), StubExtractor)
      .orderBy("path", "page").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq == Seq(
      ("mem.doc", 2, "p2"),
      ("mem2.doc", 1, "p1"), ("mem2.doc", 2, "p2"), ("mem2.doc", 3, "p3")))
  }

  test("extraction output feeds the curation pipeline end-to-end") {
    import graft.queries.{CurateConfig, TextOps}
    import org.apache.spark.sql.expressions.Window
    // the pdf2dataset half composes with the LLM-pipeline half: extract
    // per-page text, then curate the resulting corpus frame directly.
    // pageA appears in d1 and (exactly) d2; d3 is a near-dup of pageB.
    val pageA = "alpha bravo carol delta eagle frank gusto hotel"
    val pageB = "mango nectar ocelot papaya quartz rhubarb salmon tomato"
    val root = Files.createTempDirectory("curate_corpus")
    def write(rel: String, pages: String*): Unit =
      Files.write(root.resolve(rel),
        (StubExtractor.Magic + pages.mkString("\f")).getBytes("UTF-8"))
    write("d1.doc", pageA, pageB)
    write("d2.doc", pageA)
    write("d3.doc", pageB + " tail")
    val extracted = Pipeline.extractFeatures(
      Pipeline.fanout(Pipeline.corpus(spark, root.toString), StubExtractor),
      Features.select(Seq("text")), StubExtractor)
    // page rows → the curation pipeline's (doc_id, text, n_chars) shape;
    // row_number keeps ids dense (keep-best's injective key needs < 1e9)
    val w = Window.orderBy(col("path"), col("page"))
    val docs = extracted.filter(col("error").isNull)
      .withColumn("doc_id", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("n_chars"))
    // ids: 1=(d1,pageA) 2=(d1,pageB) 3=(d2,pageA) 4=(d3,pageB+tail).
    // Deterministic split hash puts doc 1 in a TEST bucket (9) with its
    // exact copy doc 3 in train — so curation flags doc 1 as benchmark
    // contamination, doc 3 as the exact dup, and keep-best keeps the
    // longer member (doc 4) of the pageB near-dup cluster
    val curated = TextOps.curateOn(docs, CurateConfig(minWords = 1L))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.getString(2)))).toMap
    assert(curated == Map(
      1L -> (false, Some("decontaminated")),
      2L -> (false, Some("near_dup")),
      3L -> (false, Some("exact_dup")),
      4L -> (true, None)), s"got $curated")
    // and the data card composes over the same frame (global grouping)
    val card = TextOps.corpusReportOn(docs, CurateConfig(minWords = 1L),
      by = Seq.empty).collect()(0)
    assert(card.getLong(0) == 4L, "n_docs")
    assert(card.getLong(1) == 3L, "n_uniq: pageA duplicated exactly")
    assert(card.getLong(2) == 4L, "n_quality: all pass the relaxed gate")
  }
}
