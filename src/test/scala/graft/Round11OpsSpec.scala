package graft

import graft.functions.{TextKernels, text}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Round-11: the native Unicode normalizer and the leakage-safe split.
  * All non-ASCII test data is spelled with \\u escapes so the
  * composed-vs-decomposed distinction survives any editor/tooling
  * normalization of this file.
  */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eAcute = "\u00e9" // precomposed
  private val eCombining = "e\u0301" // decomposed, same visible glyph

  test("unicode_normalize NFC composes combining sequences, distributed") {
    val df = Seq(eCombining + "clair", eAcute + "clair", "A\u030a", "plain")
      .toDF("s")
    val got = df.select(text.unicode_normalize($"s", "NFC"))
      .as[String].collect().toSeq
    assert(got == Seq(eAcute + "clair", eAcute + "clair", "\u00c5", "plain"))
    // dedup-key consequence: the two spellings of eclair now hash equal
    assert(got(0) == got(1))
  }

  test("unicode_normalize via the SQL registry (SparkSessionExtensions)") {
    graft.functions.GraftFunctions.register(spark)
    Seq(eCombining, "\ufb01n").toDF("s").createOrReplaceTempView("u11")
    val nfc = spark.sql(
      "SELECT unicode_normalize(s, 'NFC') AS n FROM u11")
      .as[String].collect().toSeq
    assert(nfc == Seq(eAcute, "\ufb01n"))
    // NFKC additionally folds compatibility forms: the fi ligature opens
    val nfkc = spark.sql(
      "SELECT unicode_normalize(s, 'NFKC') AS n FROM u11")
      .as[String].collect().toSeq
    assert(nfkc == Seq(eAcute, "fin"))
    val err = intercept[Exception](
      spark.sql("SELECT unicode_normalize(s, 'NFX') FROM u11").collect())
    assert(err.getMessage.contains("NFX") ||
      err.getMessage.contains("unicode_normalize"))
  }

  test("TextKernels fast path returns the SAME buffer when normal") {
    val ascii = UTF8String.fromString("already normal ascii")
    assert(TextKernels.normalize(ascii, TextKernels.NFC) eq ascii)
    val composed = UTF8String.fromString("caf" + eAcute)
    assert(TextKernels.normalize(composed, TextKernels.NFC) eq composed)
    // and the slow path actually rewrites
    val decomposed = UTF8String.fromString("caf" + eCombining)
    val out = TextKernels.normalize(decomposed, TextKernels.NFC)
    assert(out.toString == "caf" + eAcute && !(out eq decomposed))
  }

  test("unicode_normalize NFD decomposes; nulls pass through") {
    val df = Seq(Some(eAcute), None).toDF("s")
    val nfd = df.select(text.unicode_normalize($"s", "NFD"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(nfd == Seq(Some(eCombining), None))
  }

  test("leakproof split: no band-collision edge ever crosses splits") {
    // planted near-dup families: 3 clusters of texts sharing long runs
    // (guaranteed band collisions) plus singletons
    val docs = (0L until 30L).map { i =>
      val fam = i % 3
      val base = s"alpha bravo charlie delta echo foxtrot golf " +
        s"hotel india juliet kilo family$fam"
      val txt = if (i < 9) base // 3 families of 3 exact dups
      else s"unique $i " + (0 to 10).map(j => s"w${i}_$j").mkString(" ")
      (i, txt)
    }.toDF("doc_id", "text")
    val buckets = graft.dedup.Dedup.minhashBucketsPortable(
        docs, "doc_id", "text", shingleN = 5, bands = 8, rowsPerBand = 2)
      .select($"band", $"band_hash", $"id")
    val edges = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id")).distinct()
    assert(edges.count() >= 9, "families must collide in bands")
    val split = graft.dedup.Dedup
      .duplicateClusters(docs.select($"doc_id"), edges, "doc_id")
      .withColumnRenamed("id", "doc_id")
      .withColumn("h", ($"cluster_id" % 1000003L) * 2654435761L % 100L)
      .select($"doc_id",
        when($"h" < 80, "train").when($"h" < 90, "val")
          .otherwise("test").as("split"))
    val crossing = edges
      .join(split.select($"doc_id".as("a_id"), $"split".as("sa")), "a_id")
      .join(split.select($"doc_id".as("b_id"), $"split".as("sb")), "b_id")
      .filter($"sa" =!= $"sb").count()
    assert(crossing == 0L,
      "near-dup pair crossed the split boundary — leakage")
  }
}
