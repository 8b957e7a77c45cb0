package graft

import graft.dedup.Dedup
import graft.ops.Relational
import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the operator laws SURVEY.md §5 calls out: block-diag
  * preserves edge counts and in-block structure; alias normalization is
  * idempotent; outer union row count is the sum of inputs; shingle Jaccard
  * is symmetric and bounded. (Raw ScalaCheck generators sampled with fixed
  * seeds — the scalatest+scalacheck bridge artifact isn't in the offline
  * dependency set.)
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  val sizesGen: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 6)
    sizes <- Gen.listOfN(n, Gen.choose(1L, 20L))
  } yield sizes.zipWithIndex.map { case (s, i) => (f"b$i%02d", s) }

  test("O-22 blockOffsets: offsets = prefix sums; span = Σ sizes") {
    samples(sizesGen, 8).foreach { sizes =>
      val df = sizes.toDF("k", "n")
      val offs = Relational.blockOffsets(df, "k", "n", col("k"), "off")
        .orderBy("k").collect()
        .map(r => (r.getLong(1), r.getLong(2)))
      val expected = sizes.map(_._2).scanLeft(0L)(_ + _).init
      assert(offs.map(_._2).toSeq == expected)
      assert(offs.last._1 + offs.last._2 == sizes.map(_._2).sum)
    }
  }

  val tableGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 12)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 7L), Gen.choose(0L, 99L)))
  } yield rows.groupBy(_._1).map { case (k, vs) => (k, vs.head._2) }.toList

  test("upsert idempotent; deltaDetect(a,b) mirrors deltaDetect(b,a)") {
    val pairs = samples(Gen.zip(tableGen, tableGen), 6)
    pairs.foreach { case (a, b) =>
      val base = a.toDF("k", "v"); val upd = b.toDF("k", "v")
      val once = Relational.upsert(base, upd, Seq("k"))
        .as[(Long, Long)].collect().toMap
      val twice = Relational.upsert(
          Relational.upsert(base, upd, Seq("k")), upd, Seq("k"))
        .as[(Long, Long)].collect().toMap
      assert(once == twice, s"upsert not idempotent for $a / $b")
      // forward/backward delta: inserts and deletes swap, updates and
      // unchanged are invariant under direction
      def classify(x: Seq[(Long, Long)], y: Seq[(Long, Long)]) =
        Relational.deltaDetect(x.toDF("k", "v"), y.toDF("k", "v"),
            Seq("k"), Seq("v"))
          .select(col("k"), col("change_type"))
          .as[(Long, String)].collect().toMap
      val fwd = classify(a, b)
      val bwd = classify(b, a)
      assert(fwd.keySet == bwd.keySet)
      fwd.foreach { case (k, ct) =>
        val expected = ct match {
          case "insert" => "delete"
          case "delete" => "insert"
          case other => other
        }
        assert(bwd(k) == expected, s"key $k: fwd=$ct bwd=${bwd(k)}")
      }
    }
  }

  val wordsGen: Gen[List[String]] =
    Gen.listOfN(12, Gen.oneOf("cd45", "dapi", "ecad", "panck", "foo",
      "bar", "Anti-CD3", "ki67 antibody", "  CD45 "))

  test("J-3 aliasNormalize idempotent for arbitrary inputs") {
    val aliases = Seq(("cd45", "PTPRC"), ("dapi", "DAPI"),
      ("ecad", "CDH1")).toDF("alias_lower", "canonical")
    samples(wordsGen, 5).foreach { words =>
      val df = words.toDF("name")
      val once = Relational.aliasNormalize(df, "name", aliases, "name")
      val twice = Relational.aliasNormalize(once, "name", aliases, "name")
      assert(once.as[String].collect().sorted.toSeq ==
        twice.as[String].collect().sorted.toSeq)
    }
  }

  test("O-20 outerConcat: count additive over arbitrary projections") {
    samples(Gen.zip(Gen.choose(1L, 50L), Gen.choose(1L, 50L)), 5)
      .foreach { case (n1, n2) =>
        val a = spark.range(n1).select($"id", lit("a").as("s"))
        val b = spark.range(n2).select($"id", lit(1.5).as("d"))
        assert(Relational.outerConcat(Seq(a, b)).count() == n1 + n2)
      }
  }

  val textGen: Gen[String] = Gen.listOfN(25,
    Gen.oneOf("spark", "scan", "join", "agg", "row", "key", "the", "a"))
    .map(_.mkString(" "))

  test("Jaccard symmetric, in [0,1], self = 1") {
    samples(Gen.zip(textGen, textGen), 6).foreach { case (s1, s2) =>
      val df = Seq((s1, s2)).toDF("a", "b")
      def sh(c: String) = TextOps.wordShingles(col(c), 2)
      val r = df.select(
        TextOps.jaccard(sh("a"), sh("b")).as("ab"),
        TextOps.jaccard(sh("b"), sh("a")).as("ba"),
        TextOps.jaccard(sh("a"), sh("a")).as("aa")).collect().head
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(2) == 1.0)
    }
  }

  test("minhash signatures: length k; superset doc minima never increase") {
    samples(textGen, 5).foreach { t =>
      val df = Seq((1L, t), (2L, t + " extra tokens appended here"))
        .toDF("id", "text")
      val sigs = Dedup.minhashSignatures(df, "id", "text", k = 8,
          shingleN = 2)
        .orderBy("id").as[(Long, Seq[Long])].collect()
      assert(sigs.forall(_._2.length == 8))
      assert(sigs(0)._2.zip(sigs(1)._2).forall { case (a, b) => b <= a })
    }
  }
}
