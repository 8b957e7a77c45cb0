package graft

import graft.functions.{HashKernels, text => gtext}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The fused md5-prefix kernel must be BIT-EQUAL to the written-out
  * chain `conv(substring(md5(s), 1, n), 16, 10)` it replaced (r18
  * optimization): every oracle still carries the written-out chain,
  * so any divergence here is an immediate hash-FAIL across the
  * classifier/sampling/winnowing families.
  */
class Md5PrefixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("md5_prefix64 == conv(substring(md5, 1, n), 16, 10) over " +
      "random strings for every n in [1, 15]") {
    val rng = new scala.util.Random(4242)
    val corpus = (0 until 200).map { i =>
      val len = rng.nextInt(40)
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        sb.append(rng.nextInt(4) match {
          case 0 => ('a' + rng.nextInt(26)).toChar
          case 1 => ('0' + rng.nextInt(10)).toChar
          case 2 => Seq('é', 'ß', '中', '日', '́')(rng.nextInt(5))
          case _ => ' '
        })
      }
      (i.toLong, sb.toString)
    } :+ (200L, "") // empty string is a valid md5 input
    val df = corpus.toDF("id", "s")
    (1 to 15).foreach { n =>
      val bad = df.select(
          gtext.md5_prefix64($"s", n).as("fused"),
          conv(substring(md5($"s"), 1, n), 16, 10).cast("long")
            .as("chain"))
        .filter($"fused" =!= $"chain" ||
          $"fused".isNull =!= $"chain".isNull)
        .count()
      assert(bad == 0L, s"fused md5_prefix64 diverged at n=$n")
    }
  }

  test("NULL in, NULL out; interpreted eval matches codegen") {
    val r = Seq((1L, Option.empty[String]), (2L, Some("abc")))
      .toDF("id", "s")
      .select($"id", gtext.md5_prefix64($"s", 15).as("h"))
      .orderBy($"id").collect()
    assert(r(0).isNullAt(1))
    // interpreted path (direct kernel call) equals the plan's value
    assert(r(1).getLong(1) ==
      HashKernels.md5Prefix(UTF8String.fromString("abc"), 15))
  }

  test("nHex outside [1, 15] is rejected at construction") {
    intercept[IllegalArgumentException] {
      gtext.md5_prefix64(lit("x"), 16)
    }
    intercept[IllegalArgumentException] {
      gtext.md5_prefix64(lit("x"), 0)
    }
  }
}
