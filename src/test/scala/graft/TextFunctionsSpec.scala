package graft

import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions, TextFunctions, VectorFunctions}

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokens and counts") {
    val df = Seq("a bb  ccc", "", "  ", "one").toDF("text")
      .select(TextFunctions.tokenCount(col("text")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(3, 0, 0, 1))
  }

  test("word ngrams") {
    val r = Seq("a b c d").toDF("text")
      .select(TextFunctions.wordNgrams(col("text"), 3).as("g"))
      .head().getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(TextFunctions.wordNgrams(col("text"), 3).as("g"))
      .head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("char shingles") {
    val r = Seq("abcd").toDF("text")
      .select(TextFunctions.charShingles(col("text"), 3).as("g"))
      .head().getSeq[String](0)
    assert(r == Seq("abc", "bcd"))
  }

  test("fingerprint is whitespace/case insensitive") {
    val r = Seq(("A  b\tC", "a b c")).toDF("x", "y")
      .select(TextFunctions.fingerprint(col("x")) === TextFunctions.fingerprint(col("y")))
      .head().getBoolean(0)
    assert(r)
  }

  test("langId picks dominant stopword profile") {
    val r = Seq("der hund und die katze ist da", "the cat is on the mat",
      "le chat est un animal", "xyzzy qwerty").toDF("text")
      .select(TextFunctions.langId(col("text")).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("de", "en", "fr", "und"))
  }

  test("md5Long is stable and non-negative") {
    val r = Seq("abc", "abc", "xyz").toDF("s")
      .select(HashFunctions.md5Long(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(r(0) == r(1) && r(0) != r(2) && r.forall(_ >= 0))
  }

  test("vector math") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val row = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.l2Norm(col("a")).as("n"),
      VectorFunctions.cosine(col("a"), col("a")).as("c")).head()
    assert(row.getDouble(0) == 11.0)
    assert(math.abs(row.getDouble(1) - math.sqrt(5.0)) < 1e-12)
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-12)
  }
}
