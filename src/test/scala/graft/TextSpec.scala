package graft

import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

class TextSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.text.TextFunctions.register(spark) // token_set_count
  }

  test("langId votes the right language on clear-cut snippets") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy that day"),
      ("de", "der hund ist nicht in das haus und die katze auf dem dach"),
      ("es", "el perro es un animal que vive en la casa y las calles"),
      ("fr", "le chien est dans la maison et les chats pour une promenade"),
      ("zh", "我有一只猫它在我的房子里这是他的家不是不好"))
      .toDF("expected", "text")
    val got = samples.select(col("expected"), langId(col("text")).as("pred")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)}, got ${r.getString(1)}"))
  }

  test("token counting: whitespace and bpe-ish variants") {
    import spark.implicits._
    val df = Seq("Hello world, 42 tests!  extra   spaces").toDF("text")
    val r = df.select(
      tokenCount(col("text")).as("ws"),
      size(bpeishTokens(col("text"))).as("bpe")).collect()(0)
    assert(r.getInt(0) == 6)
    // Hello world , 42 tests ! extra spaces → 8
    assert(r.getInt(1) == 8)
  }

  test("fingerprint64 is stable under trailing-whitespace-only noise and shifts on edits") {
    import spark.implicits._
    val df = Seq(
      ("a", "alpha beta gamma delta epsilon zeta"),
      ("b", "alpha beta gamma delta epsilon zeta   "),
      ("c", "alpha beta gamma delta epsilon thorn")).toDF("id", "text")
    val fp = df.select(col("id"), fingerprint64(col("text")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fp("a") == fp("b"))
    // min over shingle hashes MAY survive a tail edit; just require determinism
    val fp2 = df.select(col("id"), fingerprint64(col("text")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fp == fp2)
  }

  test("quality features: exact counts on a known sentence") {
    import spark.implicits._
    val df = Seq("The quick fox, the lazy dog.").toDF("text")
    val f = df.select(qualityFeatures(col("text")).as("f")).select("f.*").collect()(0)
    assert(f.getAs[Int]("n_tokens") == 6)
    assert(f.getAs[Int]("stopword_cnt") == 2)   // 'The' + 'the'
    assert(f.getAs[Int]("punct_cnt") == 2)      // ',' + '.'
  }
}
