package graft.fuzz

/** Dev utility: print the generated (Spark, DuckDB) pair for given seeds —
  * `sbt "Test/runMain graft.fuzz.FuzzShow 263 279 300"`.
  */
object FuzzShow {
  def main(args: Array[String]): Unit =
    args.map(_.toInt).foreach { s =>
      val q = FuzzGen.queryFor(s)
      println(s"== ${q.name} viaChSql=${q.viaChSql}")
      println(s"SPARK: ${q.sparkSql}")
      println(s"DUCK:  ${q.duckSql}")
    }
}
