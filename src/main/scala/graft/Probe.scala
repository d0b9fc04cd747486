package graft

/** Ad-hoc timing probe: `runMain graft.Probe <sfDir> <query...>` times the
  * named [[Queries]] entries (all of them if none given) with a noop sink —
  * the inner dev loop for performance work without running the whole Bench.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Queries.all.keys.toSeq.sorted
    val spark = GraftSession.get()
    for (name <- names) {
      val t0 = System.nanoTime()
      Queries.all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
