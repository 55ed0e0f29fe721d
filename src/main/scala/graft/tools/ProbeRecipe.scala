package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage profile for the composed recipe (`text_recipe_pipeline`) at
  * the scaling-probe SFs: wall time per intermediate relation, so the
  * sf1→sf10 composition cost decomposes into stages instead of being
  * one opaque ratio (SCALE.md second-decade table). Driver-side
  * measurement tooling, same tier as [[ProbeTws]]/[[ProfileStream]].
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ProbeRecipe [sfDir]"
  *
  * Note `build` includes the eager work: gatedDocs' localCheckpoint,
  * the CC superstep loop inside canonicalOf, and sampled's
  * localCheckpoint — the later counts then re-run only the lazy
  * lineage above their relation (canon is NOT checkpointed; its count
  * re-executes the pair join, which is itself informative).
  */
object ProbeRecipe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[recipe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val rp = t("build(ckpts+CC supersteps)")(
      graft.queries.TextQueries.recipeParts(spark, sfDir))
    Seq(
      "gated" -> rp.gated, "canon" -> rp.canon, "manifest0" -> rp.manifest0,
      "contaminated" -> rp.contaminated, "sampled" -> rp.sampled,
      "result" -> rp.result
    ).foreach { case (n, df) => t(s"$n.count")(println(s"  rows=${df.count()}")) }
    spark.stop()
  }
}
