package graft

import graft.engine.Ingest
import org.apache.spark.sql.SparkSession

/** CLI entrypoint.
  *
  * Implements the flags the reference's README documents
  * (`--sources_yaml`, `--env`; README.md:65-68) — the reference's run.py
  * ignores argv and hardcodes the path, which the README itself contradicts;
  * we implement the documented behavior. No Delta/Azure wiring: the engine is
  * plain Spark (SURVEY.md §2.4, §4).
  */
object Main {
  def main(args: Array[String]): Unit = {
    var yaml = "metadata/sources.yaml"
    var env: Option[String] = None
    var parallelism = 1
    args.sliding(2, 2).foreach {
      case Array("--sources_yaml", v) => yaml = v
      case Array("--env", v)          => env = Some(v)
      case Array("--parallelism", v)  => parallelism = v.toInt
      case other =>
        System.err.println(s"unknown args: ${other.mkString(" ")}")
        System.err.println(
          "usage: graft.Main --sources_yaml <path> [--env <env>] [--parallelism <n>]"
        )
        sys.exit(2)
    }
    val spark = GraftSession.build()
    try {
      val results = Ingest.run(spark, yaml, env, parallelism)
      println(s"Ingestion finished successfully: ${results.size} sources.")
    } finally spark.stop()
  }
}

/** Shared local SparkSession builder with scale-appropriate defaults. */
object GraftSession {
  def build(
      master: String = sys.env.getOrElse("SPARK_MASTER", "local[*]"),
      shufflePartitions: Int =
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
  ): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
