package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of the named
  * queries (or all, given "all") so scan pruning (ReadSchema,
  * PushedFilters), join strategies (BroadcastHashJoin), and
  * WholeStageCodegen spans can be inspected per query.
  * Usage: runMain graft.Explain <sfDir> <name>[,<name>...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names: Seq[String] =
      if (args.length < 2 || args(1) == "all") QueryRegistry.all.map(_.name)
      else args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // See Bench.scala: avoids serial re-shingling below repartition.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.Resources.withScope {
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    }
    graft.operators.DedupQueries.invalidateLabels(spark)
    spark.stop()
  }
}
