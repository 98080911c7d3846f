package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r10 probe (r9 verdict Next #1): grouping_paired_agg's one concrete
  * alternative, measured head-to-head at sf1 — a TWO-LEVEL partial
  * aggregate that pivots key+val per (uid, group) in ONE aggregate of
  * the filtered scan (DocumentGrouper.java:118's batch+merge shape),
  * replacing the shuffled-hash join of two filtered sides. Same
  * answer by construction (cross-product semantics recovered from key
  * multiplicity × pre-folded val stats). The open question the probe
  * answers: does folding the pairing into one aggregate beat one
  * hash join when (uid, group) is unique per side (zero map-side
  * combine either way)?
  */
object GrpPairProbe10Main {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      System.err.println(f"[gp10] $tag%-10s n=$n ${(System.nanoTime - t0) / 1e9}%6.2f s")
    }

    def long(): DataFrame = {
      val li = graft.core.Tables.lineitem(spark, d)
      li.select(col("l_orderkey").as("uid"),
          col("l_linenumber").cast("string").as("group"),
          lit("RETURNFLAG").as("field"), col("l_returnflag").as("value"))
        .unionAll(li.select(col("l_orderkey").as("uid"),
          col("l_linenumber").cast("string").as("group"),
          lit("QUANTITY").as("field"), col("l_quantity").cast("string").as("value")))
    }

    def shipped(): Long =
      graft.operators.Grouping.groupByPaired(long(), "RETURNFLAG", "QUANTITY").count()

    // two-level pivot: level 1 folds each (uid, group) into its key
    // list + pre-aggregated val stats; level 2 explodes keys and
    // merges per group_key. ONE shuffle of the matched rows, no join.
    def pivot(): Long = {
      val f = long().filter(col("field").isin("RETURNFLAG", "QUANTITY"))
      val lvl1 = f.groupBy("uid", "group").agg(
        collect_list(when(col("field") === "RETURNFLAG", col("value"))).as("ks"),
        count(when(col("field") === "QUANTITY", 1)).as("nv"),
        sum(when(col("field") === "QUANTITY",
          col("value").cast("decimal(18,4)"))).as("sv"),
        min(when(col("field") === "QUANTITY", col("value").cast("double"))).as("mn"),
        max(when(col("field") === "QUANTITY", col("value").cast("double"))).as("mx"))
      lvl1.filter(col("nv") > 0)
        .select(explode(col("ks")).as("group_key"),
          col("nv"), col("sv"), col("mn"), col("mx"))
        .groupBy("group_key").agg(
          sum("nv").as("cnt"), sum("sv").cast("double").as("sum_val"),
          min("mn").as("min_val"), max("mx").as("max_val"))
        .count()
    }

    // equality check once (3-row result)
    val a = graft.operators.Grouping.groupByPaired(long(), "RETURNFLAG", "QUANTITY")
      .orderBy("group_key").collect().map(_.toString).mkString("|")
    System.err.println(s"[gp10] shipped rows: $a")

    time("warm")(shipped())
    for (r <- 1 to 3) {
      time(s"shipped_$r")(shipped())
      time(s"pivot_$r")(pivot())
    }
    spark.stop()
  }
}
