package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r10 probe: the tree-query semi-join family at sf1 — broadcast
  * needle set vs the shuffle semi-join, head-to-head in one JVM. */
object TreeProbe10Main {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val T = graft.operators.DocumentTree

    def treeDocs(): DataFrame = {
      val parents = graft.core.Tables.orders(spark, d).select(
        col("o_orderkey").cast("string").as("uid"),
        lit("order").as("kind"),
        col("o_orderpriority").as("priority"),
        lit(null).cast("double").as("quantity"))
      val children = graft.core.Tables.lineitem(spark, d).select(
        concat(col("l_orderkey").cast("string"), lit("."),
          col("l_linenumber").cast("string")).as("uid"),
        lit("line").as("kind"),
        lit(null).cast("string").as("priority"),
        col("l_quantity").as("quantity"))
      parents.unionAll(children)
    }

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      System.err.println(f"[tree10] $tag%-16s n=$n%8d ${(System.nanoTime - t0) / 1e9}%6.2f s")
    }

    def anc(b: Boolean): Long = T.ancestorsOfMatches(
      treeDocs(), col("quantity") > 49, broadcastNeedles = b).count()
    def tld(b: Boolean): Long = T.tldQuery(
      treeDocs(), col("quantity") > 49, broadcastNeedles = b).count()
    def par(b: Boolean): Long = T.parentsOfMatches(treeDocs(),
      (col("kind") === "line" && col("quantity") > 49) ||
        (col("kind") === "order" && col("priority") === "1-URGENT"),
      broadcastNeedles = b).count()

    time("warm")(anc(true))
    for (r <- 1 to 3) {
      time(s"anc_bcast_$r")(anc(true))
      time(s"anc_shuffle_$r")(anc(false))
      time(s"tld_bcast_$r")(tld(true))
      time(s"tld_shuffle_$r")(tld(false))
      time(s"par_bcast_$r")(par(true))
      time(s"par_shuffle_$r")(par(false))
    }
    spark.stop()
  }
}
