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

    // the r9-verdict-suggested alternative: BLOOM-prune the corpus
    // side before the shuffle semi-join, so only probable needles
    // shuffle (public df.stat.bloomFilter + a broadcast mightContain
    // filter; the semi-join then verifies exactly)
    def ancBloom(): Long = {
      val docs = treeDocs()
      val prefixes = docs.filter(col("quantity") > 49)
        .select(explode(T.prefixesOf(col("uid"))).as("__p"))
        .distinct().persist()
      val bf = prefixes.stat.bloomFilter("__p", 600000L, 0.03)
      val bfB = spark.sparkContext.broadcast(bf)
      val mc = udf((u: String) => u != null && bfB.value.mightContainString(u))
      val out = docs.filter(mc(col("uid")))
        .join(prefixes, col("uid") === col("__p"), "left_semi").count()
      prefixes.unpersist(); bfB.destroy()
      out
    }
    def parBloom(): Long = {
      val docs = treeDocs()
      val parents = docs.filter(
          (col("kind") === "line" && col("quantity") > 49) ||
            (col("kind") === "order" && col("priority") === "1-URGENT"))
        .select(coalesce(T.parentUid(col("uid")), col("uid")).as("__parent"))
        .distinct().persist()
      val bf = parents.stat.bloomFilter("__parent", 400000L, 0.03)
      val bfB = spark.sparkContext.broadcast(bf)
      val mc = udf((u: String) => u != null && bfB.value.mightContainString(u))
      val out = docs.filter(mc(col("uid")))
        .join(parents, col("uid") === col("__parent"), "left_semi").count()
      parents.unpersist(); bfB.destroy()
      out
    }

    // r10-verdict Next #6: the depth-statistic prune — retrieve side
    // restricted to possible parent depths via the ingest-maintained
    // metadata statistic (derived live here: one column-pruned agg)
    def parDepth(b: Boolean): Long = {
      val docs = treeDocs()
      T.parentsOfMatches(docs,
        (col("kind") === "line" && col("quantity") > 49) ||
          (col("kind") === "order" && col("priority") === "1-URGENT"),
        broadcastNeedles = b,
        maxTreeDepth = Some(T.maxTreeDepth(docs))).count()
    }

    time("warm")(anc(true))
    for (r <- 1 to 3) {
      time(s"anc_bcast_$r")(anc(true))
      time(s"anc_shuffle_$r")(anc(false))
      time(s"anc_bloom_$r")(ancBloom())
      time(s"tld_bcast_$r")(tld(true))
      time(s"tld_shuffle_$r")(tld(false))
      time(s"par_bcast_$r")(par(true))
      time(s"par_shuffle_$r")(par(false))
      time(s"par_bloom_$r")(parBloom())
      time(s"par_depth_$r")(parDepth(false))
      time(s"par_depth_b_$r")(parDepth(true))
    }
    spark.stop()
  }
}
