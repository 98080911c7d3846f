package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r9 probe: where qs_grouping_string's sf1 time goes — the filtered
  * union scan (regex over 6M quantity strings), the one-scan grouping
  * aggregate, or the final uid distinct. */
object GrpProbe9Main {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      System.err.println(f"[grp9] $tag%-10s n=$n ${(System.nanoTime - t0) / 1e9}%6.2f s")
    }

    val li = graft.core.Tables.lineitem(spark, d)
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    def leg(field: String, value: org.apache.spark.sql.Column): DataFrame =
      li.select(col("l_orderkey").as("uid"), lit(field).as("field"),
        col("l_linenumber").cast("string").as("group"),
        value.cast("string").as("value"))
    val long = leg("RETURNFLAG", col("l_returnflag"))
      .unionByName(leg("QUANTITY", col("l_quantity")))
    val conds = Seq(
      graft.operators.Grouping.FieldMatch("RETURNFLAG", _ === "R"),
      graft.operators.Grouping.FieldMatch("QUANTITY",
        _.rlike("^(?:4[89].*)$")))
    val any = conds.map(c =>
      col("field") === c.field && c.predicate(col("value"))).reduce(_ || _)

    def scanOnly(): Long = long.filter(any).count()
    def kernel(): Long = graft.operators.Grouping.matchesInGroup(
      long, conds).count()
    def full(): Long = graft.queries.QueryStringQueries
      .qsGroupingString(spark, d).count()

    time("warm")(full())
    for (r <- 1 to 3) {
      time(s"scan_$r")(scanOnly())
      time(s"kernel_$r")(kernel())
      time(s"full_$r")(full())
    }
    spark.stop()
  }
}
