package graft
object KeyCheckMain {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println("queries=" + q.size + " oracles=" + o.size)
    println("oracle-without-query: " + (o -- q))
    println("query-without-oracle: " + (q -- o))
  }
}
