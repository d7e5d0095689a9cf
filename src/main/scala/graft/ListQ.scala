package graft

object ListQ {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(q => println("QQ:" + q))
}
