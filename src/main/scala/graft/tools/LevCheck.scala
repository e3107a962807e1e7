package graft.tools
import graft.Engine
import org.apache.spark.sql.functions._
/** Scratch: semantics of 3-arg levenshtein (threshold early-exit). */
object LevCheck {
  def main(args: Array[String]): Unit = {
    val spark = Engine.localSession(4, "levcheck")
    import spark.implicits._
    val df = Seq(("abc","abd"),("abc","abc"),("abc","xyz"),("abc","abcd"),
      ("abc","ab"),("Customer#000000001","Customer#000000002")).toDF("a","b")
    df.select(col("a"), col("b"), levenshtein(col("a"), col("b")).as("full"),
        expr("levenshtein(a, b, 1)").as("t1"),
        expr("levenshtein(a, b, 2)").as("t2")).show(false)
    spark.stop()
  }
}
