package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import graft.expressions.Md5Hash60

/** Session extensions: register graft's native expressions on the SQL
  * surface (`SELECT graft_md5hash60(x)`), so plain-SQL users get the same
  * codegen'd primitives the Column API uses.
  *
  * Activate with:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_md5hash60"),
      Md5Hash60.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Hash60(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dotq"),
      graft.expressions.ArrayDotProduct.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.ArrayDotProduct(children(0), children(1))))
  }
}
