package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate/inflate of detail blobs as native Catalyst expressions —
  * the columnar analog of the reference's zlib detail compression
  * (`src/egraph_compression_util.erl`, `src/egraph_zlib_util.erl`),
  * including the dictionary-primed variant mirroring the
  * reference's shared per-id dictionaries
  * (`models/egraph_dictionary_model.erl`).
  */
object Compression {

  def deflate(bytes: Array[Byte]): Array[Byte] = deflate(bytes, null)

  /** Dictionary-primed deflate — the reference stores shared
    * compression dictionaries per id (`egraph_compression_dict`,
    * `models/egraph_dictionary_model.erl`) so short similar blobs
    * compress well; `java.util.zip` supports the same zlib
    * dictionary mechanism. */
  def deflate(bytes: Array[Byte], dict: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    if (dict != null && dict.nonEmpty) d.setDictionary(dict)
    d.setInput(bytes); d.finish()
    val out = new ByteArrayOutputStream(math.max(32, bytes.length / 4))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  def inflate(bytes: Array[Byte]): Array[Byte] = inflate(bytes, null)

  def inflate(bytes: Array[Byte], dict: Array[Byte]): Array[Byte] = {
    val i = new Inflater()
    i.setInput(bytes)
    val out = new ByteArrayOutputStream(math.max(32, bytes.length * 4))
    val buf = new Array[Byte](8192)
    while (!i.finished()) {
      val n = i.inflate(buf)
      if (n == 0 && i.needsDictionary()) {
        require(dict != null && dict.nonEmpty, "compressed with a dictionary")
        i.setDictionary(dict)
      } else out.write(buf, 0, n)
    }
    i.end()
    out.toByteArray
  }

  case class DeflateExpr(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any = v match {
      case s: UTF8String => deflate(s.getBytes)
      case b: Array[Byte] => deflate(b)
    }
    override protected def withNewChildInternal(c: Expression): DeflateExpr = copy(c)
  }

  case class InflateExpr(child: Expression) extends UnaryExpression
      with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      inflate(v.asInstanceOf[Array[Byte]])
    override protected def withNewChildInternal(c: Expression): InflateExpr = copy(c)
  }

  private def toBytes(v: Any): Array[Byte] = v match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
  }

  case class DeflateDictExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(data: Any, dict: Any): Any =
      deflate(toBytes(data), toBytes(dict))
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DeflateDictExpr = copy(l, r)
  }

  case class InflateDictExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(data: Any, dict: Any): Any =
      inflate(data.asInstanceOf[Array[Byte]], toBytes(dict))
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): InflateDictExpr = copy(l, r)
  }
}
