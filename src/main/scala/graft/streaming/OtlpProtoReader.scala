package graft.streaming

/** Verification-side protobuf wire-format reader, written independently
  * of [[OtlpProto]]'s writer so round trips actually pin
  * byte-compatibility (a shared codec would vacuously agree with
  * itself). Consumers: the StreamingSpec wire round-trip AND the
  * q487 oracle-gate row, which exports through [[OtelSink]], decodes
  * the captured OTLP bytes with THIS reader, and hash-matches the
  * decoded frame against a DuckDB oracle of the expected rows.
  */
object OtlpProtoReader {

  /** Decode all top-level fields: (fieldNo, wireType, varint-or-bytes). */
  private def fields(b: Array[Byte]): Seq[(Int, Int, Either[Long, Array[Byte]])] = {
    val out = Seq.newBuilder[(Int, Int, Either[Long, Array[Byte]])]
    var i = 0
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({ val x = b(i) & 0xff; i += 1
        v |= (x & 0x7fL) << shift; shift += 7; (x & 0x80) != 0 }) ()
      v
    }
    while (i < b.length) {
      val key = varint()
      val (field, wire) = ((key >>> 3).toInt, (key & 7).toInt)
      wire match {
        case 0 => out += ((field, 0, Left(varint())))
        case 1 =>
          val v = java.nio.ByteBuffer.wrap(b, i, 8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
          i += 8; out += ((field, 1, Left(v)))
        case 2 =>
          val len = varint().toInt
          out += ((field, 2, Right(b.slice(i, i + len)))); i += len
        case 5 =>
          val v = java.nio.ByteBuffer.wrap(b, i, 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong
          i += 4; out += ((field, 5, Left(v)))
        case w => throw new IllegalArgumentException(s"wire type $w")
      }
    }
    out.result()
  }

  def messages(b: Array[Byte], field: Int): Seq[Array[Byte]] =
    fields(b).collect { case (`field`, 2, Right(bytes)) => bytes }
  def firstMessage(b: Array[Byte], field: Int): Array[Byte] =
    messages(b, field).head
  def firstBytes(b: Array[Byte], field: Int): Array[Byte] =
    firstMessage(b, field)
  def firstFixed64(b: Array[Byte], field: Int): Long =
    fields(b).collectFirst { case (`field`, 1, Left(v)) => v }.get

  /** Repeated KeyValue{key=1, value=2 AnyValue{string_value=1}} -> Map. */
  def keyValues(b: Array[Byte], field: Int): Map[String, String] =
    messages(b, field).map { kv =>
      val k = new String(firstBytes(kv, 1), "UTF-8")
      val v = new String(firstBytes(firstMessage(kv, 2), 1), "UTF-8")
      k -> v
    }.toMap
}
