package graft.queue

/** Minimal deterministic JSON encoder for event maps — the engine's analog
  * of the reference's `json.Marshal` calls (`/root/reference/main.go:202`
  * for per-item sizing, `main.go:267` for whole-batch payloads).
  *
  * Go's `json.Marshal` emits map keys in sorted order, which makes item
  * sizes and payloads deterministic; this encoder mirrors that (sorted
  * keys, no whitespace, standard string escaping). Numbers render like Go:
  * integral doubles without a trailing `.0`.
  */
object Json {
  def encode(v: Any): String = v match {
    case null => "null"
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => s"${str(k)}:${encode(x)}" }
        .mkString("{", ",", "}")
    case xs: Seq[_]  => xs.map(encode).mkString("[", ",", "]")
    case s: String   => str(s)
    case b: Boolean  => b.toString
    case d: Double   =>
      // Go's json.Marshal errors on non-finite floats
      // (json.UnsupportedValueError); rendering a bare NaN/Infinity token
      // would silently corrupt the whole batch payload instead.
      if (d.isNaN || d.isInfinite)
        throw new IllegalArgumentException(s"json: unsupported value: $d")
      else if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case f: Float    => encode(f.toDouble)
    case n: Number   => n.toString
    case other       => str(other.toString)
  }

  private def str(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Byte length of the encoded value — the sizing used for batch-threshold
    * accounting (`main.go:202-203`). */
  def byteSize(v: Any): Long = encode(v).getBytes("UTF-8").length.toLong
}
