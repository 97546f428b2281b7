package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.Charset

/** Record codecs — ports of the reference's pluggable `S3RecordFormat`s
  * (api/.../S3RecordFormat.java:7-41):
  *
  *   - [[TrailingDelimiterFormat]] ↔ common/.../TrailingDelimiterFormat.java:20-64
  *     `[key][keyDelim][value][valueDelim]`, configurable charsets
  *   - [[ByteLengthFormat]] ↔ common/.../ByteLengthFormat.java:43-56 +
  *     BytesRecordReader.java:34-94: optional `[keyLen:int4][key]` then
  *     `[valLen:int4][value]`, big-endian; mid-record EOF ⇒ corrupt
  *
  * In the Spark engine these are plain Scala used inside typed `map` /
  * `mapPartitions` at the source/sink byte boundary (parquet carries typed
  * columns everywhere else, so the codecs only matter for interop with the
  * reference's file bodies). Formats are VALUES, not class names, as the
  * primary API — but [[RecordFormats.forConfig]] adds the reference's
  * config-name boundary on top (Configure.createFormat,
  * common/.../Configure.java:115-135) so a properties-file-driven
  * deployment ports unchanged.
  */
object RecordFormats {

  final case class Framed(key: Array[Byte], value: Array[Byte])

  /** The record-codec contract — the role of the reference's
    * `S3RecordFormat` interface (api/.../S3RecordFormat.java:7-41): encode a
    * framed byte record to its wire bytes, decode a full buffer back. OPEN
    * (not sealed) exactly like the reference's public interface: the
    * reflective-FQCN path of [[RecordFormats.forConfig]] requires
    * user-supplied classes to implement it, which is what types the registry
    * boundary — call sites get a usable codec, never an `AnyRef` to cast.
    */
  trait RecordFormat extends Serializable {
    def encodeFrame(rec: Framed): Array[Byte]
    def decodeFrames(bytes: Array[Byte]): Seq[Framed]
  }

  /** the reference's built-in aliases (Configure.java:20-23) */
  val FormatAliases: Map[String, String] = Map(
    "text" -> classOf[TrailingDelimiterFormat].getName,
    "binary" -> classOf[ByteLengthFormat].getName)

  /** Dot-scoped sub-configuration, the Configure.subKeys contract
    * (Configure.java:79-88): keys under `prefix.` with the prefix stripped.
    */
  def scoped(props: Map[String, String], prefix: String): Map[String, String] =
    props.collect { case (k, v) if k.startsWith(prefix + ".") =>
      k.substring(prefix.length + 1) -> v
    }

  /** Config-name format construction — the analogue of
    * Configure.createFormat (Configure.java:115-135): `format` = "text" |
    * "binary" | a fully-qualified class name loaded reflectively (zero-arg
    * constructor), defaulting to text like the reference's DEFAULT_FORMAT
    * (Configure.java:18). Pass the format's SUB-config (the reference's
    * dot-scoped keys, already stripped via [[scoped]]):
    * `value.delimiter` / `key.delimiter` / `value.encoding` /
    * `key.encoding` (TrailingDelimiterFormat.java:27-40; key encoding
    * without a key delimiter fails with the reference's own message) and
    * `include.keys` (default FALSE — the reference's
    * `.filter(f -> f)` treats anything but an explicit `true` as absent,
    * ByteLengthFormat.java:34-35, so an unset key writes value-only frames;
    * defaulting to true here would write key-length-prefixed frames that a
    * reference-written archive cannot parse). One deliberate narrowing:
    * mismatched key/value encodings are rejected loudly — the engine's
    * buffer decode is single-charset, and silent per-side charset drift is
    * worse than an upfront error. Comparison is by CANONICAL charset
    * (`Charset.forName`), so `utf-8` vs `UTF-8` — or any alias pair naming
    * one charset — is accepted.
    */
  def forConfig(props: Map[String, String] = Map.empty): RecordFormat = {
    val className = {
      val name = props.getOrElse("format", "text")
      FormatAliases.getOrElse(name, name)
    }
    if (className == classOf[TrailingDelimiterFormat].getName) {
      if (props.contains("key.encoding") && !props.contains("key.delimiter"))
        throw new IllegalArgumentException("Key encoding specified without delimiter!")
      val vEnc = props.getOrElse("value.encoding", "UTF-8")
      val kEnc = props.getOrElse("key.encoding", vEnc)
      require(Charset.forName(kEnc) == Charset.forName(vEnc),
        s"key.encoding '$kEnc' != value.encoding '$vEnc' — the buffer decode " +
          "is single-charset; re-encode upstream or use the binary format")
      new TrailingDelimiterFormat(props.getOrElse("value.delimiter", "\n"),
        props.get("key.delimiter"), Charset.forName(vEnc))
    } else if (className == classOf[ByteLengthFormat].getName) {
      new ByteLengthFormat(props.get("include.keys").exists(_.toBoolean))
    } else {
      Class.forName(className).getDeclaredConstructor().newInstance() match {
        case f: RecordFormat => f
        case _ => throw new IllegalArgumentException(
          s"format class $className does not implement " +
            s"${classOf[RecordFormat].getName} — the registry's typed " +
            "contract (the reference's S3RecordFormat role)")
      }
    }
  }

  /** Text format with trailing delimiters; key emitted only when a key
    * delimiter is configured (TrailingDelimiterFormat.java:51-52).
    */
  final class TrailingDelimiterFormat(
      valueDelimiter: String = "\n",
      keyDelimiter: Option[String] = None,
      charset: Charset = java.nio.charset.StandardCharsets.UTF_8)
    extends RecordFormat {

    // Charset itself is not Serializable: ship the NAME in the task closure
    // and resolve it per JVM, so a format value can ride a typed map/flatMap
    // to executors (its documented use)
    private val charsetName: String = charset.name()
    @transient private lazy val cs: Charset = Charset.forName(charsetName)

    def encode(key: String, value: String): Array[Byte] = {
      val sb = new StringBuilder
      keyDelimiter.foreach { kd => sb.append(key).append(kd) }
      sb.append(value).append(valueDelimiter)
      sb.toString.getBytes(cs)
    }

    // the typed-registry contract over framed BYTES — key/value bytes are
    // text in this format's charset (the reference's text format makes the
    // same assumption: TrailingDelimiterFormat.java:42-49 decodes record
    // bytes through its configured encoding)
    def encodeFrame(rec: Framed): Array[Byte] =
      encode(new String(rec.key, cs), new String(rec.value, cs))
    def decodeFrames(bytes: Array[Byte]): Seq[Framed] =
      decodeAll(bytes).map { case (k, v) =>
        Framed(k.fold(Array.emptyByteArray)(_.getBytes(cs)), v.getBytes(cs))
      }

    /** decode a full buffer of concatenated records. EOF-tolerant like the
      * reference: a trailing UNTERMINATED value is still a record
      * (DelimitedRecordReader.readTo returns the partial buffer at EOF,
      * DelimitedRecordReader.java:64-66) — only the empty tail after a
      * well-terminated final record is dropped.
      */
    // BOM-emitting charsets (plain UTF-16) prefix EVERY record's bytes with
    // a BOM because records encode independently; decoding the concatenated
    // buffer as one string consumes only the first, leaving U+FEFF embedded
    // in records 2..n. The reference decodes each record's bytes separately
    // (so each BOM is consumed); we match that by stripping a leading BOM
    // per record — only for charsets that actually emit one.
    @transient private lazy val emitsBom: Boolean = {
      // probe with a real char: the encoder emits its BOM lazily with the
      // first character, so an empty-string probe would miss it
      val b = "x".getBytes(cs)
      b.length >= 2 &&
        ((b(0) == 0xFE.toByte && b(1) == 0xFF.toByte) ||
          (b(0) == 0xFF.toByte && b(1) == 0xFE.toByte))
    }

    def decodeAll(bytes: Array[Byte]): Seq[(Option[String], String)] = {
      val text = new String(bytes, cs)
      val split = text.split(java.util.regex.Pattern.quote(valueDelimiter), -1).toSeq
      val records0 = if (split.lastOption.contains("")) split.dropRight(1) else split
      val records =
        if (!emitsBom) records0
        else records0.zipWithIndex.map { case (r, i) =>
          // record 0's encoder BOM was already consumed by the charset
          // decoder of the WHOLE buffer \u2014 stripping there would eat a first
          // record whose content legitimately begins with U+FEFF (the
          // reference's per-record decode preserves it); only records 1..n
          // still carry their embedded encoder BOMs
          if (i > 0 && r.nonEmpty && r.charAt(0) == '\uFEFF') r.substring(1) else r
        }
      records.map { r =>
        keyDelimiter match {
          case None => (None, r)
          case Some(kd) =>
            val i = r.indexOf(kd)
            if (i < 0) throw new IllegalArgumentException(
              s"missing value after key in record '$r'") // DelimitedRecordReader.java:69-73
            (Some(r.substring(0, i)), r.substring(i + kd.length))
        }
      }
    }
  }

  /** Length-prefixed binary format, big-endian int4 lengths. */
  final class ByteLengthFormat(includeKeys: Boolean) extends RecordFormat {

    def encodeFrame(rec: Framed): Array[Byte] = encode(rec)
    def decodeFrames(bytes: Array[Byte]): Seq[Framed] = decodeAll(bytes)

    def encode(rec: Framed): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val d = new DataOutputStream(out)
      if (includeKeys) { d.writeInt(rec.key.length); d.write(rec.key) }
      d.writeInt(rec.value.length)
      d.write(rec.value)
      out.toByteArray
    }

    /** decode a full buffer; EOF at a record boundary ends cleanly, EOF
      * mid-record is corrupt (BytesRecordReader.java:92-94)
      */
    def decodeAll(bytes: Array[Byte]): Seq[Framed] = {
      val (records, consumed) = decodeUpTo(bytes, Long.MaxValue)
      if (consumed != bytes.length) throw corrupt(consumed)
      records
    }

    /** decode at most `maxRecords` records; returns (records, bytesConsumed)
      * — the bounded form an archive chunk read needs, where bytes past the
      * declared record count are format TRAILER, not corruption
      */
    def decodeUpTo(bytes: Array[Byte], maxRecords: Long): (Seq[Framed], Int) = {
      val buf = ByteBuffer.wrap(bytes)
      val out = Seq.newBuilder[Framed]
      var n = 0L
      def readChunk(): Array[Byte] = {
        if (buf.remaining() < 4) throw corrupt(buf.position())
        val len = buf.getInt
        if (len < 0 || buf.remaining() < len) throw corrupt(buf.position())
        val a = new Array[Byte](len)
        buf.get(a)
        a
      }
      while (buf.hasRemaining && n < maxRecords) {
        val key = if (includeKeys) readChunk() else Array.empty[Byte]
        out += Framed(key, readChunk())
        n += 1
      }
      (out.result(), buf.position())
    }

    private def corrupt(at: Int) =
      new IllegalStateException(s"Corrupt record at byte $at")
  }
}
