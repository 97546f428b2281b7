package graft

import graft.functions.RecordFormats._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.{Charset, StandardCharsets}

/** Port of common/src/test/java/.../FormatTests.java round-trip harness
  * (:21-66) and the exact-bytes goldens of TrailingDelimiterFormatTest
  * (:20-53) and ByteLengthFormatTest (:11-30, values containing tabs and
  * newlines).
  */
class RecordFormatsSpec extends AnyFunSuite {

  test("trailing-delimiter: exact bytes golden, UTF-16BE 'abc\\tdef\\n'") {
    // TrailingDelimiterFormatTest.java:36-47: key 'abc', value 'def',
    // key delim TAB, value delim NL, UTF-16BE
    val f = new TrailingDelimiterFormat("\n", Some("\t"),
      Charset.forName("UTF-16BE"))
    val got = f.encode("abc", "def")
    val want = "abc\tdef\n".getBytes(Charset.forName("UTF-16BE"))
    assert(got.toSeq === want.toSeq)
  }

  test("trailing-delimiter: round trip with and without keys") {
    val withKeys = new TrailingDelimiterFormat("\n", Some("\t"))
    val recs = Seq("k1" -> "v1", "k2" -> "value two", "k3" -> "")
    val bytes = recs.flatMap { case (k, v) => withKeys.encode(k, v) }.toArray
    assert(withKeys.decodeAll(bytes) ===
      recs.map { case (k, v) => (Some(k), v) })

    val noKeys = new TrailingDelimiterFormat("\n", None)
    val b2 = recs.flatMap { case (_, v) => noKeys.encode("", v) }.toArray
    assert(noKeys.decodeAll(b2) === recs.map { case (_, v) => (None, v) })
  }

  test("trailing-delimiter: unterminated final record still decodes (EOF-tolerant)") {
    // DelimitedRecordReader.readTo returns the partial buffer at EOF
    // (DelimitedRecordReader.java:64-66) — a truncated body must not lose
    // its last record
    val noKeys = new TrailingDelimiterFormat("\n", None)
    assert(noKeys.decodeAll("a\nb".getBytes(StandardCharsets.UTF_8)) ===
      Seq((None, "a"), (None, "b")))
    assert(noKeys.decodeAll("a\nb\n".getBytes(StandardCharsets.UTF_8)) ===
      Seq((None, "a"), (None, "b")))
    assert(noKeys.decodeAll(Array.empty[Byte]) === Seq.empty)
  }

  test("trailing-delimiter: key without value is an error (decoder port)") {
    val f = new TrailingDelimiterFormat("\n", Some("\t"))
    intercept[IllegalArgumentException] {
      f.decodeAll("justakey\n".getBytes(StandardCharsets.UTF_8))
    }
  }

  test("byte-length: round trip incl. tabs/newlines in values") {
    val f = new ByteLengthFormat(includeKeys = true)
    val recs = Seq(
      Framed("k1".getBytes, "line1\nline2\twith tab".getBytes),
      Framed(Array.empty, "".getBytes),
      Framed("key-3".getBytes, Array.tabulate[Byte](256)(_.toByte)))
    val bytes = recs.flatMap(f.encode).toArray
    val got = f.decodeAll(bytes)
    assert(got.length === recs.length)
    got.zip(recs).foreach { case (g, w) =>
      assert(g.key.toSeq === w.key.toSeq)
      assert(g.value.toSeq === w.value.toSeq)
    }
  }

  test("byte-length: mid-record EOF is corrupt; boundary EOF is clean") {
    val f = new ByteLengthFormat(includeKeys = false)
    val whole = f.encode(Framed(Array.empty, "hello world".getBytes))
    // boundary EOF: exact bytes decode fine
    assert(f.decodeAll(whole).head.value.toSeq === "hello world".getBytes.toSeq)
    // mid-record EOF: truncated value (BytesRecordReader.java:92-94)
    intercept[IllegalStateException] { f.decodeAll(whole.dropRight(3)) }
    // mid-length EOF
    intercept[IllegalStateException] { f.decodeAll(whole.take(2)) }
  }

  test("UTF-16 (BOM-emitting) charset round-trips multi-record buffers") {
    // each record encodes independently so each carries its own BOM; the
    // buffer decode must consume every BOM, not just the leading one (the
    // reference decodes per record and never sees this artifact)
    val fmt = new TrailingDelimiterFormat("\n", Some("\t"),
      StandardCharsets.UTF_16)
    val buf = fmt.encode("k1", "v1") ++ fmt.encode("k2", "v2") ++ fmt.encode("k3", "v3")
    assert(fmt.decodeAll(buf) ===
      Seq((Some("k1"), "v1"), (Some("k2"), "v2"), (Some("k3"), "v3")))
  }

  test("a first record legitimately starting with U+FEFF survives BOM handling") {
    // record 0's encoder BOM is consumed by the whole-buffer charset decode,
    // so the per-record strip must skip index 0 — otherwise a first KEY that
    // genuinely begins with U+FEFF loses that character (records 1..n still
    // need their embedded encoder BOMs stripped)
    val fmt = new TrailingDelimiterFormat("\n", Some("\t"),
      StandardCharsets.UTF_16)
    val buf = fmt.encode("﻿key0", "v0") ++ fmt.encode("﻿key1", "v1")
    assert(fmt.decodeAll(buf) ===
      Seq((Some("﻿key0"), "v0"), (Some("﻿key1"), "v1")))
  }

  test("forConfig: aliases, sub-config keys, reflective class loading") {
    // default = text (Configure.java:18), no key path — and the return is
    // the TYPED RecordFormat contract, usable without a cast
    val dflt: RecordFormat = forConfig()
    assert(dflt.decodeFrames("a\nb\n".getBytes("UTF-8"))
      .map(f => new String(f.value, "UTF-8")) === Seq("a", "b"))

    // full text sub-config: the reference's own key names
    val txt = forConfig(Map("format" -> "text", "key.delimiter" -> "\t",
      "value.encoding" -> "UTF-16BE", "key.encoding" -> "UTF-16BE"))
    val enc16 = Charset.forName("UTF-16BE")
    assert(txt.encodeFrame(Framed("abc".getBytes(enc16), "def".getBytes(enc16))) ===
      "abc\tdef\n".getBytes(enc16))

    // equivalent charset SPELLINGS name one charset — accepted (canonical
    // Charset comparison, not raw config strings)
    forConfig(Map("key.delimiter" -> "\t",
      "key.encoding" -> "utf-8", "value.encoding" -> "UTF-8")): Unit

    // binary alias: include.keys defaults FALSE like the reference
    // (ByteLengthFormat.java:34-35 — `.filter(f -> f)` keeps only an
    // explicit true), so a bare format=binary writes VALUE-ONLY frames
    val binDflt = forConfig(Map("format" -> "binary"))
    val valueOnly = binDflt.encodeFrame(Framed(Array.emptyByteArray, "xyz".getBytes("UTF-8")))
    assert(valueOnly.take(4) === Array[Byte](0, 0, 0, 3))
    assert(valueOnly.length === 7) // no key-length prefix
    // explicit true adds the key frame
    val binKeys = forConfig(Map("format" -> "binary", "include.keys" -> "true"))
    assert(binKeys.encodeFrame(Framed("k".getBytes, "xyz".getBytes)).length === 4 + 1 + 4 + 3)

    // dot-scoped sub-config extraction (Configure.subKeys contract)
    assert(scoped(Map("format" -> "text", "format.key.delimiter" -> "\t",
      "other" -> "x"), "format") === Map("key.delimiter" -> "\t"))

    // the reference's own error: key encoding without a key delimiter
    val e = intercept[IllegalArgumentException] {
      forConfig(Map("key.encoding" -> "UTF-8"))
    }
    assert(e.getMessage === "Key encoding specified without delimiter!")

    // mismatched per-side encodings rejected loudly (documented narrowing)
    intercept[IllegalArgumentException] {
      forConfig(Map("key.delimiter" -> "\t",
        "key.encoding" -> "UTF-8", "value.encoding" -> "UTF-16BE"))
    }

    // reflection fallback: an FQCN implementing the RecordFormat contract
    val custom = forConfig(Map("format" -> classOf[SpecCustomFormat].getName))
    assert(custom.isInstanceOf[SpecCustomFormat])
    assert(new String(custom.decodeFrames("ab".getBytes).head.value) === "ab")
    intercept[ClassNotFoundException] {
      forConfig(Map("format" -> "com.example.NoSuchFormat"))
    }
    // an FQCN that does NOT implement RecordFormat is rejected loudly, not
    // handed back as an uncastable AnyRef
    val bad = intercept[IllegalArgumentException] {
      forConfig(Map("format" -> classOf[SpecNotAFormat].getName))
    }
    assert(bad.getMessage.contains("does not implement"))
  }
}

/** a user-supplied format class for the reflective-loading test */
class SpecCustomFormat extends RecordFormat {
  def encodeFrame(rec: Framed): Array[Byte] = rec.value
  def decodeFrames(bytes: Array[Byte]): Seq[Framed] =
    Seq(Framed(Array.emptyByteArray, bytes))
}

/** reflective loading must reject classes outside the contract */
class SpecNotAFormat
