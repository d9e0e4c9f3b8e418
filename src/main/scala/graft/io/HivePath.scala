package graft.io

/** Percent-decoding for partition directory names — shared by every
  * code path that turns an on-disk `col=value` segment (Hive path
  * escaping: special characters written as `%XX`) or a URI string
  * from `input_file_name()` (standard URI percent-encoding) back into
  * the value or the on-disk name.
  *
  * `java.net.URLDecoder` is the WRONG tool for both: it implements
  * form decoding, where `'+'` means space — but neither Hive path
  * escaping nor URI path encoding ever writes a space as `'+'`, so a
  * literal `'+'` in a partition value would be silently corrupted
  * into a space (and a retention/purge predicate would then decide
  * the wrong partition). This decoder handles ONLY `%XX` sequences:
  *
  *   - consecutive `%XX` bytes are decoded as one UTF-8 sequence
  *     (URI encoding writes non-ASCII as multi-byte runs; Hive only
  *     ever escapes ASCII, for which byte==char, so one decoder
  *     serves both producers);
  *   - `'+'` and every other character pass through untouched;
  *   - a `'%'` not followed by two hex digits is kept literal rather
  *     than thrown on — matching Hive's unescapePathName leniency,
  *     and safe because neither producer emits bare `'%'`.
  */
private[graft] object HivePath {

  private def hex(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  private def isEscape(s: String, i: Int): Boolean =
    s.charAt(i) == '%' && i + 2 < s.length &&
      hex(s.charAt(i + 1)) >= 0 && hex(s.charAt(i + 2)) >= 0

  def percentDecode(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      if (isEscape(s, i)) {
        out.write(hex(s.charAt(i + 1)) * 16 + hex(s.charAt(i + 2)))
        i += 3
      } else {
        // non-%XX characters round-trip through UTF-8 bytes so mixed
        // literal/encoded strings reassemble correctly. The whole RUN
        // of consecutive literal chars is encoded in one getBytes call
        // — char-at-a-time encoding would split surrogate PAIRS
        // (non-BMP characters, e.g. an emoji in a partition value:
        // Hive escapes only ASCII, non-ASCII stays literal in the
        // directory name) into lone surrogates, each of which encodes
        // to '?' and corrupts the value.
        var j = i + 1
        while (j < s.length && !isEscape(s, j)) j += 1
        out.write(s.substring(i, j)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        i = j
      }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }
}
