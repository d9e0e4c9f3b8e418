package graft

import org.scalatest.funsuite.AnyFunSuite

/** INDEX.md is generated (tools/gen_index.py) but nothing used to
  * enforce freshness — a registration that moved or a query added
  * without regenerating left the index silently stale. This suite
  * re-runs the generator in --check mode (exit 1 + first differing
  * line when stale), so `sbt test` fails until
  * `python3 tools/gen_index.py > INDEX.md` is re-run.
  */
class IndexSpec extends AnyFunSuite {

  private def haveTool(cmd: String*): Boolean =
    try {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      p.waitFor() == 0
    } catch { case _: java.io.IOException => false }

  test("INDEX.md matches a regeneration from the query registrations") {
    assume(haveTool("python3", "--version"),
      "python3 not on PATH — cannot check index freshness here")
    val p = new ProcessBuilder("python3", "tools/gen_index.py", "--check")
      .directory(new java.io.File(sys.props.getOrElse("user.dir", ".")))
      .redirectErrorStream(true).start()
    val outText = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    assert(code == 0,
      s"INDEX.md is stale — regenerate with `python3 tools/gen_index.py > INDEX.md`:\n$outText")
  }
}
