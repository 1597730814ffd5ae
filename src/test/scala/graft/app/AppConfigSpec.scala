package graft.app

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class AppConfigSpec extends AnyFunSuite {

  test("parses KEY=VALUE, comments, quotes; env wins over file") {
    val f = Files.createTempFile("env", "")
    Files.writeString(f,
      """# comment
        |API_KEY = "secret"
        |DATASET='ds1'
        |EMPTY=
        |BROKEN LINE
        |PROJECT=p1
        |""".stripMargin)
    val c = AppConfig.load(f.toString, env = Map("PROJECT" -> "from-env"))
    assert(c.get("API_KEY").contains("secret"))
    assert(c.get("DATASET").contains("ds1"))
    assert(c.get("EMPTY").contains(""))
    assert(c.get("BROKEN").isEmpty)
    assert(c.get("PROJECT").contains("from-env")) // env precedence
    assert(c.getOrElse("MISSING", "d") == "d")
    intercept[IllegalArgumentException] { c.require("MISSING") }
  }

  test("missing file loads as empty config") {
    val c = AppConfig.load("/nonexistent/.env", env = Map("X" -> "1"))
    assert(c.get("X").contains("1") && c.get("Y").isEmpty)
  }
}
