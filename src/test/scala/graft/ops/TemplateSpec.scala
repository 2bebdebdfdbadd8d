package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Jinja engine semantics, mirroring the scenarios of the reference's
  * templatize tests (`tests/test_local_arrow_runner.py:824-1188`):
  * interpolation, conditionals, loops, filters (incl. the custom
  * `repr`/`drop_nulls`), constants, and error modes.
  */
class TemplateSpec extends AnyFunSuite {

  private def r(t: String, ctx: (String, Any)*): String =
    Template.render(t, ctx.toMap)

  test("plain interpolation and literal text") {
    assert(r("Hello {{name}}!", "name" -> "World") == "Hello World!")
    assert(r("no vars") == "no vars")
    assert(r("{{a}}{{b}}", "a" -> "x", "b" -> "y") == "xy")
  }

  test("numbers render like Python (ints without decimal point)") {
    assert(r("{{n}}", "n" -> 42L) == "42")
    assert(r("{{n}}", "n" -> 2.5) == "2.5")
    assert(r("{{n}}", "n" -> true) == "True")
    assert(r("{{n}}", "n" -> null) == "None")
  }

  test("attribute / index / key paths") {
    assert(r("{{m.k}}", "m" -> Map("k" -> "v")) == "v")
    assert(r("""{{m["k"]}}""", "m" -> Map("k" -> "v")) == "v")
    assert(r("{{xs[1]}}", "xs" -> Seq("a", "b")) == "b")
  }

  test("if / elif / else with comparisons and boolean ops") {
    val t = "{% if x > 3 %}big{% elif x > 1 %}mid{% else %}small{% endif %}"
    assert(r(t, "x" -> 5L) == "big")
    assert(r(t, "x" -> 2L) == "mid")
    assert(r(t, "x" -> 0L) == "small")
    assert(r("{% if a and not b %}Y{% endif %}", "a" -> true, "b" -> false) == "Y")
    assert(r("{% if s == 'hit' %}Y{% else %}N{% endif %}", "s" -> "hit") == "Y")
  }

  test("python truthiness: empty string/seq/zero are falsy") {
    val t = "{% if v %}T{% else %}F{% endif %}"
    assert(r(t, "v" -> "") == "F")
    assert(r(t, "v" -> Seq.empty) == "F")
    assert(r(t, "v" -> 0L) == "F")
    assert(r(t, "v" -> "x") == "T")
    assert(r(t, "v" -> null) == "F")
  }

  test("for loops") {
    assert(r("{% for x in xs %}[{{x}}]{% endfor %}", "xs" -> Seq(1L, 2L, 3L))
      == "[1][2][3]")
    assert(r("{% for x in xs %}{{x.k}}{% endfor %}",
      "xs" -> Seq(Map("k" -> "a"), Map("k" -> "b"))) == "ab")
  }

  test("standard filters") {
    assert(r("{{s|upper}}", "s" -> "abc") == "ABC")
    assert(r("{{s|lower}}", "s" -> "AbC") == "abc")
    assert(r("{{s|trim}}", "s" -> " x ") == "x")
    assert(r("{{xs|length}}", "xs" -> Seq(1L, 2L)) == "2")
    assert(r("{{xs|join(\", \")}}", "xs" -> Seq("a", "b")) == "a, b")
    assert(r("{{xs|first}}-{{xs|last}}", "xs" -> Seq("a", "b", "c")) == "a-c")
    // jinja2 default: fires for MISSING variables only — a present None is
    // defined and renders 'None'; boolean=true extends it to falsy values
    assert(r("{{v|default(\"dflt\")}}") == "dflt")
    assert(r("{{v|default(\"dflt\")}}", "v" -> null) == "None")
    assert(r("{{v|default(\"dflt\")}}", "v" -> "set") == "set")
    assert(r("{{v|default(\"dflt\", true)}}", "v" -> null) == "dflt")
    assert(r("{{v|default(\"dflt\", true)}}", "v" -> "") == "dflt")
    assert(r("{{v|default(\"dflt\", true)}}", "v" -> "set") == "set")
    // other filters applied to an undefined variable see str(Undefined) = ""
    assert(r("[{{nope|upper}}]") == "[]")
  }

  test("custom filter: repr (Python repr semantics)") {
    assert(r("{{s|repr}}", "s" -> "it's") == "\"it's\"")
    assert(r("{{s|repr}}", "s" -> "plain") == "'plain'")
    assert(r("{{n|repr}}", "n" -> 3L) == "3")
    assert(r("{{xs|repr}}", "xs" -> Seq("a", 1L)) == "['a', 1]")
    assert(r("{{m|repr}}", "m" -> Map("k" -> "v")) == "{'k': 'v'}")
  }

  test("custom filter: drop_nulls") {
    assert(r("{{xs|drop_nulls|length}}", "xs" -> Seq("a", null, "b")) == "2")
    assert(r("{{xs|drop_nulls|join(\",\")}}", "xs" -> Seq(null, "x")) == "x")
  }

  test("int/float/title filters (reference test templates use them)") {
    // reference `tests/test_local_arrow_runner.py:873`: {% if score|int >= 90 %}
    val t = "{{name}} scored {{score}}{% if score|int >= 90 %} - Excellent!" +
      "{% elif score|int >= 80 %} - Good job!{% else %} - Keep trying!{% endif %}"
    assert(r(t, "name" -> "A", "score" -> "95") == "A scored 95 - Excellent!")
    assert(r(t, "name" -> "B", "score" -> "85") == "B scored 85 - Good job!")
    assert(r(t, "name" -> "C", "score" -> "12") == "C scored 12 - Keep trying!")
    assert(r("{{v|int}}", "v" -> "oops") == "0")
    assert(r("{{v|float}}", "v" -> "2.5") == "2.5")
    // reference `:955`: {{words|title}} ... "{{words|upper}}"
    assert(r("""{{w|title}} has {{n|length}} digits. Original: "{{w|upper}}"""",
      "w" -> "hello world", "n" -> "12345")
      == """Hello World has 5 digits. Original: "HELLO WORLD"""")
  }

  test("filter chains") {
    assert(r("{{s|trim|upper}}", "s" -> " hi ") == "HI")
  }

  test("missing variables render empty (jinja2 default-undefined behavior)") {
    assert(r("[{{nope}}]") == "[]")
  }

  test("syntax errors throw") {
    intercept[IllegalArgumentException](Template.compile("{% if x %}unclosed"))
    intercept[IllegalArgumentException](Template.compile("{% endfor %}"))
    intercept[IllegalArgumentException](Template.compile("{% bogus %}{% endbogus %}"))
  }

  test("string methods + loop variable (the reference's own test template)") {
    // reference `tests/test_local_arrow_runner.py:900`
    val t = "{{category}}: {% for item in items.split(',') %}{{item.strip()}}" +
      "{% if not loop.last %}, {% endif %}{% endfor %}"
    assert(r(t, "category" -> "fruits", "items" -> " apple , banana ,cherry ")
      == "fruits: apple, banana, cherry")
  }

  test("python string method semantics") {
    assert(r("{{s.split(\",\")|length}}", "s" -> "a,,b") == "3") // keeps empties
    assert(r("{{s.split()|length}}", "s" -> "  a   b  ") == "2") // ws split drops
    assert(r("{{s.replace(\"a\",\"o\")}}", "s" -> "banana") == "bonono")
    assert(r("{% if s.startswith(\"ab\") %}Y{% endif %}", "s" -> "abc") == "Y")
    assert(r("{{s.upper().strip()}}", "s" -> " hi ") == "HI")
    intercept[IllegalArgumentException](r("{{s.bogus()}}", "s" -> "x"))
  }

  test("loop index/first/length") {
    assert(r("{% for x in xs %}{{loop.index}}:{{x}}{% if loop.first %}!{% endif %} {% endfor %}",
      "xs" -> Seq("a", "b")) == "1:a! 2:b ")
    assert(r("{% for x in xs %}{{loop.length}}{% endfor %}", "xs" -> Seq("a", "b")) == "22")
  }

  test("conversation-shaped context (list of role/content maps)") {
    val conv = Seq(
      Map("role" -> "user", "content" -> "hi"),
      Map("role" -> "assistant", "content" -> "hello"))
    val t = "{% for m in conv %}{{m.role}}: {{m.content}}\n{% endfor %}"
    assert(r(t, "conv" -> conv) == "user: hi\nassistant: hello\n")
  }
}
