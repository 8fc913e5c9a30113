"""Go chunker parity suite — ports of reference handler/go_test.go:13-350.

Every case mirrors a Go test: empty/invalid error paths, package-only,
package+imports header, simple function, type definition, const/var
grouping, the complete 6-chunk example, and doc-comment attachment —
plus scanner cases the old line-regex chunker got wrong (multi-line
signatures, braces inside raw strings, grouped type specs)."""

import pytest

from go_light_rag_ray.stages.gochunk import GoParseError, chunk_go


def contents(chunks):
    return [c for c, _, _ in chunks]


def test_empty_content_errors():       # go_test.go:21-24
    with pytest.raises(GoParseError):
        chunk_go("")


def test_invalid_go_errors():          # go_test.go:25-28
    with pytest.raises(GoParseError):
        chunk_go("this is not valid Go code")


def test_package_only():               # go_test.go:29-51
    chunks = chunk_go("package example")
    assert len(chunks) == 1
    assert chunks[0][0] == "package example"
    assert chunks[0][2] == 0


def test_package_and_imports():        # go_test.go:52-74
    src = 'package example\n\nimport (\n\t"fmt"\n\t"strings"\n)'
    chunks = chunk_go(src)
    assert len(chunks) == 1
    assert "import" in chunks[0][0]
    assert '"strings"' in chunks[0][0]
    assert ")" in chunks[0][0]  # importEnd+1 captures the closing paren


def test_simple_function():            # go_test.go:75-110
    src = "package example\n\nfunc Add(a, b int) int {\n\treturn a + b\n}"
    chunks = chunk_go(src)
    assert len(chunks) == 2
    assert "package example" in chunks[0][0]
    assert "func Add" in chunks[1][0]
    assert chunks[1][0].startswith("package example\n\n")
    assert [c[2] for c in chunks] == [0, 1]


def test_type_definition():            # go_test.go:111-149
    src = "package example\n\ntype Person struct {\n\tName string\n\tAge  int\n}"
    chunks = chunk_go(src)
    assert len(chunks) == 2
    assert "type Person struct" in chunks[1][0]
    for c, _, _ in chunks:
        assert "package example" in c


def test_constants_and_variables():    # go_test.go:150-200
    src = ('package example\n\nconst (\n\tMaxAge = 120\n\tMinAge = 0\n)\n\n'
           'var DefaultName = "Anonymous"')
    chunks = chunk_go(src)
    assert len(chunks) == 3
    assert any("const (" in c for c in contents(chunks))
    assert any("var DefaultName" in c for c in contents(chunks))
    for c in contents(chunks):
        assert "package example" in c


def test_complete_example():           # go_test.go:201-276
    src = '''package example

import (
\t"fmt"
\t"strings"
)

const (
\tDefaultPrefix = "User-"
)

var MaxUserCount = 100

type User struct {
\tID   int
\tName string
}

func (u *User) FullName() string {
\treturn DefaultPrefix + u.Name
}

func CreateUser(name string) User {
\treturn User{
\t\tName: name,
\t}
}'''
    chunks = chunk_go(src)
    # header+imports, const, var, type, method, function
    assert len(chunks) == 6
    assert [c[2] for c in chunks] == list(range(6))
    for key in ("import", "const", "var MaxUserCount", "type User struct",
                "func (u *User)", "func CreateUser"):
        assert any(key in c for c in contents(chunks)), key
    for c in contents(chunks):
        assert "package example" in c


def test_doc_comments_travel_with_function():  # go_test.go:283-327
    src = ('package example\n\n'
           '// Add adds two integers and returns the result\n'
           '// It demonstrates basic addition\n'
           'func Add(a, b int) int {\n\treturn a + b\n}')
    chunks = chunk_go(src)
    assert len(chunks) == 2
    assert "Add adds two integers" in chunks[1][0]
    # Doc.Text() strips the // markers (go.go:92-95 + comment.Text())
    assert "// Add adds" not in chunks[1][0]


def test_const_var_do_not_carry_doc_comments():
    """go.go:135-155 reads no d.Doc for const/var — the reference's
    asymmetry, reproduced."""
    src = ('package example\n\n'
           '// MaxAge is the maximum age\n'
           'const MaxAge = 120')
    chunks = chunk_go(src)
    assert len(chunks) == 2
    assert "MaxAge is the maximum" not in chunks[1][0]
    assert "const MaxAge" in chunks[1][0]


def test_grouped_type_specs_emit_per_spec():
    """go.go:112 ``for range d.Specs`` emits the whole group once per
    spec."""
    src = "package example\n\ntype (\n\tA int\n\tB string\n)"
    chunks = chunk_go(src)
    assert len(chunks) == 3  # header + 2 identical type chunks
    assert chunks[1][0] == chunks[2][0]
    assert "type (" in chunks[1][0]


def test_multiline_signature_and_nested_braces():
    """The scanner handles what a line regex cannot: a signature spanning
    lines and composite literals with nested braces."""
    src = ('package example\n\n'
           'func Configure(\n'
           '\tname string,\n'
           '\topts map[string]int,\n'
           ') map[string]int {\n'
           '\treturn map[string]int{\n'
           '\t\t"a": 1,\n'
           '\t}\n'
           '}')
    chunks = chunk_go(src)
    assert len(chunks) == 2
    assert chunks[1][0].count("func Configure") == 1
    assert chunks[1][0].rstrip().endswith("}")


def test_braces_inside_raw_string_do_not_split():
    src = ('package example\n\n'
           'var tmpl = `{{if .X}} } { {{end}}`\n\n'
           'func F() int {\n\treturn 1\n}')
    chunks = chunk_go(src)
    assert len(chunks) == 3
    assert any("var tmpl" in c for c in contents(chunks))
    assert any("func F()" in c for c in contents(chunks))


def test_unbalanced_braces_error():
    with pytest.raises(GoParseError):
        chunk_go("package example\n\nfunc Broken() {\n\treturn 1\n")


def test_handler_router_dispatches_go(ray_session):
    import pyarrow as pa
    import ray.data

    from go_light_rag_ray.stages.chunker import ChunkerConfig
    from go_light_rag_ray.stages.handlers import HandlerChunker

    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1],
        "text": ["package example\n\nfunc Add(a, b int) int {\n\treturn a + b\n}"],
        "doc_kind": ["go"],
    }))
    rows = docs.map_batches(
        HandlerChunker,
        fn_constructor_kwargs={"config": ChunkerConfig(content_mode="text")},
        batch_format="pyarrow", concurrency=1,
    ).take_all()
    assert len(rows) == 2
    assert rows[1]["content"].startswith("package example\n\nfunc Add")
