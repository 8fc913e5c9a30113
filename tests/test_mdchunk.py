"""MarkdownAst chunker parity — ports of reference handler/markdown_test.go.

Each test mirrors a Go case: empty, single-chunk, headings, protected code
blocks and tables, lists, custom char sizes, unicode preservation,
sentence-boundary chunking, abbreviation/decimal guards — plus the
OrderIndex=StartPos quirk and the word-boundary last resort."""

from go_light_rag_ray.stages.mdchunk import (
    ChunkingOptions,
    chunk_markdown_ast,
    has_actual_content,
)


def texts(chunks):
    return [c for c, _, _ in chunks]


def test_empty_content():                       # markdown_test.go:23-26
    assert chunk_markdown_ast("") == []


def test_small_content_single_chunk():          # markdown_test.go:28-37
    s = "This is a small text that should fit in a single chunk."
    chunks = chunk_markdown_ast(s)
    assert len(chunks) == 1
    assert chunks[0][0] == s
    assert chunks[0][2] == 0  # OrderIndex = StartPos


def test_headings_sections():                   # markdown_test.go:39-68
    content = (
        "# Main Title\n\nThis is the introduction paragraph.\n\n"
        "## Section 1\n\n"
        + "Content for section 1 with multiple sentences. " * 30 + "\n\n"
        "## Section 2\n\n"
        + "Content for section 2 has multiple sentences too. " * 30
    )
    chunks = chunk_markdown_ast(content)
    assert len(chunks) >= 2
    assert any("# Main Title" in t for t in texts(chunks))
    # order indices are char start positions → strictly increasing
    orders = [o for _, _, o in chunks]
    assert orders == sorted(orders)


def test_code_blocks_are_preserved():           # markdown_test.go:70-107
    code = ("```go\nfunc main() {\n"
            + '    fmt.Println("Hello, World!")\n' * 25
            + "    for i := 0; i < 10; i++ {\n        fmt.Println(i)\n    }\n}\n```")
    content = ("# Code Example\n\nHere is some code:\n\n" + code + "\n\n"
               + "And some text after the code block. " * 30)
    chunks = chunk_markdown_ast(content)
    holder = [t for t in texts(chunks) if "func main()" in t]
    assert holder, "code block missing from all chunks"
    assert "fmt.Println(i)" in holder[0], "code block split inappropriately"


def test_tables_are_preserved():                # markdown_test.go:109-140
    table = ("| Name | Age | City |\n|------|-----|------|\n"
             + "".join(f"| P{i:03d} | {20 + i % 50}  | NYC  |\n" for i in range(30)))
    content = ("# Data Table\n\nintro paragraph here. " * 20 + "\n\n"
               + table + "\n\n" + "Some text after the table. " * 40)
    chunks = chunk_markdown_ast(content)
    holder = [t for t in texts(chunks) if "| Name | Age | City |" in t]
    assert holder, "table missing from all chunks"
    assert "| P029 |" in holder[0], "table split inappropriately"


def test_lists_are_handled():                   # markdown_test.go:142-171
    content = ("# Todo List\n\nHere are my tasks:\n\n"
               "- Task 1: Complete the project\n"
               "- Task 2: Review documentation\n"
               "  - Subtask 2.1: Check formatting\n"
               "- Task 3: Submit for review\n\nEnd of list.")
    chunks = chunk_markdown_ast(content)
    assert any("- Task 1:" in t for t in texts(chunks))


def test_large_content_custom_chunk_size():     # markdown_test.go:173-194
    content = "This sentence contains about nine tokens. " * 200
    opts = ChunkingOptions(max_chunk_size=500, min_chunk_size=100,
                           overlap_size=20)
    chunks = chunk_markdown_ast(content, opts)
    assert len(chunks) >= 2
    # the algorithm's true bound: max + tail-merge slack (< min_chunk_size
    # + separator, markdown.go:822-830) + stitched overlap prefix (≤ 21)
    for t in texts(chunks):
        assert len(t) <= 500 + 100 + 1 + 21, len(t)
    # all but the final (tail-merged) chunk honor max + overlap exactly
    for t in texts(chunks)[:-1]:
        assert len(t) <= 500 + 21, len(t)


def test_unicode_preserved():                   # markdown_test.go:196-209
    content = ("Special characters: 🚀 😊 üñîçødé\nNew lines\tTabs中文日本語"
               "\n\n# Header with émojis 🎉")
    chunks = chunk_markdown_ast(content)
    assert len(chunks) == 1
    for needle in ("🚀", "üñîçødé", "中文", "🎉"):
        assert needle in chunks[0][0]


def test_sentence_boundary_chunking():          # markdown_test.go:211-247
    content = ("This is the first sentence in this test case. " * 10
               + "This is the second sentence that should not be split. " * 10
               + "This is the third sentence with proper punctuation! " * 10
               + "Finally, this is the last sentence in this long text? " * 10)
    opts = ChunkingOptions(max_chunk_size=200, min_chunk_size=50,
                           overlap_size=10)
    chunks = chunk_markdown_ast(content, opts)
    assert len(chunks) >= 2
    for i, t in enumerate(texts(chunks)):
        if i != len(chunks) - 1:
            assert t[-1] in ".!?", repr(t[-60:])


def test_abbreviations_and_decimals_guard():    # markdown_test.go:249-...
    content = ("Dr. Smith lives at 123 Main St. He has a 3.14159 acre "
               "property. Mrs. Johnson lives next door. The property is "
               "worth $1.5 million dollars.")
    opts = ChunkingOptions(max_chunk_size=80, min_chunk_size=20)
    chunks = chunk_markdown_ast(content, opts)
    # "Dr." / "St." / "Mrs." / "3.14159" must not start a new chunk
    for t in texts(chunks):
        assert not t.startswith(("Smith", "He has", "Johnson"))
    joined = " ".join(texts(chunks))
    assert "3.14159 acre" in joined


def test_word_boundary_last_resort():
    content = "word " * 800  # no sentence punctuation, no paragraphs
    opts = ChunkingOptions(max_chunk_size=300, min_chunk_size=50)
    chunks = chunk_markdown_ast(content, opts)
    assert len(chunks) >= 2
    for t in texts(chunks):
        assert len(t) <= 300
        assert not t.startswith("ord")  # split backed off to whitespace


def test_has_actual_content_filter():           # markdown.go:931-987
    assert not has_actual_content("")
    assert not has_actual_content("---")
    assert not has_actual_content("###")
    assert not has_actual_content("```")
    assert not has_actual_content("> ")
    assert not has_actual_content("1. ")
    assert not has_actual_content("42")
    assert has_actual_content("Real words here")


def test_order_index_is_start_pos():
    content = ("# A\n\n" + "alpha beta gamma delta. " * 60 + "\n\n"
               "# B\n\n" + "epsilon zeta eta theta. " * 60)
    chunks = chunk_markdown_ast(content)
    assert len(chunks) >= 2
    # the bare "# A" paragraph chunk is dropped by has_actual_content
    # (< 3 content chars), so the first surviving chunk starts at char 5 —
    # order indices are char offsets, not a dense sequence
    assert chunks[0][2] == 5
    assert all(o == chunks[i][2] for i, (_, _, o) in enumerate(chunks))
    orders = [o for _, _, o in chunks]
    assert orders == sorted(orders) and orders[-1] > len(content) // 2
