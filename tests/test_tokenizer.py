from go_light_rag_ray.tokenizer import RegexTokenizer, WhitespaceTokenizer


def test_lossless_roundtrip():
    tk = RegexTokenizer()
    for text in [
        "Hello, world!",
        "Special characters: 🚀 😊 üñîçødé\nNew lines\tTabs中文日本語",
        "  leading and trailing  ",
        "a\x00b",
        "line1\r\nline2\n\n\nline3",
        "numbers 123456 12.5%",
    ]:
        assert tk.decode(tk.encode(text)) == text


def test_empty():
    tk = RegexTokenizer()
    assert tk.encode("") == []
    assert tk.count("") == 0


def test_count_matches_encode():
    tk = RegexTokenizer()
    text = "This sentence contains about nine tokens. " * 10
    assert tk.count(text) == len(tk.encode(text))


def test_whitespace_tokenizer_sql_parity():
    # count of trimmed text == number of \S+ runs (the DuckDB oracle formula)
    tk = WhitespaceTokenizer()
    text = "key agg row scan slow fast  table   value"
    assert tk.decode(tk.encode(text)) == text
    assert tk.count(text.strip()) == len(text.split())


def test_slice_decode_is_substring():
    tk = RegexTokenizer()
    text = "The quick brown fox jumps over the lazy dog. " * 20
    toks = tk.encode(text)
    piece = tk.decode(toks[5:25])
    assert piece in text
