#!/usr/bin/env python3
"""One-shot refactor: route every inline tokenizer expression through
graft.Tok (the shared seam). Rewrites
  - Scala code:  split(trim(col("text")), "\\s+") -> Tok.ws(col("text"))
                 split(col("text"), " ")          -> Tok.sp(col("text"))
  - oracle SQL:  regexp_split_to_array(trim(X), '\s+') -> ${Tok.wsSql("X")}
                 string_split(X, ' ')                  -> ${Tok.spSql("X")}
SQL rewrites require the enclosing triple-quoted literal to be
interpolated; plain literals become raw-interpolated (NOT s-: the s interpolator
processes backslash escapes even in triple quotes, which would corrupt
the '\s+' regexes these oracles carry), with existing $ escaped first.
"""
import re, sys, pathlib

CODE_SUBS = [
    ('split(trim(col("text")), "\\\\s+")', 'Tok.ws(col("text"))'),
    ('split(trim(l), "\\\\s+")', 'Tok.ws(l)'),
    ('split(col("text"), " ")', 'Tok.sp(col("text"))'),
    ('split(col("qtext"), " ")', 'Tok.sp(col("qtext"))'),
]

WS_RE = re.compile(r"regexp_split_to_array\(trim\(([A-Za-z_][\w.]*)\), '\\{1,2}s\+'\)")
SP_RE = re.compile(r"string_split\(([A-Za-z_][\w.]*), ' '\)")


def rewrite_sql_chunk(chunk: str, interpolated: bool):
    """Rewrite fragments in one triple-quoted literal body. Returns
    (new_chunk, modified, needs_s_prefix)."""
    if not (WS_RE.search(chunk) or SP_RE.search(chunk)):
        return chunk, False, False
    needs_s = not interpolated
    if needs_s:
        chunk = chunk.replace("$", "$$")  # raw""" still interpolates $
    chunk = WS_RE.sub(lambda m: '${Tok.wsSql("%s")}' % m.group(1), chunk)
    chunk = SP_RE.sub(lambda m: '${Tok.spSql("%s")}' % m.group(1), chunk)
    return chunk, True, needs_s


def process(path: pathlib.Path):
    text = path.read_text()
    orig = text
    for old, new in CODE_SUBS:
        text = text.replace(old, new)
    # split on triple quotes; even indexes are code, odd are literal bodies
    parts = text.split('"""')
    if len(parts) % 2 == 1:  # balanced
        for i in range(1, len(parts), 2):
            interpolated = parts[i - 1].endswith("s") or parts[i - 1].endswith("raw")
            new_chunk, modified, needs_s = rewrite_sql_chunk(parts[i], interpolated)
            if modified:
                parts[i] = new_chunk
                if needs_s:
                    parts[i - 1] += "raw"
        text = '"""'.join(parts)
    else:
        print(f"  !! unbalanced triple quotes, SQL untouched: {path}")
    if "Tok." in text and "import graft.Tok" not in text and "import graft.{" not in text:
        if "import graft.Tables" in text:
            text = text.replace("import graft.Tables", "import graft.{Tables, Tok}", 1)
        elif "\nobject " in text and "package graft\n" not in text[:40]:
            # insert an import after the package clause
            text = re.sub(r"(package [\w.]+\n)", r"\1\nimport graft.Tok\n", text, count=1)
    if text != orig:
        path.write_text(text)
        print(f"  rewrote {path}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        process(pathlib.Path(p))
