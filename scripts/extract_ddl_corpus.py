#!/usr/bin/env python3
"""Extract the reference's DDL test corpus into a JSONL file.

Scans Java TEST sources under /root/reference for string literals that
are MySQL/PolarDB-X DDL statements (the corpus DruidDdlParser.java is
exercised against), resolves compile-time `"a" + "b"` concatenation,
and ALSO scans the reference's shipped `.sql` resource files (its own
metadata-DB migrations and the heartbeat bootstrap DDL — real MySQL +
PolarDB-X dialect: `AUTO_INCREMENT BY GROUP`, `dbpartition by`),
writing one JSON object per statement:

    {"src": "module/path.java:line", "sql": "CREATE TABLE ..."}

Chains broken by a VARIABLE part (`"create table " + name + ...`) are
kept only when the variable stands in an identifier position; the hole
is filled with a stable placeholder identifier (`xvar1`, `xvar2`, ...)
so the statement SHAPE is preserved (names are irrelevant to parsing).
Chains where the hole is structural (inside a column list, a `%s`
spanning clauses) are dropped — shape cannot be recovered.

Output is deterministic (sorted by src then sql) so the checked-in
corpus diffs cleanly on re-extraction.
"""
import json
import os
import re
import sys

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), os.pardir,
                   "src", "test", "resources", "ddl_corpus.jsonl")

DDL_HEAD = re.compile(
    r"^\s*(create|alter|drop|rename|truncate)\s", re.IGNORECASE)

# a literal token: "..." with Java escapes
LIT = re.compile(r'"((?:[^"\\]|\\.)*)"')


def unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n == "n":
                out.append("\n")
            elif n == "t":
                out.append("\t")
            elif n == "r":
                out.append("\r")
            elif n == "u" and i + 5 < len(s):
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 4
            else:
                out.append(n)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def strip_comments(src: str) -> str:
    """Remove // and /* */ comments, preserving string literals and
    line structure (newlines kept so line numbers stay right)."""
    out = []
    i = 0
    n = len(src)
    while i < n:
        c = src[i]
        if c == '"':
            j = i + 1
            while j < n and src[j] != '"':
                if src[j] == "\\":
                    j += 1
                j += 1
            out.append(src[i:j + 1])
            i = j + 1
        elif c == "'":
            j = i + 1
            while j < n and src[j] != "'":
                if src[j] == "\\":
                    j += 1
                j += 1
            out.append(src[i:j + 1])
            i = j + 1
        elif c == "/" and i + 1 < n and src[i + 1] == "/":
            while i < n and src[i] != "\n":
                i += 1
        elif c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            seg = src[i:j + 2 if j >= 0 else n]
            out.append("\n" * seg.count("\n"))
            i = (j + 2) if j >= 0 else n
        else:
            out.append(c)
            i += 1
    return "".join(out)


# After comment stripping: a concatenation chain is literals and
# identifier-ish variable parts joined by '+'.
CHAIN = re.compile(
    r'"(?:[^"\\]|\\.)*"'
    r'(?:\s*\+\s*(?:"(?:[^"\\]|\\.)*"|[A-Za-z_][A-Za-z0-9_.()]*))*')


def chain_parts(chain: str):
    """Split a chain into ('lit', text) / ('var', name) parts."""
    parts = []
    i = 0
    n = len(chain)
    while i < n:
        c = chain[i]
        if c == '"':
            m = LIT.match(chain, i)
            parts.append(("lit", unescape(m.group(1))))
            i = m.end()
        elif c in "+ \t\n\r":
            i += 1
        else:
            j = i
            while j < n and chain[j] not in "+":
                j += 1
            parts.append(("var", chain[i:j].strip()))
            i = j
    return parts


def resolve(parts):
    """Render a chain; identifier-position holes become placeholders.
    Returns None when a hole is structural (can't recover shape)."""
    out = []
    k = 0
    for kind, text in parts:
        if kind == "lit":
            out.append(text)
        else:
            before = "".join(out)
            # identifier position: preceded by whitespace/dot/backtick
            # at a place where a NAME goes (after TABLE/INDEX/ON/EXISTS
            # or a dot); structural holes (inside parens mid-list,
            # after '=' etc.) lose shape -> reject
            tail = before.rstrip().lower()
            if tail.endswith((" table", " exists", " index", " on",
                              " to", " like", ".", " rename", " from",
                              " add column", " key", " database",
                              " schema", " column")) or before.endswith(("`", ".")):
                k += 1
                out.append(f"xvar{k}")
            else:
                return None
    sql = "".join(out).strip().rstrip(";").strip()
    return sql or None


def split_sql(text: str):
    """Split an .sql file into (line, statement) on top-level ';',
    respecting '...'/"..."/`...` quoting and --, #, /* */ comments."""
    stmts = []
    buf = []
    start_line = 1
    line = 1
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c == "\n":
            line += 1
            buf.append(c)
            i += 1
        elif c in "'\"`":
            q = c
            buf.append(c)
            i += 1
            while i < n:
                buf.append(text[i])
                if text[i] == "\n":
                    line += 1
                if text[i] == "\\" and q != "`" and i + 1 < n:
                    buf.append(text[i + 1])
                    i += 2
                    continue
                if text[i] == q:
                    i += 1
                    break
                i += 1
        elif text[i:i + 2] == "--" or c == "#":
            j = text.find("\n", i)
            i = n if j < 0 else j
        elif text[i:i + 2] == "/*":
            j = text.find("*/", i + 2)
            seg = text[i:n if j < 0 else j + 2]
            line += seg.count("\n")
            i = n if j < 0 else j + 2
        elif c == ";":
            s = "".join(buf).strip()
            if s:
                stmts.append((start_line, s))
            buf = []
            start_line = line
            i += 1
        else:
            buf.append(c)
            i += 1
    s = "".join(buf).strip()
    if s:
        stmts.append((start_line, s))
    return stmts


def main():
    rows = []
    # the reference's shipped .sql files: every top-level statement
    # with a DDL verb (migrations are CREATE/ALTER-heavy; the few DML
    # INSERT/UPDATE rows fall out on DDL_HEAD)
    for root, _dirs, files in os.walk(REF):
        for f in files:
            if not f.endswith(".sql"):
                continue
            path = os.path.join(root, f)
            with open(path, encoding="utf-8", errors="replace") as fh:
                text = fh.read()
            rel = os.path.relpath(path, REF)
            for line, sql in split_sql(text):
                if DDL_HEAD.match(sql) and len(sql) >= 18:
                    rows.append({"src": f"{rel}:{line}", "sql": sql})
    for root, _dirs, files in os.walk(REF):
        # test sources (the corpus DruidDdlParser is exercised against)
        # AND main sources: the reference embeds its system-table
        # bootstraps (SystemDB.java, ConsoleTableMetaTSDB.java ...) as
        # string DDL that no test re-states — real PolarDB-X dialect
        # the test corpus alone would miss.
        r = root + "/"
        if "/src/test/" not in r and "/src/main/" not in r:
            continue
        for f in files:
            if not f.endswith(".java"):
                continue
            path = os.path.join(root, f)
            with open(path, encoding="utf-8", errors="replace") as fh:
                src = strip_comments(fh.read())
            for m in CHAIN.finditer(src):
                parts = chain_parts(m.group(0))
                joined = "".join(t for kind, t in parts if kind == "lit")
                if not DDL_HEAD.match(joined):
                    continue
                sql = resolve(parts)
                if sql is None or not DDL_HEAD.match(sql):
                    continue
                # skip fragments: a "create table %s" template with the
                # whole body in a hole has no parse value
                if len(sql) < 18:
                    continue
                # templates with unresolved holes, grammar-doc prose
                # ("CREATE [TEMPORARY] TABLE ..."), and non-statement
                # strings that merely start with a DDL verb
                if "%s" in sql or "[" in sql or "{}" in sql:
                    continue
                # truncated chains (literal ends mid-identifier at a
                # variable hole the resolver couldn't classify): proper
                # backtick quoting is always EVEN (escapes double), so
                # odd parity = a dangling open quote; trailing
                # punctuation = a statement cut before its object
                if sql.count("`") % 2 == 1 or sql.rstrip().endswith(
                        (".", "(", ",", "=")):
                    continue
                # dangling prefixes: the object NAME lived in a runtime
                # variable appended outside the chain ("create table if
                # not exists" + name) — no shape to parse
                tail_words = re.sub(r"[^a-z_ ]+", " ", sql.lower()).split()
                if tail_words[-1] in (
                        "exists", "table", "database", "schema", "index",
                        "on", "to", "like", "column", "from",
                        "rename", "view", "sequence") or (
                        tail_words[-1] == "key" and
                        tail_words[-2:] != ["primary", "key"]):
                    continue
                # after the verb and any modifier words, the FIRST word
                # must be a DDL object ("create db and table" is a log
                # message, not a statement)
                words = re.findall(r"[a-z_=]+", sql.lower()[:80])
                objs = {"table", "index", "database", "schema", "view",
                        "sequence", "tablegroup", "function", "trigger",
                        "procedure"}
                mods = {"or", "replace", "unique", "fulltext", "spatial",
                        "clustered", "clustering", "local", "global",
                        "partition", "shadow", "temporary", "new",
                        "definer", "sql", "security"}
                obj = next((w for w in words[1:8]
                            if w not in mods and not w.startswith("algorithm")
                            and "@" not in w and "=" not in w), "")
                if obj not in objs:
                    continue
                line = src[:m.start()].count("\n") + 1
                rel = os.path.relpath(path, REF)
                rows.append({"src": f"{rel}:{line}", "sql": sql})
    # dedupe identical SQL (keep first src), deterministic order
    seen = {}
    for r in sorted(rows, key=lambda r: (r["sql"], r["src"])):
        seen.setdefault(r["sql"], r)
    final = sorted(seen.values(), key=lambda r: (r["src"], r["sql"]))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as fh:
        for r in final:
            fh.write(json.dumps(r, ensure_ascii=False) + "\n")
    print(f"{len(final)} statements -> {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
