"""HTML -> clean-text extraction for crawl-sourced training data.

Closes the ingestion gap between ``sources/warc.read_warc_responses``
(which yields raw HTML response payloads) and the curation operators
(quality -> dedup -> pack), i.e. the role trafilatura / jusText /
resiliparse play in production pipelines (CCNet, RefinedWeb, Dolma):
strip markup, drop script/style/comment content, decode entities,
normalize whitespace, and remove link-dense boilerplate lines
(nav bars, footers, related-links blocks).

Implementation is a single-pass stdlib state machine (no regex over
HTML, which breaks on quoted ``>`` in attributes and unterminated
tags), wrapped in an Arrow-batched ``mapInPandas`` — scan-side only,
ZERO shuffle: at 100 TB the extraction cost is embarrassingly parallel
and the plan must stay ``Scan -> MapInPandas -> downstream``.

Determinism contract (the fixture generator in
scripts/gen_html_fixtures.py builds documents whose ground-truth text
is known BY CONSTRUCTION — no second extractor implementation):

- comments ``<!-- -->``, doctypes/PIs, and CDATA sections are dropped;
- RAW-TEXT elements (script/style/noscript/template) drop their entire
  content, scanning for the matching case-insensitive close tag per
  the HTML5 raw-text parsing rules;
- BLOCK elements open/close emit a line break; ``<br>`` emits one;
  table cells emit a single space separator; inline tags (b/i/em/span/
  a/code/...) emit nothing;
- entities are decoded with stdlib ``html.unescape`` (HTML5 named +
  numeric);
- within a line, runs of Unicode whitespace collapse to one space and
  ends are stripped (``" ".join(line.split())``);
- a line is BOILERPLATE and dropped when its link density (characters
  emitted while inside an ``<a>`` / total characters) exceeds
  ``max_link_density``; empty lines are dropped silently (not counted).

No reference counterpart: pyhctsa has no ingestion surface (SURVEY
§2.0); this is engine-native pipeline machinery.

Throughput: ~7 MB/s/core single-threaded on markup-heavy fixtures
(min-of-3; the normal band for pure-Python extractors — trafilatura
is ~2-10). Extraction is embarrassingly parallel and scan-side, so a
1000-core cluster sustains ~8 GB/s; swap in a C-backed extractor via
the same mapInPandas shape if ingestion ever dominates the pipeline.
"""

from __future__ import annotations

import html as _html
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# Content of these elements is dropped wholesale (HTML5 raw-text /
# metadata elements that never contribute body text).
RAW_TEXT_ELEMENTS = frozenset({"script", "style", "noscript", "template"})

# Elements whose boundaries terminate the current visual line.
BLOCK_ELEMENTS = frozenset({
    "address", "article", "aside", "blockquote", "br", "caption", "dd",
    "details", "dialog", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "li", "main", "nav", "ol", "option", "p", "pre",
    "section", "summary", "table", "tbody", "tfoot", "thead", "title",
    "tr", "ul",
})

# Cell boundaries separate with a space, not a newline.
CELL_ELEMENTS = frozenset({"td", "th"})

DEFAULT_MAX_LINK_DENSITY = 0.66

# ASCII-only lowercase map: str.lower() is NOT length-preserving
# ('İ'.lower() is two characters), so indices found in a lower()ed view
# would misalign against the raw string. Tag names are ASCII by the
# HTML5 grammar, so ASCII folding is all the close-tag scan needs.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def _scan_tag(s: str, i: int) -> tuple[int, str, bool]:
    """Parse a tag starting at ``s[i] == '<'``. Returns
    ``(end_index_past_tag, tag_name_lower, is_closing)``; tag_name is
    '' for comments/doctype/PI/CDATA/bogus. Handles quoted attribute
    values containing ``>`` and unterminated constructs (consume to
    end of input, per the HTML5 eof-in-tag rule)."""
    n = len(s)
    c = s[i + 1] if i + 1 < n else ""
    if c == "!":
        if s.startswith("<!--", i):
            # abruptly-closed comments '<!-->' and '<!--->' are COMPLETE
            # comments per HTML5, not unterminated ones
            if s.startswith(">", i + 4):
                return i + 5, "", False
            if s.startswith("->", i + 4):
                return i + 6, "", False
            end = s.find("-->", i + 4)
            return (n if end < 0 else end + 3), "", False
        if s.startswith("<![CDATA[", i):
            end = s.find("]]>", i + 9)
            return (n if end < 0 else end + 3), "", False
        end = s.find(">", i + 2)
        return (n if end < 0 else end + 1), "", False
    if c == "?":
        end = s.find(">", i + 2)
        return (n if end < 0 else end + 1), "", False
    j = i + 1
    closing = False
    if j < n and s[j] == "/":
        closing = True
        j += 1
    # tag name must START with an ASCII letter (HTML5 tag-open state);
    # '<3' is literal text, '</3' is a bogus comment consumed to '>'
    if j >= n or not (s[j].isascii() and s[j].isalpha()):
        if closing:
            end = s.find(">", j)
            return (n if end < 0 else end + 1), "", False
        return i + 1, "<", False
    k = j + 1
    while k < n and (s[k].isascii() and (s[k].isalnum() or s[k] in "-")):
        k += 1
    name = s[j:k].lower()
    # scan to '>' honoring quoted attribute VALUES: a quote only opens
    # quoted mode right after '=' (HTML5 before-attribute-value state);
    # quotes inside unquoted values (alt=don't) are literal characters
    quote = ""
    after_eq = False
    while k < n:
        c = s[k]
        if quote:
            if c == quote:
                quote = ""
        elif c in "\"'" and after_eq:
            quote = c
            after_eq = False
        elif c == ">":
            return k + 1, name, closing
        elif c == "=":
            after_eq = True
        elif not c.isspace():
            after_eq = False
        k += 1
    return n, name, closing


def extract_text(
    raw: str, max_link_density: float = DEFAULT_MAX_LINK_DENSITY
) -> tuple[str, int, int, float]:
    """Extract clean text from one HTML document. Returns
    ``(text, n_lines_kept, n_lines_dropped, link_density)`` where
    link_density is anchor-chars / total-chars over KEPT lines
    (0.0 when no text survives)."""
    runs: list[tuple[str, bool]] = []  # (raw_text, in_anchor) per run
    breaks: list[int] = []  # indices into runs AFTER which a line breaks
    cell_sep: list[int] = []  # run indices after which a cell separator goes
    anchor_depth = 0
    low = ""  # lowercased view, built lazily ONCE (not per raw-text tag)
    i, n = 0, len(raw)
    while i < n:
        lt = raw.find("<", i)
        if lt < 0:
            runs.append((raw[i:], anchor_depth > 0))
            break
        if lt > i:
            runs.append((raw[i:lt], anchor_depth > 0))
        j, name, closing = _scan_tag(raw, lt)
        if name == "<":  # literal '<' text
            runs.append(("<", anchor_depth > 0))
            i = j
            continue
        if name and not closing and name in RAW_TEXT_ELEMENTS:
            # raw-text content: skip to the matching close tag — the
            # name must be followed by whitespace, '/' or '>' (HTML5
            # end-tag rule), so '</scriptfoo>' does NOT end a <script>
            if not low:
                low = raw.translate(_ASCII_LOWER)  # length-preserving
            probe = "</" + name
            pos = j
            close = -1
            while True:
                cand = low.find(probe, pos)
                if cand < 0:
                    break
                nxt = cand + len(probe)
                if nxt >= n or low[nxt] in " \t\n\r\f/>":
                    close = cand
                    break
                pos = cand + 1
            if close < 0:
                break  # eof inside raw text: rest of document is dropped
            j2, _, _ = _scan_tag(raw, close)
            i = j2
            continue  # no line break: raw-text elements are not blocks
        if name == "a":
            # a second <a> while one is open implicitly closes the
            # first (HTML5), so unbalanced anchors can't mark the rest
            # of the document as link text; depth is only ever 0 or 1
            anchor_depth = 1 if not closing else 0
        if name in BLOCK_ELEMENTS:
            breaks.append(len(runs))
        elif name in CELL_ELEMENTS:
            cell_sep.append(len(runs))
        i = j
    # assemble lines: runs between break points join into one line
    break_set = set(breaks)
    sep_set = set(cell_sep)
    lines: list[list[tuple[str, bool]]] = [[]]
    for idx, (txt, in_a) in enumerate(runs + [("", False)]):
        if idx in break_set:
            lines.append([])
        elif idx in sep_set and lines[-1]:
            lines[-1].append((" ", False))
        if txt:
            lines[-1].append((txt, in_a))
    kept: list[str] = []
    n_dropped = 0
    total_chars = 0
    anchor_chars = 0
    for parts in lines:
        # decode entities per run (so '&lt;' can't create a fake tag),
        # then canonicalize whitespace across the whole line
        dec = [( _html.unescape(t), a) for t, a in parts]
        line = " ".join("".join(t for t, _ in dec).split())
        if not line:
            continue
        n_line = sum(len("".join(t.split())) for t, _ in dec)
        n_anchor = sum(
            len("".join(t.split())) for t, a in dec if a
        )
        density = (n_anchor / n_line) if n_line else 0.0
        if density > max_link_density:
            n_dropped += 1
            continue
        kept.append(line)
        total_chars += n_line
        anchor_chars += n_anchor
    link_density = (anchor_chars / total_chars) if total_chars else 0.0
    return "\n".join(kept), len(kept), n_dropped, link_density


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
    rebalance: bool = True,
) -> DataFrame:
    """Replace ``html_col`` with extracted ``text`` plus per-document
    stats columns (n_lines_kept, n_lines_dropped, link_density).
    Arrow-batched mapInPandas; passthrough columns preserved.

    Plan shape: scan-side only (no Exchange) whenever the input scan
    already spreads over the cluster — the 100 TB contract, where a
    crawl has thousands of splits. When the source collapses to fewer
    partitions than cores (a single unsplittable file / one parquet
    row group — exactly guide §2.5's "input skew" case), extraction
    would run on ONE core while the rest idle; ``rebalance`` (default
    on) round-robin repartitions such degenerate inputs to
    defaultParallelism first. The repartition moves only the raw
    bytes once and is conditional, so a well-partitioned production
    input never pays it (measured: 187 MB single-row-group corpus
    4.4 s -> 1.2 s at local[32])."""
    passthrough = [f for f in df.schema.fields if f.name != html_col]
    added = {"text", "n_lines_kept", "n_lines_dropped", "link_density"}
    clash = added & {f.name for f in passthrough}
    if clash:
        raise ValueError(
            f"html_extract output columns collide with input columns "
            f"{sorted(clash)}; rename or drop them first"
        )
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in passthrough]
        + ["text string", "n_lines_kept int", "n_lines_dropped int",
           "link_density double"]
    )
    pass_names = [f.name for f in passthrough]
    mld = float(max_link_density)
    if rebalance:
        from pyhctsa_spark.operators.partitioning import rebalance_degenerate

        df = rebalance_degenerate(df)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                extract_text(h if isinstance(h, str) else "", mld)
                for h in pdf[html_col]
            ]
            out = pdf[pass_names].copy()
            out["text"] = [r[0] for r in rows]
            out["n_lines_kept"] = pd.array(
                [r[1] for r in rows], dtype="int32"
            )
            out["n_lines_dropped"] = pd.array(
                [r[2] for r in rows], dtype="int32"
            )
            out["link_density"] = [float(r[3]) for r in rows]
            yield out

    return df.mapInPandas(gen, schema=out_schema)
