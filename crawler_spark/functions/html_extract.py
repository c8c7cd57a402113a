"""HTML extraction with reference-parity semantics, on stdlib only.

Re-expresses the behavior of the reference extractor
(``src/crawler/high_performance_extractor.py:262-447`` in eyjs/crawler —
studied, not copied; the reference uses lxml + Cleaner, unavailable here)
as a pure-Python DOM built on :class:`html.parser.HTMLParser`:

1. parse → DOM,
2. clean: drop script/style/meta/embedded/frame/form subtrees (the
   Cleaner(scripts, style, meta, embedded, frames, forms) behavior),
3. title: first ``<title>`` text, fallback to the URL,
4. main content: the reference's 11-selector priority list, each candidate
   stripped of nested script/style/nav/footer/header (tree-mutating, as in
   the reference), winner = max text length,
5. links: ``a[@href]`` in document order from the *mutated* doc (the
   reference extracts links after content selection removed nav/header/
   footer, so boilerplate links never enter the frontier), fragment/
   ``javascript:`` hrefs skipped, absolutized, same-domain only,
   non-empty anchor text,
6. text clean chain (whitespace collapse + noise regexes + short-line
   drop) via Python ``re`` — kept in Python, never translated to Java
   ``regexp_replace``, because byte-identity with the oracle is asserted.

The Spark surface is :func:`extract_udf` (struct-returning pandas UDF,
Arrow-batched) — per-batch Python, no per-row UDFs.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urljoin, urlparse

import pandas as pd
from pyspark.sql import functions as F

from crawler_spark.schemas import EXTRACTED

# Tags removed outright in the clean pass (subtree drops, tails kept —
# in this DOM surrounding text lives in the parent's child list, so
# removing an element node preserves it naturally).
_CLEAN_TAGS = frozenset(
    {
        "script", "style", "meta",                      # scripts/style/meta
        "object", "embed", "applet", "param",           # embedded
        "iframe", "frame", "frameset", "noframes",      # frames
        "form", "input", "textarea", "select", "option",
        "button", "fieldset", "label", "legend",        # forms
    }
)

_NOISE_SUBTREE_TAGS = frozenset({"script", "style", "nav", "footer", "header"})

_VOID_TAGS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node | str


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#document", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(reversed(attrs)))  # first occurrence wins
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, dict(reversed(attrs))))

    def handle_endtag(self, tag):
        # lenient close: pop to the nearest matching open tag
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(data: bytes | str) -> _Node:
    if isinstance(data, (bytes, bytearray)):
        data = bytes(data).decode("utf-8", errors="ignore")
    builder = _TreeBuilder()
    builder.feed(data)
    builder.close()
    return builder.root


def _clean_tree(node: _Node) -> None:
    node.children = [
        c for c in node.children if isinstance(c, str) or c.tag not in _CLEAN_TAGS
    ]
    for c in node.children:
        if isinstance(c, _Node):
            _clean_tree(c)


def _iter_elements(node: _Node):
    """Document-order element iterator."""
    for c in node.children:
        if isinstance(c, _Node):
            yield c
            yield from _iter_elements(c)


def text_content(node: _Node) -> str:
    parts: list[str] = []

    def walk(n: _Node):
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                walk(c)

    walk(node)
    return "".join(parts)


def _remove_noise_subtrees(node: _Node) -> None:
    node.children = [
        c
        for c in node.children
        if isinstance(c, str) or c.tag not in _NOISE_SUBTREE_TAGS
    ]
    for c in node.children:
        if isinstance(c, _Node):
            _remove_noise_subtrees(c)


# --- text clean chain (reference high_performance_extractor.py:376-407) --

_NOISE_PATTERNS = [
    re.compile(r"다운로드|뷰어|첨부파일|목록으로|이전글|다음글|맨위로", re.IGNORECASE),
    re.compile(r"Copyright.*All rights reserved", re.IGNORECASE),
    re.compile(r"찾아오시는 길|개인정보처리방침", re.IGNORECASE),
    re.compile(r"작성자\s*[:：]\s*\S+", re.IGNORECASE),
    re.compile(r"등록일\s*[:：]\s*\d{4}[-/.]\d{1,2}[-/.]\d{1,2}", re.IGNORECASE),
    re.compile(r"조회수\s*[:：]\s*\d+", re.IGNORECASE),
]
_WS = re.compile(r"\s+")
_BLANKS = re.compile(r"\n\s*\n")


def clean_extracted_text(text: str) -> str:
    if not text:
        return ""
    text = _WS.sub(" ", text)
    text = _BLANKS.sub("\n\n", text)
    for pattern in _NOISE_PATTERNS:
        text = pattern.sub("", text)
    lines = [ln.strip() for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if len(ln) >= 10)


# --- main-content selection ----------------------------------------------

def _candidates(root: _Node):
    """The reference's selector priority list, yielded per selector in
    document order (lists re-evaluated lazily so earlier mutations are
    visible, matching repeated XPath evaluation on a mutated tree)."""
    selector_preds = [
        lambda e: e.tag == "main",
        lambda e: e.tag == "article",
        lambda e: e.attrs.get("id") == "content",
        lambda e: e.attrs.get("id") == "main",
        lambda e: e.attrs.get("class") == "content",
        lambda e: e.attrs.get("class") == "article",
        lambda e: e.attrs.get("class") == "post",
        lambda e: e.tag == "div" and "content" in e.attrs.get("class", ""),
        lambda e: e.tag == "div" and "article" in e.attrs.get("class", ""),
        lambda e: e.tag == "div" and "post" in e.attrs.get("class", ""),
        lambda e: e.tag == "body",
    ]
    for pred in selector_preds:
        for el in [e for e in _iter_elements(root) if pred(e)]:
            yield el


def extract_main_content(root: _Node) -> str:
    best = ""
    max_score = 0
    for el in _candidates(root):
        _remove_noise_subtrees(el)  # mutates, as the reference does
        text = text_content(el)
        if not text:
            continue
        score = len(text.strip())
        if score > max_score:
            max_score = score
            best = text
    return clean_extracted_text(best)


def extract_title(root: _Node, url: str) -> str:
    for el in _iter_elements(root):
        if el.tag == "title":
            texts = [c for c in el.children if isinstance(c, str)]
            if texts:
                return texts[0].strip()
            return url
    return url


def extract_links(root: _Node, current_url: str, base_netloc: str) -> list[dict]:
    links: list[dict] = []
    for el in _iter_elements(root):
        if el.tag != "a":
            continue
        href = el.attrs.get("href")
        if not href or href.startswith("#") or href.startswith("javascript:"):
            continue
        absolute = urljoin(current_url, href)
        # base_netloc "*" = open-crawl mode (multi-host frontier); the
        # reference is always same-domain (extractor filters on the seed's
        # netloc), which corresponds to a concrete base_netloc here.
        # Hosts compare case-insensitively (RFC 3986 §3.2.2) — base_netloc
        # arrives pre-lowercased (urlfns.netloc_of), lower() this side.
        if base_netloc != "*" and urlparse(absolute).netloc.lower() != base_netloc:
            continue
        anchor = text_content(el).strip()
        if anchor:
            links.append({"url": absolute, "anchor": anchor})
    return links


# --- quality score (reference high_performance_extractor.py:409-447) -----

_INFO_KEYWORDS = ["설명", "내용", "정보", "소개", "개요", "현황", "실적", "계획", "전략"]


def content_quality(text: str) -> float:
    if not text:
        return 0.0
    score = 0.0
    tl = len(text.strip())
    if tl > 1000:
        score += 0.4
    elif tl > 500:
        score += 0.3
    elif tl > 100:
        score += 0.2
    sentences = sum(1 for s in text.split(".") if len(s.strip()) > 10)
    if sentences >= 5:
        score += 0.3
    elif sentences >= 2:
        score += 0.2
    kw = sum(1 for k in _INFO_KEYWORDS if k in text)
    if kw >= 3:
        score += 0.2
    elif kw >= 1:
        score += 0.1
    lines = text.split("\n")
    if lines:
        score *= len(set(lines)) / len(lines)
    return min(1.0, score)


# --- the per-document pure function + Spark UDF ---------------------------

def extract_page(html: bytes | str | None, url: str, base_netloc: str):
    """(title, text, links, quality) for one document; None on parse death."""
    if html is None:
        return None
    try:
        root = parse_html(html)
        _clean_tree(root)
        title = extract_title(root, url)
        text = extract_main_content(root)          # mutates the tree
        links = extract_links(root, url, base_netloc)  # sees the mutation
        return {
            "title": title,
            "text": text,
            "links": links,
            "quality_score": content_quality(text),
        }
    except Exception:
        return None


@F.pandas_udf(EXTRACTED)
def extract_udf(html: pd.Series, url: pd.Series, base_netloc: pd.Series) -> pd.DataFrame:
    rows = [extract_page(h, u, b) for h, u, b in zip(html, url, base_netloc)]
    return pd.DataFrame(
        [
            r
            if r is not None
            else {"title": None, "text": None, "links": None, "quality_score": None}
            for r in rows
        ]
    )


# --- hybrid-extractor link variant: context snippets -----------------------
# Re-expresses the reference hybrid extractor's link loop
# (src/crawler/hybrid_extractor.py:129-171, studied not copied):
# anchors need >=2 chars of text, URLs are absolutized then
# fragment-stripped with split('#')[0], only http(s) schemes survive,
# anchor text is truncated to 100 chars, and each link carries a
# ``context`` snippet = the parent element's stripped text, first 100
# chars (_get_link_context). No same-domain filter here — the hybrid
# extractor defers domain policy to the frontier's validity gate.


def _strip_concat_text(node: _Node) -> str:
    """BeautifulSoup ``get_text(strip=True)`` semantics: every text
    segment stripped, empties dropped, concatenated with no separator."""
    parts: list[str] = []

    def walk(n: _Node):
        for c in n.children:
            if isinstance(c, str):
                s = c.strip()
                if s:
                    parts.append(s)
            else:
                walk(c)

    walk(node)
    return "".join(parts)


def _iter_with_parent(node: _Node):
    for c in node.children:
        if isinstance(c, _Node):
            yield c, node
            yield from _iter_with_parent(c)


def extract_links_hybrid(root: _Node, current_url: str) -> list[dict]:
    links: list[dict] = []
    for el, parent in _iter_with_parent(root):
        if el.tag != "a":
            continue
        href = el.attrs.get("href")
        if not href:
            continue
        anchor = _strip_concat_text(el)
        if len(anchor) < 2:
            continue
        try:
            full = urljoin(current_url, href)
        except ValueError:
            continue
        if urlparse(full).scheme not in ("http", "https"):
            continue
        full = full.split("#")[0]
        context = _strip_concat_text(parent)[:100] if parent is not None else ""
        links.append({"url": full, "anchor": anchor[:100], "context": context})
    return links


def extract_page_hybrid(html: bytes | str | None, url: str):
    """Hybrid strategy: selector-priority main content + context-enriched
    links. None on parse death (same failure contract as extract_page)."""
    if html is None:
        return None
    try:
        root = parse_html(html)
        _clean_tree(root)
        title = extract_title(root, url)
        links = extract_links_hybrid(root, url)  # before content mutation:
        # the hybrid extractor pulls links from the full cleaned doc, not
        # the content-pruned tree (hybrid_extractor.py:129 parses afresh)
        text = extract_main_content(root)
        return {
            "title": title,
            "text": text,
            "links": links,
            "quality_score": content_quality(text),
        }
    except Exception:
        return None


def _extracted_ctx_schema():
    from pyspark.sql.types import ArrayType, StructField, StructType

    from crawler_spark.schemas import LINK_CTX

    return StructType(
        [f for f in EXTRACTED.fields if f.name != "links"]
        + [StructField("links", ArrayType(LINK_CTX))]
    )


@F.pandas_udf(_extracted_ctx_schema())
def extract_hybrid_udf(html: pd.Series, url: pd.Series, _base: pd.Series) -> pd.DataFrame:
    rows = [extract_page_hybrid(h, u) for h, u in zip(html, url)]
    return pd.DataFrame(
        [
            r
            if r is not None
            else {"title": None, "text": None, "links": None, "quality_score": None}
            for r in rows
        ]
    )


# --- E4: link-density-scoring extractor (second strategy) -----------------
# Re-expresses the reference's alternative extractor
# (src/crawler/data_extractor_2.py:44-123, bs4-based): score every
# div/article/section by pure_text_len * (1 - link_density^2) with a 1.5x
# boost for content-ish id/class, pick the argmax, strip noise-classed
# descendants, emit line-per-text-node output through its own clean
# chain. Unlike the selector extractor this one yields MULTI-LINE text,
# so the F10 list-like gate has real line structure to judge.

_DENSITY_DROP_TAGS = frozenset(
    {"script", "style", "header", "footer", "nav", "aside", "form", "button",
     "iframe", "figure"}
)
_DENSITY_BOOST_KEYWORDS = ("content", "article", "post", "body", "main", "view")
_DENSITY_NOISE_KEYWORDS = (
    "comment", "related", "share", "social", "extra", "footer", "header",
    "nav", "menu", "button", "author", "widget",
)
_DENSITY_LINE_NOISE = [
    "다운로드", "뷰어", "첨부파일", "목록으로", "이전글", "다음글", "맨위로",
    "Copyright", "All rights reserved", "찾아오시는 길", "개인정보처리방침",
    "유용한 정보가 되었나요?",
]
_DENSITY_META_RE = re.compile(r"^\s*(작성자|등록일|조회수|담당부서|키워드|분류)\s*[:\s]")
_MULTI_BLANK_RE = re.compile(r"(\n\s*){3,}")


def _text_stripped_concat(node: _Node) -> str:
    """bs4 get_text(strip=True) semantics: each string stripped, empties
    dropped, concatenated with no separator."""
    parts: list[str] = []

    def walk(n: _Node):
        for c in n.children:
            if isinstance(c, str):
                s = c.strip()
                if s:
                    parts.append(s)
            else:
                walk(c)

    walk(node)
    return "".join(parts)


def _text_newline_joined(node: _Node) -> str:
    """bs4 get_text(separator='\\n', strip=False) semantics."""
    parts: list[str] = []

    def walk(n: _Node):
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                walk(c)

    walk(node)
    return "\n".join(parts)


def _density_drop(node: _Node) -> None:
    node.children = [
        c for c in node.children if isinstance(c, str) or c.tag not in _DENSITY_DROP_TAGS
    ]
    for c in node.children:
        if isinstance(c, _Node):
            _density_drop(c)


def _content_score(el: _Node) -> float:
    if el.tag in ("script", "style", "a"):
        return 0.0
    text = _text_stripped_concat(el)
    text_length = len(text)
    if text_length < 100:
        return 0.0
    link_text_length = sum(
        len(_text_stripped_concat(a)) for a in _iter_elements(el) if a.tag == "a"
    )
    pure = text_length - link_text_length
    density = link_text_length / max(1, text_length)
    score = pure * (1 - density**2)
    tag_id = el.attrs.get("id", "").lower()
    tag_class = el.attrs.get("class", "").lower()
    if any(k in tag_id or k in tag_class for k in _DENSITY_BOOST_KEYWORDS):
        score *= 1.5
    return score


def density_final_clean(text: str) -> str:
    text = _MULTI_BLANK_RE.sub("\n\n", text)
    out = []
    for line in text.split("\n"):
        s = line.strip()
        if not s or len(s) < 10:
            continue
        if any(k in s for k in _DENSITY_LINE_NOISE):
            continue
        if _DENSITY_META_RE.match(s):
            continue
        out.append(s)
    return "\n".join(out)


def extract_main_content_density(root: _Node) -> str:
    _density_drop(root)
    best = None
    highest = 0.0
    body = None
    for el in _iter_elements(root):
        if el.tag == "body" and body is None:
            body = el
        if el.tag in ("div", "article", "section"):
            s = _content_score(el)
            if s > highest:
                highest = s
                best = el
    target = best if best is not None else (body or root)
    # strip noise-classed descendants (collect-then-remove, as reference)
    to_drop = [
        t
        for t in _iter_elements(target)
        if t.tag in ("div", "section", "ul", "li", "table")
        and any(
            k in t.attrs.get("id", "").lower() or k in t.attrs.get("class", "").lower()
            for k in _DENSITY_NOISE_KEYWORDS
        )
    ]
    dropset = set(map(id, to_drop))

    def prune(n: _Node):
        n.children = [
            c for c in n.children if isinstance(c, str) or id(c) not in dropset
        ]
        for c in n.children:
            if isinstance(c, _Node):
                prune(c)

    prune(target)
    return density_final_clean(_text_newline_joined(target))


def extract_page_density(html: bytes | str | None, url: str, base_netloc: str):
    """E4 strategy: density-scored main content, same link/title surface."""
    if html is None:
        return None
    try:
        root = parse_html(html)
        title = extract_title(root, url)
        text = extract_main_content_density(root)  # drops noise tags itself
        links = extract_links(root, url, base_netloc)
        return {
            "title": title,
            "text": text,
            "links": links,
            "quality_score": content_quality(text),
        }
    except Exception:
        return None


@F.pandas_udf(EXTRACTED)
def extract_density_udf(
    html: pd.Series, url: pd.Series, base_netloc: pd.Series
) -> pd.DataFrame:
    rows = [extract_page_density(h, u, b) for h, u, b in zip(html, url, base_netloc)]
    return pd.DataFrame(
        [
            r
            if r is not None
            else {"title": None, "text": None, "links": None, "quality_score": None}
            for r in rows
        ]
    )
