"""URL predicates and derivations as pure Column expressions (JVM-side,
whole-stage-codegen friendly — these run per frontier row at 10^10 scale,
so none of them may drop into Python).

Behavioral sources in the reference (studied, not copied):
* URL validity — src/utils/url_validator.py:5-13
* link-text / URL-pattern / extension exclusion — src/utils/link_filter.py:7-46
* KB pattern derivation — src/feedback/knowledge_base.py:37-41
* site-identifier derivation — src/config.py:14-25
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- F1: URL validity (validator semantics) -------------------------------

def netloc_of(url: Column) -> Column:
    """The URL's network location — host INCLUDING the port, lowercased.

    The reference's same-domain unit is ``urlparse(url).netloc``
    (url_validator.py:9); ``parse_url(url, 'HOST')`` strips the port, so
    a port-qualified corpus (e.g. a loopback test web on 127.0.0.1:PORT)
    would wrongly cross-match hosts on different ports. Deliberate
    deviation from raw urlparse: hosts are case-insensitive (RFC 3986
    §3.2.2), so the netloc is lowercased — a page on example.com linking
    ``https://Example.com/p`` stays same-domain instead of silently
    dropping the subtree. ``extract_links`` lowercases its side of the
    same comparison (html_extract.py)."""
    return F.lower(F.regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))


def is_valid_url(url: Column, base_netloc: Column) -> Column:
    scheme = F.parse_url(url, F.lit("PROTOCOL"))
    return (
        scheme.isin("http", "https")
        & (netloc_of(url) == base_netloc)
        & ~url.contains("#")
        & ~url.contains("javascript:void(0)")
    )


# --- F3: link-relevance exclusion regexes (verbatim patterns) -------------

EXCLUDED_TEXT_RE = (
    "(?i)로그인|가입|약관|정책|개인정보|이용안내|사이트맵|찾아오시는|채용|문의|고객센터|패밀리사이트"
)
EXCLUDED_URL_RE = "(?i)/login|/member|/join|/policy|/recruit|/sitemap|/auth|/cart|/order"
FILE_EXT_RE = r"(?i)\.(pdf|hwp|zip|rar|exe|dmg|jpg|png|gif|mp4|mp3|doc|docx|xls|xlsx|ppt|pptx)$"


def is_link_relevant(anchor: Column, url: Column) -> Column:
    return (
        ~anchor.rlike(EXCLUDED_TEXT_RE)
        & ~url.rlike(EXCLUDED_URL_RE)
        & ~url.rlike(FILE_EXT_RE)
    )


# --- E11: KB path pattern --------------------------------------------------

def kb_pattern(url: Column) -> Column:
    """URL path; if the last path segment contains '.', its parent dir."""
    path = F.parse_url(url, F.lit("PATH"))
    last = F.element_at(F.split(path, "/"), -1)
    parent = F.regexp_replace(path, "/[^/]*$", "")
    parent = F.when(parent == "", F.lit("/")).otherwise(parent)
    return F.when(last.contains("."), parent).otherwise(path)


# --- E10: site identifier ---------------------------------------------------

def site_identifier(url: Column) -> Column:
    """netloc → `{second}_{first}` unless 2nd level ∈ {co,go,or}; '-'→'_'."""
    netloc = F.regexp_replace(F.parse_url(url, F.lit("HOST")), "^www\\.", "")
    parts = F.split(netloc, "\\.")
    ident = F.when(
        (F.size(parts) > 2) & ~F.element_at(parts, 2).isin("co", "go", "or"),
        F.concat(F.element_at(parts, 2), F.lit("_"), F.element_at(parts, 1)),
    ).otherwise(F.element_at(parts, 1))
    return F.regexp_replace(ident, "-", "_")


# --- E12 / F8: content hash --------------------------------------------------

def content_hash(text: Column) -> Column:
    return F.sha2(text, 256)


# --- E16: packet text truncation ---------------------------------------------

def truncate_packet_text(text: Column, limit: int = 500) -> Column:
    return F.when(
        F.length(text) > limit,
        F.concat(F.substring(text, 1, limit), F.lit("...")),
    ).otherwise(text)
