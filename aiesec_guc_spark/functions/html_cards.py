"""HTML card extraction — the reference's parser (aiesec.py:67-126)
as a declarative DataFrame transform.

The reference walks a BeautifulSoup tree per card; here each card is
one HTML string column and every field is a JVM-side regexp/string
expression (codegen'd, no Python in the loop).  Field semantics are
pinned to the reference's behavior:

- filter: only anchors whose href contains "/opportunity/"
  (aiesec.py:84-86)
- opportunity_id: last path segment of href (aiesec.py:89)
- opportunity_link: absolute URL prefix + href (aiesec.py:88)
- title: <h3> text, trimmed, "N/A" when missing (aiesec.py:91-92)
- country: first <span> text (aiesec.py:96-102)
- premium: case-sensitive "Premium" containment → "Yes"/"No"
  (aiesec.py:94)
- applicants: lower-cased "... applicant(s)" text, "N/A" when
  missing (aiesec.py:108-113)
- duration: last <span> text; literal "." → "N/A" (aiesec.py:97-105)
- organization: org div text, "N/A" when missing (aiesec.py:115-116)

Regexes use no engine-specific syntax so the DuckDB oracle (RE2) and
Spark (java.util.regex) agree.

Known extraction limits (pinned in tests/test_html_cards.py):

- **No nested same-type tags inside a captured block.**  The lazy
  inner captures ([\\s\\S]*?) stop at the FIRST closing tag of the
  same type, so an org ``<div>`` containing an inner ``<div>``
  truncates at the inner ``</div>`` where bs4's ``get_text`` would
  collect the whole subtree.  The reference markup (aiesec.py card
  structure and all fixtures) never nests a same-type element inside
  h3/span/org blocks; balance-aware extraction would need a real
  parser, which the JVM-regex design deliberately avoids.  DIFFERENT
  child tags (``<b>``, ``<em>``, spans inside h3, …) are fine — the
  lazy capture spans them and _strip_tags reduces them bs4-style.
- **\\x0B (vertical tab) strip divergence.**  Java ``\\s`` includes
  \\x0B; RE2's does not — a text node edged by a vertical tab strips
  differently across engines.  No real-world card markup contains
  \\x0B; the fixtures pin only \\t/\\n/\\r/space whitespace.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BASE_URL = "https://aiesec.org"

_HREF_RE = 'href="([^"]+)"'
# Inner captures are LAZY ([\s\S]*?) so nested child markup survives
# into the capture; _strip_tags then reduces it the way bs4
# get_text(strip=True) does.  ([^<]*) — the pre-round-7 form — stopped
# at the first nested element: <h3>Senior <b>Intern</b></h3> yielded
# "Senior " where the reference gets "SeniorIntern" (aiesec.py:91-92).
_H3_RE = "<h3[^>]*>([\\s\\S]*?)</h3>"
_SPAN_RE = "<span[^>]*>([\\s\\S]*?)</span>"
_ORG_RE = '<div class="org"[^>]*>([\\s\\S]*?)</div>'
_APPLICANTS_RE = "([0-9]+ applicants?)"

#: Any HTML tag — the split delimiter for get_text emulation.
_TAG_RE = "<[^>]+>"


def _strip_tags(c: Column) -> Column:
    """bs4 ``get_text(strip=True)`` over an inner-HTML fragment: split
    on tags into the text nodes, strip EACH node, join with '' —
    matching BeautifulSoup exactly, including the subtle case where
    the whitespace between a word and a child tag disappears
    ("Senior <b>Intern</b>" → "SeniorIntern", not "Senior Intern").
    Pure JVM string expressions; no Python in the loop.

    The lambda MUST be one-arg: ``F.transform`` passes (element,
    index) to any two-arg callable, and pyspark 4's ``F.trim(col,
    trim)`` accepts two — handing it bare makes the element INDEX the
    trim character set ("12" at index 1 → "2").  And it must strip via
    regexp, not ``F.trim``: SQL trim removes only ASCII spaces while
    Python's ``str.strip`` (what bs4 applies per node) removes \\n/\\t
    too."""
    return F.array_join(
        F.transform(
            F.split(c, _TAG_RE),
            lambda s: F.regexp_replace(s, r"^\s+|\s+$", ""),
        ),
        "",
    )


def _na_if_empty(c: Column) -> Column:
    return F.coalesce(F.nullif(F.trim(c), F.lit("")), F.lit("N/A"))


def extract_cards(cards: DataFrame, html_col: str = "html") -> DataFrame:
    """One opportunity row per card row (8-column reference schema)."""
    h = F.col(html_col)
    href = F.regexp_extract(h, _HREF_RE, 1)
    spans = F.transform(
        F.regexp_extract_all(h, F.lit(_SPAN_RE), 1), _strip_tags
    )
    # try_element_at: a card with an /opportunity/ href but NO span
    # matches (malformed markup, layout drift) must degrade to the
    # "N/A" null-sentinel defaulting (F6), not crash the whole scrape
    # batch — plain element_at throws INVALID_ARRAY_INDEX on the empty
    # spans array under Spark 4's ANSI default.
    last_span = F.try_element_at(spans, F.lit(-1))
    duration = F.when(F.trim(last_span) == ".", "N/A").otherwise(F.trim(last_span))
    return (
        cards.filter(href.contains("/opportunity/"))
        .select(
            F.element_at(F.split(href, "/"), -1).alias("opportunity_id"),
            F.concat(F.lit(BASE_URL), href).alias("opportunity_link"),
            _na_if_empty(_strip_tags(F.regexp_extract(h, _H3_RE, 1))).alias("title"),
            _na_if_empty(F.try_element_at(spans, F.lit(1))).alias("country"),
            F.when(h.contains("Premium"), "Yes").otherwise("No").alias("premium"),
            _na_if_empty(
                F.regexp_extract(F.lower(h), _APPLICANTS_RE, 1)
            ).alias("applicants"),
            F.coalesce(F.nullif(duration, F.lit("")), F.lit("N/A")).alias("duration"),
            _na_if_empty(_strip_tags(F.regexp_extract(h, _ORG_RE, 1))).alias(
                "organization"
            ),
        )
    )


def extract_cards_oracle_sql(values_sql: str) -> str:
    """DuckDB twin of ``extract_cards`` over a VALUES list of
    (page_id, html) rows."""
    # regexp strip, not trim(): same full-whitespace semantics as the
    # Spark side (SQL trim is spaces-only).
    strip = (
        "array_to_string(list_transform("
        "string_split_regex({inner}, '{tag}'), "
        r"t -> regexp_replace(t, '^\s+|\s+$', '', 'g')), '')"
    )

    def _st(inner: str) -> str:
        return strip.format(inner=inner, tag=_TAG_RE)

    return f"""
WITH cards(page_id, html) AS (VALUES {values_sql}),
x AS (
  SELECT page_id, html,
         regexp_extract(html, '{_HREF_RE}', 1) AS href,
         list_transform(regexp_extract_all(html, '{_SPAN_RE}', 1),
                        s -> {_st('s')}) AS spans
  FROM cards
),
f AS (SELECT * FROM x WHERE contains(href, '/opportunity/'))
SELECT string_split(href, '/')[-1] AS opportunity_id,
       '{BASE_URL}' || href AS opportunity_link,
       COALESCE(NULLIF(trim({_st(f"regexp_extract(html, '{_H3_RE}', 1)")}), ''), 'N/A') AS title,
       COALESCE(NULLIF(trim(spans[1]), ''), 'N/A') AS country,
       CASE WHEN contains(html, 'Premium') THEN 'Yes' ELSE 'No' END AS premium,
       COALESCE(NULLIF(trim(regexp_extract(lower(html), '{_APPLICANTS_RE}', 1)), ''), 'N/A')
         AS applicants,
       COALESCE(NULLIF(CASE WHEN trim(spans[-1]) = '.' THEN 'N/A'
                            ELSE trim(spans[-1]) END, ''), 'N/A') AS duration,
       COALESCE(NULLIF(trim({_st(f"regexp_extract(html, '{_ORG_RE}', 1)")}), ''), 'N/A')
         AS organization
FROM f
"""
