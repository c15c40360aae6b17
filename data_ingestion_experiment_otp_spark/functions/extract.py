"""Parse/extract scalar pipeline (SURVEY.md §2.3, §2.9): synthetic MIME
synthesis, the MIME-walk and address-parse UDFs, and the built-in
HTML→text chain.

The reference's signature capability is base64/MIME/HTML/regex extraction
over push-delivered email (`api/main.py:89-136`). The fixture corpus has no
emails, so deterministic RFC-2822 messages are synthesized from `documents`
(shapes per FIXTURES.md §3): every construction input is derivable from
`doc_id`/`text`, which lets a DuckDB oracle compute the expected extraction
output in pure SQL — making even the Python-UDF stages hash-checkable.

UDF policy (§2.9): only the MIME walk and RFC-address parse are Python
(stdlib `email` has no Spark builtin equivalent); both are Arrow-batched
pandas UDFs. Everything else — tag strip, entity unescape, regex capture,
coalesce fallback — is built-in expressions inside whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

CRLF = "\r\n"

# Regexes mirroring the reference (`api/main.py:114-115,131`). RE2 (DuckDB)
# and java.util.regex (Spark) agree on this subset: \S, \d, (?i), capture
# groups.
FROM_BODY_PATTERN = r"From:\s[^<]*<(\S+@\S+)>"
TO_BODY_PATTERN = r"To:\s[^<]*<(\S+@\S+)>"
OTP_PATTERN = r"(?i)your otp code is (\d{4})"


def synthesize_mime(docs: DataFrame) -> DataFrame:
    """Deterministic RFC-2822 message per document.

    doc_id % 3 != 2  → body contains "Your OTP code is NNNN."
    doc_id % 2 == 0  → body contains a forwarded "From: … &lt;addr&gt;" line
                       (entity-escaped, as real HTML mail carries it)
    doc_id % 5 == 0  → multipart/alternative (text/plain + text/html); the
                       MIME walk must select the first text/html part
                       (`api/main.py:100-108`)
    """
    d = docs
    otp_str = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    has_otp = F.col("doc_id") % 3 != 2
    has_fwd = F.col("doc_id") % 2 == 0
    is_multipart = F.col("doc_id") % 5 == 0
    hdr_from_addr = F.concat(F.lit("portal"), (F.col("doc_id") % 7).cast("string"), F.lit("@notify.example.com"))
    to_addr = F.concat(F.lit("user"), F.col("doc_id").cast("string"), F.lit("@mail.com"))
    fwd_addr = F.concat(F.lit("fwd"), F.col("doc_id").cast("string"), F.lit("@orig.example.com"))
    snippet = F.substring("text", 1, 100)

    body_html = F.concat(
        F.lit("<html><body>"),
        F.when(
            has_fwd,
            F.concat(F.lit("<div>From: Orig Sender &lt;"), fwd_addr, F.lit("&gt;</div>")),
        ).otherwise(F.lit("")),
        F.lit("<p>"),
        F.when(has_otp, F.concat(F.lit("Your OTP code is "), otp_str, F.lit(". "))).otherwise(F.lit("")),
        snippet,
        F.lit("</p></body></html>"),
    )

    common_headers = F.concat(
        F.lit("Date: Mon, 01 Jan 2024 00:00:00 +0000" + CRLF),
        F.lit("From: Portal <"), hdr_from_addr, F.lit(">" + CRLF),
        F.lit("To: User <"), to_addr, F.lit(">" + CRLF),
    )
    single = F.concat(
        common_headers,
        F.lit("Content-Type: text/html; charset=utf-8" + CRLF + CRLF),
        body_html,
    )
    multi = F.concat(
        common_headers,
        F.lit('Content-Type: multipart/alternative; boundary="b42"' + CRLF + CRLF),
        F.lit("--b42" + CRLF + "Content-Type: text/plain; charset=utf-8" + CRLF + CRLF),
        F.lit("plain text version" + CRLF),
        F.lit("--b42" + CRLF + "Content-Type: text/html; charset=utf-8" + CRLF + CRLF),
        body_html,
        F.lit(CRLF + "--b42--" + CRLF),
    )
    return d.select(
        "doc_id",
        F.when(is_multipart, multi).otherwise(single).alias("mime"),
    )


# The DuckDB-side mirror of synthesize_mime's body construction, shared by
# every extraction oracle (prepend, then append a SELECT over `built`).
ORACLE_SYNTH_CTE = """
WITH base AS (
  SELECT doc_id,
         left(text, 100) AS snippet,
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS otp_str,
         doc_id % 3 <> 2 AS has_otp,
         doc_id % 2 = 0 AS has_fwd,
         doc_id % 5 = 0 AS is_multipart,
         'portal' || CAST(doc_id % 7 AS VARCHAR) || '@notify.example.com' AS hdr_from_addr,
         'user' || CAST(doc_id AS VARCHAR) || '@mail.com' AS to_addr,
         'fwd' || CAST(doc_id AS VARCHAR) || '@orig.example.com' AS fwd_addr
  FROM documents
),
built AS (
  SELECT *,
    '<html><body>'
    || CASE WHEN has_fwd
            THEN '<div>From: Orig Sender &lt;' || fwd_addr || '&gt;</div>'
            ELSE '' END
    || '<p>'
    || CASE WHEN has_otp THEN 'Your OTP code is ' || otp_str || '. ' ELSE '' END
    || snippet || '</p></body></html>' AS body_html
  FROM base
),
stripped AS (
  SELECT *,
    trim(regexp_replace(
      replace(replace(replace(
        regexp_replace(body_html, '<[^>]+>', ' ', 'g'),
        '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
      '\\s+', ' ', 'g')) AS body_text
  FROM built
)
"""

_MIME_RESULT = T.StructType(
    [
        T.StructField("body", T.StringType()),
        T.StructField("hdr_from", T.StringType()),
        T.StructField("hdr_to", T.StringType()),
    ]
)


@F.pandas_udf(_MIME_RESULT)
def udf_mime_walk(mime: pd.Series) -> pd.DataFrame:
    """RFC-2822 parse + multipart walk preferring the first text/html part
    (`api/main.py:91,100-108`). Arrow-batched; stdlib `email` only."""

    from email import message_from_string

    def walk(raw: str):
        if raw is None:
            return {"body": None, "hdr_from": None, "hdr_to": None}
        msg = message_from_string(raw)
        body = None
        if msg.is_multipart():
            for part in msg.walk():
                if part.get_content_type() == "text/html":
                    body = part.get_payload()
                    break
        elif msg.get_content_type() == "text/html":
            body = msg.get_payload()
        return {
            "body": body.strip() if body is not None else None,
            "hdr_from": msg.get("From"),
            "hdr_to": msg.get("To"),
        }

    return pd.DataFrame([walk(m) for m in mime])


@F.pandas_udf(T.StringType())
def udf_addr_parse(header: pd.Series) -> pd.Series:
    """RFC address parse: `Name <addr>` → addr (`api/main.py:121-128`,
    `getaddresses`)."""
    from email.utils import parseaddr

    return header.map(lambda h: (parseaddr(h)[1] or None) if h is not None else None)


def html_to_text(col: Column) -> Column:
    """HTML → visible text (`api/main.py:110-111`): strip tags, unescape the
    common entities, collapse whitespace. Built-in regexp chain — the fast
    path (whole-stage codegen, no Python); for mail carrying arbitrary
    character references use `udf_html_text_full` below."""
    no_tags = F.regexp_replace(col, "<[^>]+>", " ")
    unescaped = F.replace(
        F.replace(
            F.replace(no_tags, F.lit("&lt;"), F.lit("<")), F.lit("&gt;"), F.lit(">")
        ),
        F.lit("&amp;"),
        F.lit("&"),
    )
    return F.trim(F.regexp_replace(unescaped, r"\s+", " "))


@F.pandas_udf(T.StringType())
def udf_html_text_full(html: pd.Series) -> pd.Series:
    """Entity-COMPLETE HTML → text (the BeautifulSoup-`get_text` fidelity
    grade of `api/main.py:110-111`): strip tags, stdlib `html.unescape`
    (every named + numeric character reference — `&#39;`, `&nbsp;`,
    `&quot;`, `&eacute;`, … — not just the three the fast path covers),
    collapse whitespace (including the U+00A0 that `&nbsp;` unescapes to —
    Python's `\\s` is Unicode-aware). Arrow-batched pandas UDF: the slow
    path by policy (§2.9), reached only when the fast chain's entity subset
    is insufficient."""
    import html as _html
    import re

    tag = re.compile(r"<[^>]+>")
    ws = re.compile(r"\s+")

    def conv(s):
        if s is None:
            return None
        return ws.sub(" ", _html.unescape(tag.sub(" ", s))).strip()

    return html.map(conv)
