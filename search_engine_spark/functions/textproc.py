"""Text-processing operators T1–T7 (SURVEY.md §2.2), Spark-first.

Tokenization and document length are pure JVM column expressions
(whole-stage codegen, no Python in the hot path).  Only HTML text
extraction (T1/T2) and lemma counting (T5+T6+T7 fused) are Python —
Arrow-vectorized pandas UDFs, never per-row.

Reference semantics:
- T3 tokenizer  — ``SentenceUtil.splitToWords``
  (services/utils/SentenceUtil.java:73-80): lowercase, every char
  outside ``[a-z\\s]`` (en) / ``[а-я\\s]`` (ru) becomes a space, trim,
  split on whitespace.  Normative deviation: an empty/blank text yields
  0 tokens here (the reference yields a single empty token — an
  unobservable artifact of Java's ``String.split``).
- T4 doc length — token count BEFORE particle filtering/lemmatization
  (services/utils/RecursiveWebParser.java:146-150).
- T5/T6/T7     — first-normal-form lemma, particle drop, silent drop of
  un-analyzable words, per-doc term counts
  (services/impl/LemmaServiceImpl.java:81-128).
"""

from __future__ import annotations

import html as _htmlmod
import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from search_engine_spark.functions.lemmatizer import lemmatize

# ---------------------------------------------------------------------------
# T3 tokenizer — JVM column expressions
# ---------------------------------------------------------------------------

_EN_NONLETTER = "[^a-z\\s]"
_RU_NONLETTER = "[^а-я\\s]"


def _nonletter_pattern(lang: str) -> str:
    return _RU_NONLETTER if lang.startswith("ru") else _EN_NONLETTER


def tokens_col(text: Column, lang: str | Column = "english") -> Column:
    """``array<string>`` of tokens, SentenceUtil.splitToWords semantics.

    ``lang`` may be a literal ("english"/"russian") or a per-row Column
    carrying those values.
    """
    lowered = F.lower(text)
    if isinstance(lang, str):
        cleaned = F.regexp_replace(lowered, _nonletter_pattern(lang), " ")
    else:
        cleaned = F.when(
            F.lower(lang).startswith("ru"),
            F.regexp_replace(lowered, _RU_NONLETTER, " "),
        ).otherwise(F.regexp_replace(lowered, _EN_NONLETTER, " "))
    split = F.split(F.trim(cleaned), "\\s+")
    return F.filter(split, lambda t: t != F.lit(""))


def doc_len_col(tokens: Column) -> Column:
    """T4: word count of the extracted text, pre-filtering."""
    return F.size(tokens)


# Pure-Python twin of tokens_col — used driver-side on query strings and
# by the test oracle.  MUST stay semantically identical to tokens_col.
def tokenize_py(text: str, lang: str = "english") -> list[str]:
    if text is None:
        return []
    pattern = _nonletter_pattern(lang)
    cleaned = re.sub(pattern, " ", text.lower())
    return [t for t in cleaned.split() if t]


def lemma_counts_py(text: str, lang: str = "english") -> dict[str, int]:
    """T3→T6→T5→T7 on one string (driver-side query analysis).

    Mirrors ``LemmaServiceImpl.collectLemmas``
    (services/impl/LemmaServiceImpl.java:81-101).
    """
    counts: Counter[str] = Counter()
    for word in tokenize_py(text, lang):
        lemma = lemmatize(word, lang)
        if lemma:
            counts[lemma] += 1
    return dict(counts)


# ---------------------------------------------------------------------------
# T5+T6+T7 fused — Arrow-vectorized lemma counting
# ---------------------------------------------------------------------------

_LEMMA_COUNTS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.IntegerType(), False),
        ]
    )
)


# word -> lemma memo, per python worker.  Web text is Zipf-distributed,
# so the hit rate is extreme; capped so a pathological vocabulary can't
# grow worker memory unboundedly.
_LEMMA_MEMO_CAP = 1 << 20
_lemma_memo: dict[tuple[str, str], str] = {}


def _lemmatize_memo(word: str, lang: str) -> str:
    key = (word, lang)
    hit = _lemma_memo.get(key)
    if hit is None:
        if len(_lemma_memo) >= _LEMMA_MEMO_CAP:
            _lemma_memo.clear()
        hit = _lemma_memo[key] = lemmatize(word, lang)
    return hit


def _batch_lemma_counts(
    tok_lists: list, langs,
) -> tuple["np.ndarray", list, list]:
    """Per-doc lemma tf counts over a whole Arrow batch, vectorized.

    Lemmatizes each UNIQUE (word, lang) once per batch (Zipf web text
    makes the unique set tiny next to the token stream), then counts
    (doc, lemma) pairs with one integer np.unique — no per-token
    Python in the hot loop.  Returns ``(doc_lens, terms_list,
    tfs_list)`` where the lists hold one numpy array per doc.  Term
    order within a doc is deterministic (global first-occurrence
    lemma code) but unspecified — downstream explodes immediately.
    """
    import numpy as np

    n = len(tok_lists)
    memo = _lemmatize_memo
    lens = np.fromiter(
        (len(t) if t is not None else 0 for t in tok_lists),
        np.int64, n,
    )
    total = int(lens.sum())
    empty_obj = np.empty(0, dtype=object)
    empty_tf = np.empty(0, dtype=np.int32)
    if total == 0:
        return lens, [empty_obj] * n, [empty_tf] * n
    all_toks = np.empty(total, dtype=object)
    pos = 0
    for t in tok_lists:
        if t is not None and len(t):
            all_toks[pos:pos + len(t)] = t
            pos += len(t)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    lang_per_doc = np.asarray(
        [lg or "english" for lg in langs], dtype=object
    )
    lang_per_tok = lang_per_doc[doc_idx]
    uniq_langs = pd.unique(lang_per_doc)

    # lemma string per token — computed per lang class (usually one)
    tok_lemma = np.empty(total, dtype=object)
    for lg in uniq_langs:
        mask = lang_per_tok == lg
        codes, uniq = pd.factorize(all_toks[mask])
        lemmas_u = np.asarray(
            [memo(w, lg) for w in uniq], dtype=object
        )
        tok_lemma[mask] = lemmas_u[codes]

    lcodes, luniq = pd.factorize(tok_lemma)
    luniq = np.asarray(luniq, dtype=object)
    keep = luniq[lcodes] != ""
    d = doc_idx[keep]
    lc = lcodes[keep]
    n_lemmas = len(luniq)
    key = d * np.int64(n_lemmas) + lc
    uk, tf = np.unique(key, return_counts=True)
    out_doc = uk // n_lemmas
    terms = luniq[uk % n_lemmas]
    tf = tf.astype(np.int32)
    bounds = np.searchsorted(out_doc, np.arange(n + 1, dtype=np.int64))
    terms_list = [
        terms[bounds[i]:bounds[i + 1]] if bounds[i] < bounds[i + 1]
        else empty_obj
        for i in range(n)
    ]
    tfs_list = [
        tf[bounds[i]:bounds[i + 1]] if bounds[i] < bounds[i + 1]
        else empty_tf
        for i in range(n)
    ]
    return lens, terms_list, tfs_list


@pandas_udf(_LEMMA_COUNTS_TYPE)
def lemma_counts_pandas_udf(tokens: pd.Series, lang: pd.Series) -> pd.Series:
    """tokens array + lang -> array<struct<term,tf>> per row."""
    _, terms_list, tfs_list = _batch_lemma_counts(
        list(tokens), list(lang)
    )
    return pd.Series(
        [
            [
                {"term": t, "tf": int(c)}
                for t, c in zip(terms, tfs)
            ]
            for terms, tfs in zip(terms_list, tfs_list)
        ]
    )


def _lemma_counts_batch_arrow(tokens, lang):
    """Whole-batch T5–T7 over pre-tokenized rows, Arrow-kernel path.

    Tokens are given (no tokenization, no guards needed): dictionary-
    encode the flattened token stream, lemmatize each UNIQUE (token,
    lang) once through the memo, count (row, lemma) pairs in numpy.
    Exactly equivalent to the pandas path for any input.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    if isinstance(lang, pa.ChunkedArray):
        lang = lang.combine_chunks()
    n = len(tokens)
    out_type = pa.list_(
        pa.struct([("term", pa.string()), ("tf", pa.int32())])
    )
    if n == 0:
        return pa.array([], type=out_type)
    langs = np.asarray(
        [lg or "english" for lg in lang.to_pylist()], dtype=object
    )
    flat = pc.list_flatten(tokens)
    if flat.null_count:
        # a null ELEMENT inside a tokens array would surface as a
        # null dictionary index, whose to_numpy round-trip silently
        # turns into INT64_MIN garbage lemma codes — unreachable via
        # tokens_col (its split never yields nulls) but the UDF
        # accepts arbitrary array<string>, so refuse loudly instead
        raise ValueError(
            "null element inside a tokens array (analyzer tokens "
            "are never null — pre-filter nulls before lemmatizing)"
        )
    parent = (
        pc.list_parent_indices(tokens)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    dic = pc.dictionary_encode(flat)
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = dic.dictionary.to_pylist()

    memo = _lemmatize_memo
    uniq_langs = pd.unique(langs)
    # lemma string per (unique token, lang class), factorized together
    per_lang = [
        np.asarray(
            [memo(w, lg) if w else "" for w in uniq], dtype=object
        )
        for lg in uniq_langs
    ]
    lcodes_all, luniq = pd.factorize(
        np.concatenate(per_lang)
        if per_lang else np.empty(0, dtype=object)
    )
    luniq = np.asarray(luniq, dtype=object)
    n_uniq = len(uniq)
    lcode_tok = np.empty(len(codes), dtype=np.int64)
    for gi, lg in enumerate(uniq_langs):
        mask = (langs == lg)[parent]
        lcode_tok[mask] = lcodes_all[
            gi * n_uniq: (gi + 1) * n_uniq
        ][codes[mask]]

    kept = (luniq != "")[lcode_tok] if len(luniq) else (
        np.zeros(0, dtype=bool)
    )
    n_lemmas = max(len(luniq), 1)
    key = parent[kept] * np.int64(n_lemmas) + lcode_tok[kept]
    uk, tf = np.unique(key, return_counts=True)
    out_doc = uk // n_lemmas
    out_lemma = uk % n_lemmas
    bounds = np.searchsorted(out_doc, np.arange(n + 1, dtype=np.int64))

    lu_arr = pa.array(luniq, type=pa.string())
    terms_vals = lu_arr.take(pa.array(out_lemma))
    struct_vals = pa.StructArray.from_arrays(
        [terms_vals, pa.array(tf.astype(np.int32))],
        names=["term", "tf"],
    )
    return pa.ListArray.from_arrays(
        pa.array(bounds.astype(np.int32)), struct_vals
    )


_LEMMA_COUNTS_TYPE_N = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), True),
            T.StructField("tf", T.IntegerType(), True),
        ]
    )
)

try:
    from pyspark.sql.functions import arrow_udf as _arrow_udf0

    @_arrow_udf0(_LEMMA_COUNTS_TYPE_N)
    def lemma_counts_udf(tokens, lang):
        return _lemma_counts_batch_arrow(tokens, lang)
except ImportError:  # pyspark < 4.0
    lemma_counts_udf = lemma_counts_pandas_udf


# T3+T4+T5+T6+T7 fully fused: text -> (doc_len, lemma counts) in ONE
# Arrow pass.  Tokenizing python-side (tokenize_py ≡ tokens_col,
# asserted by tests) means the build never materializes a tokens
# array column — roughly half the cache footprint and Arrow traffic
# per document, which is the scaling currency at corpus scale.
# Counts are parallel primitive arrays (terms/tfs), not
# array<struct>: pandas→Arrow conversion of numpy-array-valued list
# columns skips the per-element dict boxing that dominated the
# struct version's cost; build_postings re-zips them JVM-side.
_ANALYZED_TYPE = T.StructType(
    [
        T.StructField("doc_len", T.IntegerType(), False),
        T.StructField(
            "terms", T.ArrayType(T.StringType(), False), False
        ),
        T.StructField(
            "tfs", T.ArrayType(T.IntegerType(), False), False
        ),
    ]
)


@pandas_udf(_ANALYZED_TYPE)
def analyze_text_pandas_udf(text: pd.Series, lang: pd.Series) -> pd.DataFrame:
    """Pandas twin of ``analyze_text_udf`` (kept as the reference
    implementation the Arrow-kernel path is pinned against)."""
    tok_lists = [
        tokenize_py(txt, lg or "english")
        for txt, lg in zip(text, lang)
    ]
    lens, terms_list, tfs_list = _batch_lemma_counts(
        tok_lists, list(lang)
    )
    return pd.DataFrame(
        {"doc_len": lens, "terms": terms_list, "tfs": tfs_list}
    )


# ---------------------------------------------------------------------------
# Arrow-kernel analyzer: the same T3–T7 fusion with tokenization run by
# Arrow's C++ string kernels (utf8_lower → RE2 class replace →
# split_whitespace → dictionary_encode) instead of per-doc Python
# re.sub/str.split.  Python then touches only the UNIQUE token set
# (lemmatization) and fixed-width numpy arrays (counting) — ~5x less
# worker CPU per page, which is the build's dominant cost
# (BENCH_SPLIT.json: logical_index python_share 0.80).
#
# Equivalence to tokenize_py (Python semantics: str.lower() full case
# mapping + unicode-aware \s) is exact only on guarded inputs, so docs
# failing the guard take the pandas reference path:
# - en: text containing U+0130 (İ) falls back — its full lowercase is
#   "i"+U+0307 (two chars, yielding an extra "i" token) while Arrow's
#   utf8proc applies the simple 1:1 map.  Every other codepoint either
#   lowers 1:1 identically or lands outside [a-z] in both paths, and
#   the \s semantic difference (RE2 ASCII-only) is unobservable: a
#   whitespace char kept by Python's \s and a char replaced by " "
#   both act as token separators.
# - ru: any codepoint > U+045F falls back (conservative: all simple
#   1:1 lowercase maps below that bound are identical).
# ---------------------------------------------------------------------------

_EN_UNSAFE_RE = "\\x{0130}"
_RU_UNSAFE_RE = "[\\x{0460}-\\x{10FFFF}]"

_ANALYZED_TYPE_N = T.StructType(
    [
        T.StructField("doc_len", T.IntegerType(), True),
        T.StructField("terms", T.ArrayType(T.StringType(), True), True),
        T.StructField("tfs", T.ArrayType(T.IntegerType(), True), True),
    ]
)


def _analyze_group_arrow(sub, pattern: str, lemma_lang: str):
    """(doc_len, terms, tfs) StructArray for one lang-uniform,
    guard-passing, non-null subset of a batch."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    m = len(sub)
    low = pc.utf8_lower(sub)
    clean = pc.replace_substring_regex(
        low, pattern=pattern, replacement=" "
    )
    toks = pc.utf8_split_whitespace(clean)
    flat = pc.list_flatten(toks)
    parent = (
        pc.list_parent_indices(toks)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    dic = pc.dictionary_encode(flat)
    codes = (
        dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    )
    uniq = dic.dictionary.to_pylist()

    # T4 doc_len: token count pre-filtering; split_whitespace emits
    # empty strings at string edges — those are not tokens
    lens = np.bincount(parent, minlength=m)
    try:
        empty_code = uniq.index("")
    except ValueError:
        empty_code = -1
    if empty_code >= 0:
        em = codes == empty_code
        lens = lens - np.bincount(parent[em], minlength=m)

    memo = _lemmatize_memo
    lemmas_u = np.asarray(
        [memo(w, lemma_lang) if w else "" for w in uniq], dtype=object
    )
    lcodes_u, luniq = pd.factorize(lemmas_u)
    luniq = np.asarray(luniq, dtype=object)
    lcode_tok = lcodes_u[codes]
    kept = (luniq != "")[lcode_tok]
    n_lemmas = max(len(luniq), 1)
    key = parent[kept] * np.int64(n_lemmas) + lcode_tok[kept]
    uk, tf = np.unique(key, return_counts=True)
    out_doc = uk // n_lemmas
    out_lemma = uk % n_lemmas
    bounds = np.searchsorted(out_doc, np.arange(m + 1, dtype=np.int64))

    lu_arr = pa.array(luniq, type=pa.string())
    offs = pa.array(bounds.astype(np.int32))
    terms = pa.ListArray.from_arrays(
        offs, lu_arr.take(pa.array(out_lemma))
    )
    tfs = pa.ListArray.from_arrays(offs, pa.array(tf.astype(np.int32)))
    return pa.StructArray.from_arrays(
        [pa.array(lens.astype(np.int32)), terms, tfs],
        names=["doc_len", "terms", "tfs"],
    )


def _analyze_group_py(texts: list, langs: list):
    """Reference-path (tokenize_py) analysis for guard-failing docs,
    returned as the same StructArray shape."""
    import numpy as np
    import pyarrow as pa

    toks = [
        tokenize_py(t, lg or "english")
        for t, lg in zip(texts, langs)
    ]
    lens, terms_list, tfs_list = _batch_lemma_counts(toks, langs)
    counts = np.asarray([len(t) for t in terms_list], dtype=np.int64)
    offs = pa.array(
        np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    )
    all_terms = (
        np.concatenate(terms_list)
        if counts.sum() else np.empty(0, dtype=object)
    )
    all_tfs = (
        np.concatenate(tfs_list)
        if counts.sum() else np.empty(0, dtype=np.int32)
    )
    terms = pa.ListArray.from_arrays(
        offs, pa.array(all_terms, type=pa.string())
    )
    tfs = pa.ListArray.from_arrays(
        offs, pa.array(all_tfs.astype(np.int32))
    )
    return pa.StructArray.from_arrays(
        [pa.array(lens.astype(np.int32)), terms, tfs],
        names=["doc_len", "terms", "tfs"],
    )


def _analyze_batch_arrow(text, lang):
    """Whole-batch T3–T7: Arrow arrays in → StructArray out."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if isinstance(lang, pa.ChunkedArray):
        lang = lang.combine_chunks()
    n = len(text)
    if n == 0:
        return pa.array(
            [],
            type=pa.struct(
                [
                    ("doc_len", pa.int32()),
                    ("terms", pa.list_(pa.string())),
                    ("tfs", pa.list_(pa.int32())),
                ]
            ),
        )
    langs = np.asarray(
        [lg or "english" for lg in lang.to_pylist()], dtype=object
    )
    valid = pc.is_valid(text).to_numpy(zero_copy_only=False)

    groups: list = []  # (positions int64 array, StructArray)
    rest: list[np.ndarray] = []  # guard-failing positions per class
    for lg in pd.unique(langs):
        is_ru = lg.lower().startswith("ru")
        cls = np.where((langs == lg) & valid)[0]
        if not len(cls):
            continue
        sub = text.take(pa.array(cls))
        unsafe = (
            pc.match_substring_regex(
                sub, _RU_UNSAFE_RE if is_ru else _EN_UNSAFE_RE
            )
            .to_numpy(zero_copy_only=False)
        )
        fast = cls[~unsafe]
        if len(fast):
            pattern = _RU_NONLETTER if is_ru else _EN_NONLETTER
            groups.append(
                (
                    fast,
                    _analyze_group_arrow(
                        text.take(pa.array(fast)), pattern, lg
                    ),
                )
            )
        rest.append(cls[unsafe])
    fb = np.concatenate(
        [np.where(~valid)[0]] + rest
    ) if rest or (~valid).any() else np.empty(0, dtype=np.int64)
    if len(fb):
        fb.sort()
        texts_fb = [
            text[int(i)].as_py() if valid[i] else None for i in fb
        ]
        groups.append(
            (fb, _analyze_group_py(texts_fb, list(langs[fb])))
        )

    if len(groups) == 1 and len(groups[0][0]) == n:
        pos = groups[0][0]
        if pos[0] == 0 and pos[-1] == n - 1:
            return groups[0][1]
    order = np.concatenate([g[0] for g in groups])
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n, dtype=np.int64)
    combined = pa.concat_arrays(
        [g[1].combine_chunks() if hasattr(g[1], "combine_chunks")
         else g[1] for g in groups]
    )
    return combined.take(pa.array(inv))


try:
    from pyspark.sql.functions import arrow_udf as _arrow_udf

    @_arrow_udf(_ANALYZED_TYPE_N)
    def analyze_text_udf(text, lang):
        return _analyze_batch_arrow(text, lang)
except ImportError:  # pyspark < 4.0: pandas path only
    analyze_text_udf = analyze_text_pandas_udf


# ---------------------------------------------------------------------------
# T1/T2 — HTML -> text / title
# ---------------------------------------------------------------------------

_SCRIPT_RE = re.compile(r"(?is)<(script|style|noscript)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_HEAD_RE = re.compile(r"(?is)<head\b.*?</head\s*>")
_TAG_RE = re.compile(r"(?s)<[^>]+>")
_WS_RE = re.compile(r"\s+")
_TITLE_RE = re.compile(r"(?is)<title[^>]*>(.*?)</title\s*>")


def extract_text_py(html_bytes: bytes | str | None) -> str:
    """Visible body text of an HTML document, whitespace-normalized.

    The rebuild's normative spec for the reference's
    ``Jsoup.parse(content).text()`` (services/impl/LemmaServiceImpl.java:36).
    Deviation: head/title content is excluded (Jsoup includes title);
    fixtures generate html text-first so extract_text(html) == text
    byte-identically per url (BASELINE.json input_hint invariant).
    """
    if html_bytes is None:
        return ""
    raw = (
        html_bytes.decode("utf-8", errors="replace")
        if isinstance(html_bytes, (bytes, bytearray))
        else html_bytes
    )
    raw = _COMMENT_RE.sub(" ", raw)
    raw = _SCRIPT_RE.sub(" ", raw)
    raw = _HEAD_RE.sub(" ", raw)
    text = _TAG_RE.sub(" ", raw)
    text = _htmlmod.unescape(text)
    return _WS_RE.sub(" ", text).strip()


def extract_title_py(html_bytes: bytes | str | None) -> str:
    """T2: <title> content (``SearchServiceImpl.java:305-307``)."""
    if html_bytes is None:
        return ""
    raw = (
        html_bytes.decode("utf-8", errors="replace")
        if isinstance(html_bytes, (bytes, bytearray))
        else html_bytes
    )
    m = _TITLE_RE.search(raw)
    return _WS_RE.sub(" ", _htmlmod.unescape(m.group(1))).strip() if m else ""


@pandas_udf(T.StringType())
def extract_text_udf(html_col: pd.Series) -> pd.Series:
    return html_col.map(extract_text_py)


@pandas_udf(T.StringType())
def extract_title_udf(html_col: pd.Series) -> pd.Series:
    return html_col.map(extract_title_py)


def title_col(html_binary: Column) -> Column:
    """JVM-side title extraction for well-formed fixtures (no UDF)."""
    return F.regexp_extract(
        F.decode(html_binary, "UTF-8"), "(?is)<title[^>]*>(.*?)</title>", 1
    )


# ---------------------------------------------------------------------------
# S2 — link extraction (crawl-frontier surface, no crawler)
# ---------------------------------------------------------------------------

# reference: indexing-settings.forbidden-url-types
# (application.properties:5) — a link CONTAINING any of these
# substrings is rejected (PropertiesUtil.checkTypeUrl,
# services/utils/PropertiesUtil.java:60-63)
FORBIDDEN_URL_TYPES: tuple[str, ...] = (
    "#", "jpg", "jpeg", "png", "gif", "webp", "pdf", "eps", "xlsx",
    "doc", "docx", "pptx", "mp4", "mp3", "flac", "avi",
)

_HREF_PATTERN = "(?is)<a\\s[^>]*?href\\s*=\\s*[\"']([^\"']*)[\"']"


def extract_links_col(
    html_binary: Column,
    url: Column,
    forbidden_types: tuple[str, ...] = FORBIDDEN_URL_TYPES,
) -> Column:
    """``array<string>`` of same-site outbound links of one page.

    Pure JVM column expression mirroring the reference's
    ``RecursiveWebParser.validLinks``
    (services/utils/RecursiveWebParser.java:152-170):

    - ``<a href>`` values, absolutized against the page's site root
      (absolute http(s) links kept as-is, root-relative ``/path``
      links prefixed with ``scheme://host``; other relative forms are
      dropped — the fixtures and common-crawl HTML use absolute or
      root-relative hrefs),
    - same-site only: must start with ``mainUrl + "/"`` and differ
      from both the site root and the page's own url,
    - no forbidden type substring (``checkTypeUrl``),
    - de-duplicated within the page (the Redis visited-set is a
      crawl-frontier concern — see :func:`link_frontier`).
    """
    html_str = F.decode(html_binary, "UTF-8")
    root = F.concat(
        F.parse_url(url, F.lit("PROTOCOL")),
        F.lit("://"),
        F.parse_url(url, F.lit("HOST")),
    )
    raw = F.regexp_extract_all(html_str, F.lit(_HREF_PATTERN), 1)
    absolute = F.transform(
        raw,
        lambda h: F.when(h.startswith("http"), h).when(
            h.startswith("/"), F.concat(root, h)
        ),
    )
    main_url = F.concat(root, F.lit("/"))
    kept = F.filter(
        absolute,
        lambda h: h.isNotNull()
        & h.startswith(main_url)
        & (h != main_url)
        & (h != url)
        & ~F.exists(
            F.array(*[F.lit(t) for t in forbidden_types]),
            lambda t: h.contains(t),
        ),
    )
    return F.array_distinct(kept)


def link_frontier(pages: "DataFrame") -> "DataFrame":
    """Crawl-frontier step over a pages table: distinct same-site
    links not yet present as crawled urls — the distributed analog of
    the reference's Redis visited-set gate
    (RecursiveWebParser.java:164-169: ``jedis.sadd`` returns 0 for an
    already-seen link).  ``(site, link)`` rows, one per un-crawled url.
    """
    links = (
        pages.select(
            F.parse_url(F.col("url"), F.lit("HOST")).alias("site"),
            F.explode(
                extract_links_col(F.col("html"), F.col("url"))
            ).alias("link"),
        )
        .dropDuplicates(["link"])
    )
    return links.join(
        pages.select(F.col("url").alias("link")), "link", "left_anti"
    )
