"""Snippet generation + response assembly (SURVEY §2.2 T8–T12).

Reference pipeline per result page
(services/impl/SearchServiceImpl.java:137-162,
services/utils/SentenceUtil.java):

  T8  split extracted text into sentences (BreakIterator;
      SentenceUtil.java:82-94) — here a regex splitter that keeps each
      terminator + trailing whitespace with its sentence, the
      rebuild's normative spec.
  T9  per sentence: distinct tokenized words in first-occurrence
      order → first-normal-form lemma; if the lemma is one of the
      (stop-removed) query lemmas, record its IDF and wrap EVERY
      case-insensitive occurrence of the *lowercased token* as
      ``<b>word</b>`` (StringUtils.replaceIgnoreCase,
      SentenceUtil.java:45-67).
  T12 order sentences by ascending lexicographic compare of their
      ascending-sorted IDF vectors, ties → more distinct query lemmas
      first, remaining ties stable in document order
      (SentenceUtil.java:96-135).
  T10 crop each sentence to 120 chars around the FIRST <b>…</b> span
      with the reference's exact word-boundary arithmetic
      (SentenceUtil.java:15-43).
  T11 concatenate cropped sentences + " " while the builder is under
      300 chars (SearchServiceImpl.java:39, :150-160).

These run per *result row* (≤ offset+limit rows), as an Arrow-batched
pandas UDF over the top-k frame — never over the corpus.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from search_engine_spark.functions.lemmatizer import lemmatize
from search_engine_spark.functions.textproc import tokenize_py

LIMIT_SENTENCE_LENGTH = 120   # SentenceUtil.java:11
LIMIT_SNIPPET_LENGTH = 300    # SearchServiceImpl.java:39

_SENTENCE_RE = re.compile(r"[^.!?]*[.!?]+(?:\s+|$)|[^.!?]+$")


def split_sentences_py(text: str) -> list[str]:
    """T8: sentence segmentation.  Each sentence keeps its terminator
    and trailing whitespace (BreakIterator substring semantics,
    SentenceUtil.java:82-94); ``makeSnippet`` trims later."""
    if not text:
        return []
    return [m.group(0) for m in _SENTENCE_RE.finditer(text) if m.group(0)]


def _replace_ignore_case(sentence: str, word: str, repl: str) -> str:
    """StringUtils.replaceIgnoreCase: replace ALL case-insensitive
    occurrences of ``word``, keeping the replacement literal."""
    return re.sub(re.escape(word), repl.replace("\\", "\\\\"), sentence,
                  flags=re.IGNORECASE)


def find_lemmas_in_sentence(
    sentence: str, lang: str, lemma_idf: dict[str, float]
) -> tuple[str, dict[str, float]]:
    """T9 (SentenceUtil.java:45-67): returns (highlighted sentence,
    {query lemma → idf} found in the sentence)."""
    found: dict[str, float] = {}
    seen: list[str] = []
    for word in tokenize_py(sentence, lang):
        if word in seen:  # stream().distinct() keeps first occurrence
            continue
        seen.append(word)
        lemma = lemmatize(word, lang)
        if lemma and lemma in lemma_idf:
            found[lemma] = lemma_idf[lemma]
            sentence = _replace_ignore_case(
                sentence, word, f"<b>{word}</b>"
            )
    return sentence, found


def limit_sentence(sentence: str) -> str:
    """T10 (SentenceUtil.java:15-43) — the reference's exact crop
    arithmetic, including its quirks (e.g. ``end`` landing one char
    before the close tag when no later space exists)."""
    length = len(sentence)
    if length <= LIMIT_SENTENCE_LENGTH:
        return sentence
    start_lemma = sentence.find("<b>")
    end_lemma = sentence.find("</b>") + 4
    if end_lemma - start_lemma > LIMIT_SENTENCE_LENGTH:
        return "..." + sentence[start_lemma:end_lemma] + "..."
    remain = LIMIT_SENTENCE_LENGTH - (end_lemma - start_lemma) // 2
    if start_lemma - remain < 0:
        start = 0
    else:
        start = sentence.find(" ", start_lemma - remain) + 1
    if end_lemma + remain > length:
        end = length
    else:
        end = (
            sentence[end_lemma:end_lemma + remain].rfind(" ") + end_lemma
        )
    cropped = sentence[start:end]
    if start > 0:
        cropped = "..." + cropped
    if end < length:
        cropped += "..."
    return cropped


def sort_sentences(
    items: list[tuple[str, dict[str, float]]],
) -> list[str]:
    """T12 (SentenceUtil.java:96-135): ascending lexicographic compare
    of ascending-sorted IDF vectors; tie → more distinct lemmas first;
    remaining ties stable (document order — Java and Python sorts are
    both stable)."""
    import functools

    def cmp(a, b):
        fa = sorted(a[1].values())
        fb = sorted(b[1].values())
        for x, y in zip(fa, fb):
            if x != y:
                return -1 if x < y else 1
        # equal prefix: Java's loop stops at the shorter list → equal
        return len(b[1]) - len(a[1])

    return [s for s, _ in sorted(items, key=functools.cmp_to_key(cmp))]


def make_snippet_py(
    text: str, lang: str, lemma_idf: dict[str, float]
) -> str:
    """T11 (SearchServiceImpl.java:137-162)."""
    items = []
    for sentence in split_sentences_py(text):
        highlighted, found = find_lemmas_in_sentence(
            sentence, lang, lemma_idf
        )
        if found:
            items.append((highlighted, found))
    out = []
    total = 0
    for sentence in sort_sentences(items):
        if total >= LIMIT_SNIPPET_LENGTH:
            break
        piece = limit_sentence(sentence.strip())
        out.append(piece)
        total += len(piece) + 1
    return " ".join(out) + (" " if out else "")


def snippet_udf(lemma_idf: dict[str, float]) -> Column:
    """Arrow-batched T8–T12 over (text, lang) columns."""

    @F.pandas_udf(T.StringType())
    def _snip(text: pd.Series, lang: pd.Series) -> pd.Series:
        return pd.Series(
            [
                make_snippet_py(t or "", lg or "english", lemma_idf)
                for t, lg in zip(text, lang)
            ]
        )

    return _snip(F.col("text"), F.col("lang"))


def attach_snippets(
    results: DataFrame,
    pages: DataFrame,
    lemma_idf: dict[str, float],
    id_col: str = "url",
) -> DataFrame:
    """Join the top-k result frame with the corpus text and add
    ``title`` + ``snippet`` columns.  ``results`` is ≤ offset+limit
    rows → it is the broadcast side; the pages scan reads only
    (id, text, lang[, title])."""
    cols = [F.col(id_col), F.col("text"), F.col("lang")]
    if "title" in pages.columns:
        cols.append(F.col("title"))
    page_side = pages.select(*cols)
    joined = page_side.join(F.broadcast(results), id_col, "inner")
    out = joined.withColumn("snippet", snippet_udf(lemma_idf))
    keep = [id_col, "site", "score", "rn", "snippet"]
    if "title" in joined.columns:
        keep.insert(4, "title")
    return out.select(*keep).orderBy("rn")


def search_response(
    result_rows: list,
    total: int,
    id_col: str = "url",
) -> dict:
    """Assemble the reference's response DTO
    (dto/SearchResponse.java:9-13, dto/SnippetItem.java:8-15):
    {result, count, data: [{site, siteName, uri, title, snippet,
    relevance}]}."""
    from urllib.parse import urlparse

    data = []
    for r in result_rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        url = d.get(id_col, "")
        parsed = urlparse(url) if isinstance(url, str) else None
        data.append(
            {
                "site": (
                    f"{parsed.scheme}://{parsed.netloc}"
                    if parsed and parsed.scheme
                    else d.get("site", "")
                ),
                "siteName": d.get("site", ""),
                "uri": parsed.path if parsed else "",
                "title": d.get("title", ""),
                "snippet": d.get("snippet", ""),
                "relevance": d.get("score", 0.0),
            }
        )
    return {"result": True, "count": total, "data": data}
