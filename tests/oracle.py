"""Pure-Python single-node oracle of the reference search semantics.

Implements, independently of any Spark code, exactly the behaviors
cited in SURVEY.md §2/§3 from the reference sources:

- tokenize  (SentenceUtil.java:73-80)
- particle filter + first normal form (LemmaServiceImpl.java:81-159)
  — shares the frozen lemma tables with the engine (by design: the
  tables ARE the normative dictionary, SURVEY §5.1)
- per-doc term counts (LemmaServiceImpl.java:81-101)
- global df / local N IDF quirk (SearchServiceImpl.java:244-267)
- stop-list of the 20 most common lemmas (SearchServiceImpl.java:71-75)
- rarest-lemma candidate generation (SearchServiceImpl.java:164-174)
- BM25 with tf = rank/len (SearchServiceImpl.java:269-279)
- ordering (score desc, id asc) + offset/limit
  (SearchServiceImpl.java:101-113, :207-216)

Every Spark query result is compared against this oracle: top-k ids
rank-identical, scores equal to 1e-6 rel tol.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from dataclasses import dataclass

from search_engine_spark.functions.lemmatizer import lemmatize


def oracle_tokenize(text: str, lang: str = "english") -> list[str]:
    pattern = "[^а-я\\s]" if lang.startswith("ru") else "[^a-z\\s]"
    cleaned = re.sub(pattern, " ", (text or "").lower())
    return [t for t in cleaned.split() if t]


def oracle_lemma_counts(text: str, lang: str = "english") -> dict[str, int]:
    counts: Counter[str] = Counter()
    for w in oracle_tokenize(text, lang):
        lemma = lemmatize(w, lang)
        if lemma:
            counts[lemma] += 1
    return dict(counts)


@dataclass
class OracleDoc:
    doc_id: str
    site: str
    text: str
    lang: str = "english"


class OracleIndex:
    def __init__(
        self,
        docs: list[OracleDoc],
        k1: float = 1.5,
        b: float = 0.75,
        stoplist_size: int = 20,
        analyzer: str = "lemma",
    ):
        self.k1, self.b = k1, b
        self.analyzer = analyzer
        self.doc_len: dict[str, int] = {}
        self.doc_site: dict[str, str] = {}
        self.postings: dict[str, dict[str, int]] = defaultdict(dict)
        for d in docs:
            tokens = oracle_tokenize(d.text, d.lang)
            self.doc_len[d.doc_id] = len(tokens)
            self.doc_site[d.doc_id] = d.site
            if analyzer == "lemma":
                counts = oracle_lemma_counts(d.text, d.lang)
            else:
                counts = dict(Counter(tokens))
            for term, tf in counts.items():
                self.postings[term][d.doc_id] = tf
        self.n_docs = len(self.doc_len)
        self.avg_len = (
            sum(self.doc_len.values()) / self.n_docs if self.n_docs else 0.0
        )
        self.df = {t: len(p) for t, p in self.postings.items()}
        # R14: `stoplist_size` most common lemmas (df desc, term asc)
        self.stoplist = frozenset(
            t
            for t, _ in sorted(
                self.df.items(), key=lambda kv: (-kv[1], kv[0])
            )[:stoplist_size]
        )

    # ---- query path -----------------------------------------------------

    def analyze_query(self, query: str, lang: str = "english") -> list[str]:
        if self.analyzer == "lemma":
            return sorted(oracle_lemma_counts(query, lang))
        return sorted(set(oracle_tokenize(query, lang)))

    def idf(self, term: str, n: int) -> float | None:
        """None => term dropped (ratio <= 0 would be NaN in the
        reference's Math.log — normative: drop, see plans/search.py)."""
        df = self.df.get(term, 0)
        ratio = (n - df + 0.5) / (df + 0.5)
        return math.log(ratio) if ratio > 0 else None

    def search(
        self,
        query: str,
        sites: list[str] | None = None,
        offset: int = 0,
        limit: int = 20,
        lang: str = "english",
        use_stoplist: bool = True,
    ) -> list[tuple[str, float]]:
        terms = self.analyze_query(query, lang)
        if use_stoplist:
            terms = [t for t in terms if t not in self.stoplist]
        # N = pages of selected sites; df stays global (the quirk)
        if sites:
            sset = set(sites)
            n = sum(1 for s in self.doc_site.values() if s in sset)
        else:
            n = self.n_docs
        terms = [t for t in terms if self.df.get(t, 0) > 0]
        idf = {
            t: v for t in terms if (v := self.idf(t, n)) is not None
        }
        terms = [t for t in terms if t in idf]
        if not terms:
            return []
        rarest = sorted(terms, key=lambda t: (-idf[t], t))[0]
        cand = [
            d
            for d in self.postings[rarest]
            if not sites or self.doc_site[d] in set(sites)
        ]
        results = []
        for d in cand:
            dlen = self.doc_len[d]
            score = 0.0
            for t in terms:
                tf = self.postings[t].get(d, 0)
                if tf == 0 or dlen == 0:
                    continue
                tf_norm = tf / dlen
                denom = tf_norm + self.k1 * (
                    1 - self.b + self.b * dlen / self.avg_len
                )
                score += idf[t] * tf_norm * (self.k1 + 1) / denom
            results.append((d, score))
        results.sort(key=lambda r: (-r[1], r[0]))
        return results[offset : offset + limit]

    def total(self, query: str, sites=None, lang="english",
              use_stoplist=True) -> int:
        terms = self.analyze_query(query, lang)
        if use_stoplist:
            terms = [t for t in terms if t not in self.stoplist]
        if sites:
            sset = set(sites)
            n = sum(1 for s in self.doc_site.values() if s in sset)
        else:
            n = self.n_docs
        terms = [t for t in terms if self.df.get(t, 0) > 0]
        idf = {
            t: v for t in terms if (v := self.idf(t, n)) is not None
        }
        terms = [t for t in terms if t in idf]
        if not terms:
            return 0
        rarest = sorted(terms, key=lambda t: (-idf[t], t))[0]
        return sum(
            1
            for d in self.postings[rarest]
            if not sites or self.doc_site[d] in set(sites)
        )
