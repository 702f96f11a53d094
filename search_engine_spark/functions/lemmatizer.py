"""Deterministic pure-Python lemmatizer + particle (stop-POS) filter.

The reference uses Apache Lucene morphology dictionaries
(/root/reference/pom.xml:74-98) and the behaviors below; we cannot call
Java, so this module is the rebuild's single normative lemmatizer.  It
is shared by the index build (inside pandas UDFs), the query path
(driver-side), and the pure-Python test oracle — so the invariant
"index-time lemma == query-time lemma" holds by construction.

Reference behaviors copied exactly:

- *first normal form*: the first dictionary normal form of the word is
  used (``services/impl/LemmaServiceImpl.java:117-128``); here: the
  exception table wins, else deterministic suffix rules, else identity.
- *particle filter*: words whose part of speech is article /
  preposition / particle / conjunction / interjection are dropped
  (``services/impl/LemmaServiceImpl.java:140-159``,
  ``application.properties:9-17``); here: a frozen word set per lang.
- *silent drop on morphology error*
  (``services/impl/LemmaServiceImpl.java:97``): words we classify as
  un-analyzable (single letters for en) are dropped, not passed through.

Everything here is pure Python with frozen tables: no wall clock, no
randomness, no external dictionaries — byte-identical results anywhere.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Particle words (stop-POS) — en: ARTICLE, PREP, PART, CONJ, INT
# (application.properties:9-12); ru: МЕЖД, СОЮЗ, ПРЕДЛ (:14-17).
# ---------------------------------------------------------------------------

EN_PARTICLES: frozenset[str] = frozenset(
    {
        # articles
        "a", "an", "the",
        # prepositions
        "of", "in", "to", "for", "with", "on", "at", "by", "from",
        "up", "about", "into", "over", "after", "under", "between",
        "through", "during", "before", "above", "below", "off",
        "near", "without", "within", "along", "across", "behind",
        "beyond", "upon", "among", "against", "toward", "towards",
        "onto", "via", "per", "amid", "around", "beside", "besides",
        "despite", "except", "inside", "outside", "since", "until",
        # conjunctions
        "and", "or", "but", "nor", "so", "yet", "if", "because",
        "while", "although", "though", "whereas", "unless", "whether",
        "than", "as",
        # particles
        "not", "no",
        # interjections
        "oh", "ah", "wow", "hey", "ouch", "oops", "hmm", "uh", "um",
        "aha", "alas", "bravo", "hurrah", "phew", "psst", "shh", "yay",
    }
)

RU_PARTICLES: frozenset[str] = frozenset(
    {
        # предлоги
        "в", "на", "с", "по", "к", "у", "о", "об", "от", "до", "за",
        "из", "под", "над", "при", "про", "без", "для", "через",
        "между", "перед", "около", "возле", "вокруг", "сквозь",
        # союзы
        "и", "а", "но", "да", "или", "либо", "что", "чтобы", "когда",
        "если", "хотя", "пока", "ибо", "зато", "однако", "также",
        "тоже", "причем", "притом",
        # междометия
        "ой", "ах", "ох", "эх", "ура", "увы", "ага", "эй", "фу", "ну",
    }
)

# ---------------------------------------------------------------------------
# Exception table: irregular forms -> first normal form (frozen).
# ---------------------------------------------------------------------------

EN_EXCEPTIONS: dict[str, str] = {
    # irregular verbs (past / past participle / 3sg / gerund picks)
    "was": "be", "were": "be", "been": "be", "is": "be", "are": "be",
    "am": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do", "doing": "do",
    "went": "go", "gone": "go", "goes": "go", "going": "go",
    "said": "say", "says": "say",
    "made": "make", "making": "make",
    "took": "take", "taken": "take", "taking": "take",
    "came": "come", "coming": "come",
    "saw": "see", "seen": "see", "seeing": "see",
    "knew": "know", "known": "know", "knowing": "know",
    "got": "get", "gotten": "get", "getting": "get",
    "gave": "give", "given": "give", "giving": "give",
    "found": "find", "finding": "find",
    "thought": "think", "thinking": "think",
    "told": "tell", "telling": "tell",
    "became": "become", "becoming": "become",
    "showed": "show", "shown": "show", "showing": "show",
    "left": "leave", "leaving": "leave",
    "felt": "feel", "feeling": "feel",
    "put": "put", "putting": "put",
    "brought": "bring", "bringing": "bring",
    "began": "begin", "begun": "begin", "beginning": "begin",
    "kept": "keep", "keeping": "keep",
    "held": "hold", "holding": "hold",
    "wrote": "write", "written": "write", "writing": "write",
    "stood": "stand", "standing": "stand",
    "heard": "hear", "hearing": "hear",
    "let": "let", "letting": "let",
    "meant": "mean", "meaning": "mean",
    "set": "set", "setting": "set",
    "met": "meet", "meeting": "meet",
    "ran": "run", "running": "run",
    "paid": "pay", "paying": "pay",
    "sat": "sit", "sitting": "sit",
    "spoke": "speak", "spoken": "speak", "speaking": "speak",
    "lay": "lie", "lain": "lie", "lying": "lie",
    "led": "lead", "leading": "lead",
    "read": "read", "reading": "read",
    "grew": "grow", "grown": "grow", "growing": "grow",
    "lost": "lose", "losing": "lose",
    "fell": "fall", "fallen": "fall", "falling": "fall",
    "sent": "send", "sending": "send",
    "built": "build", "building": "build",
    "understood": "understand", "understanding": "understand",
    "drew": "draw", "drawn": "draw", "drawing": "draw",
    "broke": "break", "broken": "break", "breaking": "break",
    "spent": "spend", "spending": "spend",
    "cut": "cut", "cutting": "cut",
    "rose": "rise", "risen": "rise", "rising": "rise",
    "drove": "drive", "driven": "drive", "driving": "drive",
    "bought": "buy", "buying": "buy",
    "wore": "wear", "worn": "wear", "wearing": "wear",
    "chose": "choose", "chosen": "choose", "choosing": "choose",
    "ate": "eat", "eaten": "eat", "eating": "eat",
    "slept": "sleep", "sleeping": "sleep",
    "flew": "fly", "flown": "fly", "flying": "fly",
    "threw": "throw", "thrown": "throw", "throwing": "throw",
    "caught": "catch", "catching": "catch",
    "taught": "teach", "teaching": "teach",
    "sold": "sell", "selling": "sell",
    "fought": "fight", "fighting": "fight",
    "hit": "hit", "hitting": "hit",
    # irregular nouns
    "children": "child", "men": "man", "women": "woman",
    "mice": "mouse", "geese": "goose", "feet": "foot", "teeth": "tooth",
    "people": "person", "lives": "life", "leaves": "leaf",
    "wives": "wife", "knives": "knife", "halves": "half",
    "shelves": "shelf", "wolves": "wolf", "loaves": "loaf",
    "indices": "index", "matrices": "matrix", "vertices": "vertex",
    "analyses": "analysis", "bases": "basis", "crises": "crisis",
    "theses": "thesis", "hypotheses": "hypothesis",
    "criteria": "criterion", "phenomena": "phenomenon",
    "data": "datum", "media": "medium",
    "oxen": "ox", "axes": "axis", "queries": "query",
    # invariants / words that look inflected but aren't
    "this": "this", "his": "his", "its": "its", "us": "us",
    "news": "news", "series": "series", "species": "species",
    "always": "always", "perhaps": "perhaps", "less": "less",
    "plus": "plus", "minus": "minus", "apparatus": "apparatus",
    "status": "status", "corpus": "corpus", "bus": "bus", "gas": "gas",
    "yes": "yes",
}

RU_EXCEPTIONS: dict[str, str] = {
    "люди": "человек", "дети": "ребенок", "шел": "идти", "шла": "идти",
    "шли": "идти", "был": "быть", "была": "быть", "были": "быть",
    "есть": "быть",
}

# Suffix rules, applied in order; first match wins.  Each rule:
# (suffix, min_stem_len, replacement).  Deterministic Porter-lite.
_EN_SUFFIX_RULES: tuple[tuple[str, int, str], ...] = (
    ("sses", 3, "ss"),
    ("ches", 3, "ch"),
    ("shes", 3, "sh"),
    ("xes", 2, "x"),
    ("zes", 2, "z"),
    ("ies", 2, "y"),
    ("ness", 3, "ness"),   # keep -ness nouns whole
    ("ss", 2, "ss"),       # class -> class (blocks bare -s rule)
    ("ing", 4, ""),        # running handled by doubling logic below
    ("ed", 4, ""),
    ("s", 3, ""),          # plural / 3sg
)

_VOWELS = frozenset("aeiou")


def _strip_en_suffix(word: str) -> str:
    """Apply the frozen suffix rules to an English word."""
    for suffix, min_stem, repl in _EN_SUFFIX_RULES:
        if word.endswith(suffix):
            stem = word[: len(word) - len(suffix)]
            if len(stem) < min_stem:
                return word
            stem = stem + repl
            if suffix in ("ing", "ed"):
                # undouble final consonant: running -> run, stopped -> stop
                if (
                    len(stem) >= 3
                    and stem[-1] == stem[-2]
                    and stem[-1] not in _VOWELS
                    and stem[-1] not in "lsz"
                ):
                    stem = stem[:-1]
                # restore trailing 'e': making -> make, used -> use
                elif (
                    len(stem) >= 2
                    and stem[-1] not in _VOWELS
                    and stem[-2] in _VOWELS
                    and not stem.endswith(("w", "x", "y"))
                    and sum(c in _VOWELS for c in stem) == 1
                ):
                    stem = stem + "e"
            return stem
    return word


def lemma_en(word: str) -> str:
    """First normal form of an English word ('' => drop).

    Mirrors ``LemmaServiceImpl.getFirstNormalForm``
    (services/impl/LemmaServiceImpl.java:117-128): blank in -> blank
    out; un-analyzable -> '' (caller drops, java ref drops on
    RuntimeException at :97).
    """
    if not word:
        return ""
    if len(word) == 1:
        return ""  # single letters: un-analyzable -> silently dropped
    exc = EN_EXCEPTIONS.get(word)
    if exc is not None:
        return exc
    return _strip_en_suffix(word)


def lemma_ru(word: str) -> str:
    """First normal form of a Russian word (minimal frozen rules)."""
    if not word:
        return ""
    if len(word) == 1:
        return ""
    exc = RU_EXCEPTIONS.get(word)
    if exc is not None:
        return exc
    for suffix in ("ами", "ями", "ого", "его", "ому", "ему", "ыми",
                   "ими", "ах", "ях", "ам", "ям", "ом", "ем", "ой",
                   "ей", "ов", "ев", "ы", "и", "а", "я", "у", "ю",
                   "е", "о"):
        if word.endswith(suffix) and len(word) - len(suffix) >= 3:
            return word[: len(word) - len(suffix)]
    return word


def is_particle(word: str, lang: str = "english") -> bool:
    """True if the word's POS is in the configured particle set.

    Reference: ``LemmaServiceImpl.isParticle``
    (services/impl/LemmaServiceImpl.java:140-159).
    """
    if lang.startswith("ru"):
        return word in RU_PARTICLES
    return word in EN_PARTICLES


def lemmatize(word: str, lang: str = "english") -> str:
    """Particle filter + first normal form; '' means 'drop this word'."""
    if not word or is_particle(word, lang):
        return ""
    if lang.startswith("ru"):
        return lemma_ru(word)
    return lemma_en(word)
