"""Pure-Python, single-document reference implementation — the oracle.

This module plays the role of the reference system's labeled corpus: it
defines, per document, the expected extracted text, metric values, scrub
output, and keep/drop decision. The Spark pipeline (ispaq_spark.pipeline)
must reproduce these byte-identically / with F1 >= 0.99 (BASELINE.json
north_rule); tests/test_pipeline_parity.py is the gate.

Every constant comes from ispaq_spark.contract, and the non-SQL stages of
the Spark pipeline (extraction, perplexity, scrub) call the *same functions*
defined here from inside their pandas UDFs — the reference's pattern of one
shared metric library dispatched from multiple entry points
(IRISMustangMetrics/R/ISPAQUtils.R catalog consumed by every ispaq module).
The SQL-expressible metrics are re-derived here with formulas chosen to be
bit-identical to the Spark column expressions (integer arithmetic + one
IEEE-754 double division).
"""

from __future__ import annotations

import html as _html
import math
import re
from dataclasses import dataclass

from .contract import (
    COMPILED_PII_COMBINED,
    COMPILED_SCRUB_RULES,
    COMPILED_SYMBOL,
    LANGS,
    LM_FLOOR_LOGPROB,
    LM_ORDER,
    PII_RULE_NAMES,
    STOPWORDS,
    THRESHOLDS,
    UNKNOWN_LANG,
    ngram_hash,
)

# ---------------------------------------------------------------------------
# HTML -> text extraction (trafilatura-equivalent deterministic contract;
# the graft analog of mergeTraces gap-fill cleaning raw->usable signal,
# IRISSeismic/R/Class-Stream.R:583-700). Byte-identical per url is the
# hardest correctness surface (SURVEY.md §7 step 4a), so the Spark stage
# wraps THIS function in a pandas UDF rather than re-implementing it.
# ---------------------------------------------------------------------------

_BLOCK_STRIP = re.compile(
    r"<(script|style|nav|footer|head)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_TAG = re.compile(r"<[^>]*>")


def extract_text(html_bytes: bytes | None) -> str | None:
    """Extract visible text from raw HTML bytes.

    Returns None for undecodable/absent input (-> quarantine, the analog of
    ispaq's percent_availability=0 / qualityFlag=-9 path,
    ispaq/simple_metrics.py:128-140).
    """
    if html_bytes is None:
        return None
    try:
        raw = html_bytes.decode("utf-8", errors="strict")
    except (UnicodeDecodeError, AttributeError):
        return None
    # Boilerplate blocks first (content inside them must not leak)...
    stripped = _BLOCK_STRIP.sub(" ", raw)
    # ...then every remaining tag (robust to malformed/unclosed markup).
    stripped = _TAG.sub(" ", stripped)
    stripped = _html.unescape(stripped)
    # Whitespace normalization fixes the tokenization contract:
    # single spaces, no edges -> split(' ') agrees across engines.
    text = " ".join(stripped.split())
    return text if text else None


# ---------------------------------------------------------------------------
# Hashed n-gram LM (KenLM-style; SURVEY.md §2.6 graft substitution for the
# evalresp broadcast model). Train = exact n-gram hash counting; score =
# stupid-backoff over (order..1)-grams. Deterministic everywhere.
# ---------------------------------------------------------------------------

LOG_BACKOFF = math.log(0.4)  # stupid-backoff alpha per level, in nats
TOTAL_UNIGRAMS_KEY = ngram_hash("__total_unigrams__")


def train_lm(corpus: list[str], order: int = LM_ORDER) -> dict[int, float]:
    """Count n-grams (1..order) over tokenized docs -> {ngram_hash("k|gram"):
    count}, plus the unigram total under TOTAL_UNIGRAMS_KEY.

    The Spark-side distributed trainer (functions/perplexity.py) produces the
    same table via explode + groupBy(hash) counting; test_perplexity asserts
    table equality.
    """
    model: dict[int, float] = {}
    total1 = 0
    for doc in corpus:
        toks = doc.split(" ")
        for k in range(1, order + 1):
            for i in range(len(toks) - k + 1):
                h = ngram_hash(f"{k}|" + " ".join(toks[i : i + k]))
                model[h] = model.get(h, 0.0) + 1.0
        total1 += len(toks)
    model[TOTAL_UNIGRAMS_KEY] = float(total1)
    return model


def score_logprob(text: str, model: dict[int, float], order: int = LM_ORDER) -> float:
    """Mean per-token conditional logprob under stupid backoff:
    p(w|ctx) ~ count(k-gram)/count((k-1)-gram prefix) at the longest seen k,
    discounted by LOG_BACKOFF per level backed off; floor when even the
    unigram is unseen."""
    toks = text.split(" ")
    if not toks:
        return LM_FLOOR_LOGPROB
    total1 = model.get(TOTAL_UNIGRAMS_KEY, 1.0)
    total = 0.0
    for i in range(len(toks)):
        lp = LM_FLOOR_LOGPROB
        for k in range(min(order, i + 1), 0, -1):
            c = model.get(ngram_hash(f"{k}|" + " ".join(toks[i - k + 1 : i + 1])))
            if c is None:
                continue
            if k == 1:
                denom = total1
            else:
                # superset property: a seen k-gram implies its (k-1) prefix
                # was counted, so the lookup cannot miss.
                denom = model.get(
                    ngram_hash(f"{k - 1}|" + " ".join(toks[i - k + 1 : i])), c
                )
            lp = math.log(c / denom) + LOG_BACKOFF * (order - k)
            break
        total += lp
    return total / len(toks)


def perplexity(text: str, model: dict[int, float], order: int = LM_ORDER) -> float:
    return math.exp(-score_logprob(text, model, order))


# ---------------------------------------------------------------------------
# Scrub chain: ordered regex replacement (PII then toxicity), applied to the
# extracted text. Byte-exact contract.
# ---------------------------------------------------------------------------


def scrub_text(text: str) -> str:
    out = text
    for _name, pat, repl in COMPILED_SCRUB_RULES:
        out = pat.sub(repl, out)
    return out


def count_pii(text: str) -> int:
    """Single combined-alternation pass (see contract.PII_COMBINED_PATTERN):
    the Spark column expression uses the identical pattern, so counts match
    exactly — including the overlap semantics of leftmost-first
    alternation."""
    return len(COMPILED_PII_COMBINED.findall(text))


def count_tox(text: str) -> int:
    for name, pat, _repl in COMPILED_SCRUB_RULES:
        if name == "tox":
            return len(pat.findall(text))
    return 0


# ---------------------------------------------------------------------------
# Heuristic metrics + decision. Formulas mirror the Spark column expressions
# token-for-token (see functions/heuristics.py) so doubles match exactly.
# ---------------------------------------------------------------------------


@dataclass
class DocMetrics:
    word_count: int
    mean_word_len: float
    max_word_len: int
    stopword_ratio: float
    symbol_word_ratio: float
    dup_5gram_frac: float
    pred_lang: str
    lang_conf: float
    perplexity: float
    num_pii: int
    num_tox: int
    keep: bool


def langid(tokens: list[str]) -> tuple[str, int]:
    """(predicted lang, stopword hits). Argmax of per-language stopword hit
    counts, ties broken by language code ascending; 'und' when zero hits."""
    best_lang, best_c = UNKNOWN_LANG, 0
    for lang in LANGS:  # sorted order = deterministic tie-break
        sw = STOPWORDS[lang]
        c = sum(1 for t in tokens if t in sw)
        if c > best_c:
            best_lang, best_c = lang, c
    return best_lang, best_c


def compute_metrics(text: str, model: dict[int, float]) -> DocMetrics:
    tokens = text.split(" ")
    n = len(tokens)
    # mean word length via the spaces identity: total word chars =
    # len(text) - (n-1) single separators. One double division, exact parity
    # with the Spark expression.
    mean_wl = (len(text) - n + 1) / n
    max_wl = max(len(t) for t in tokens)
    lang, sw_hits = langid(tokens)
    stop_ratio = sw_hits / n
    sym_ratio = len(COMPILED_SYMBOL.findall(text)) / n
    if n >= 5:
        grams = [" ".join(tokens[i : i + 5]) for i in range(n - 4)]
        dup_frac = 1.0 - len(set(grams)) / len(grams)
    else:
        dup_frac = 0.0
    ppl = perplexity(text, model)
    m = DocMetrics(
        word_count=n,
        mean_word_len=mean_wl,
        max_word_len=max_wl,
        stopword_ratio=stop_ratio,
        symbol_word_ratio=sym_ratio,
        dup_5gram_frac=dup_frac,
        pred_lang=lang,
        lang_conf=stop_ratio if lang != UNKNOWN_LANG else 0.0,
        perplexity=ppl,
        num_pii=count_pii(text),
        num_tox=count_tox(text),
        keep=False,
    )
    m.keep = decide_keep(m)
    return m


def decide_keep(m: DocMetrics) -> bool:
    t = THRESHOLDS
    return (
        t["min_word_count"] <= m.word_count <= t["max_word_count"]
        and t["min_mean_word_len"] <= m.mean_word_len <= t["max_mean_word_len"]
        and m.max_word_len <= t["max_word_len"]
        and m.stopword_ratio >= t["min_stopword_ratio"]
        and m.symbol_word_ratio <= t["max_symbol_word_ratio"]
        and m.dup_5gram_frac <= t["max_dup_5gram_frac"]
        and m.lang_conf >= t["min_lang_conf"]
        and m.perplexity <= t["max_perplexity"]
    )


def label_document(
    html_bytes: bytes | None, model: dict[int, float]
) -> tuple[str | None, str | None, bool, int]:
    """Full reference pipeline for one document:
    (extracted_text, scrubbed_text, keep, quality_flag)."""
    text = extract_text(html_bytes)
    if text is None:
        return None, None, False, -9
    m = compute_metrics(text, model)
    return text, scrub_text(text), m.keep, 0
