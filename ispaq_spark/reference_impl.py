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

import numpy as np

from .contract import (
    COMPILED_PII_COMBINED,
    COMPILED_SCRUB_RULES,
    COMPILED_SYMBOL,
    LANGS,
    LM_FLOOR_LOGPROB,
    LM_MIN_COUNT,
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


def train_lm(
    corpus: list[str],
    order: int = LM_ORDER,
    min_count: int = LM_MIN_COUNT,
) -> dict[int, float]:
    """Count n-grams (1..order) over tokenized docs, prune grams below
    ``min_count``, then hash-merge -> {ngram_hash("k|gram"): count}, plus
    the PRE-prune unigram total under TOTAL_UNIGRAMS_KEY (the denominator of
    unigram probabilities must stay the true token count).

    Prune-then-hash ordering matters: the distributed trainer
    (functions/perplexity.py) prunes per gram *string* in the cluster before
    the driver ever hashes, so the pure trainer does the same — under a
    crc32 collision both sides then merge the same surviving counts.

    The Spark-side distributed trainer produces the same table via
    explode + groupBy + filter counting; test_perplexity asserts table
    equality.
    """
    counts: dict[str, float] = {}
    total1 = 0
    for doc in corpus:
        toks = doc.split(" ")
        for k in range(1, order + 1):
            for i in range(len(toks) - k + 1):
                g = f"{k}|" + " ".join(toks[i : i + k])
                counts[g] = counts.get(g, 0.0) + 1.0
        total1 += len(toks)
    model: dict[int, float] = {}
    for g, c in counts.items():
        if c >= min_count:
            h = ngram_hash(g)
            model[h] = model.get(h, 0.0) + c
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
                # superset property: count(prefix) >= count(kgram), so under
                # the uniform min_count prune any kept k-gram's (k-1) prefix
                # is also kept — the lookup cannot miss.
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
# fastText-capability language ID (contract constants LANGID_*): hashed
# char-n-gram bag -> per-language linear (NB) scores -> length-normalized
# softmax posterior. One scorer, called identically by this reference
# labeler and by the Spark pandas UDF (functions/langid.py) — float parity
# by construction. Graft slot: the per-target evalresp model join
# (ispaq/utils.py:558-673).
# ---------------------------------------------------------------------------

from .contract import (  # noqa: E402
    LANGID_ALPHA,
    LANGID_BUCKETS,
    LANGID_HASH_P,
    LANGID_NGRAMS,
    LANGID_UND_CONF,
)


def char_ngram_buckets(text: str) -> np.ndarray:
    """Hash buckets of all char n-grams (UTF-8 bytes, orders LANGID_NGRAMS).

    Horner polynomial mod 2^64 over stride-shifted byte arrays: ~3 numpy
    ops per order per document, zero per-character Python. uint64 wraps by
    definition, so the hash is well-defined and identical everywhere.
    """
    raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    p = np.uint64(LANGID_HASH_P)
    b = np.uint64(LANGID_BUCKETS)
    parts = []
    with np.errstate(over="ignore"):
        for n in LANGID_NGRAMS:
            if len(raw) < n:
                continue
            h = np.zeros(len(raw) - n + 1, dtype=np.uint64)
            for j in range(n):
                h = h * p + raw[j : len(raw) - n + 1 + j]
            parts.append(h % b)
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(parts)


def langid_bucket_counts(text: str) -> np.ndarray:
    """Dense (LANGID_BUCKETS,) int64 feature vector for one document."""
    return np.bincount(
        char_ngram_buckets(text).astype(np.int64), minlength=LANGID_BUCKETS
    )


def train_langid(labeled: list[tuple[str, str]]) -> dict:
    """(lang, text) pairs -> NB model {langs, W(float64 L x B), prior}.

    W[l, b] = log((count[l, b] + alpha) / (total[l] + alpha * B));
    prior[l] = log(docs[l] / docs_total). The distributed trainer
    (functions/langid.py) produces identical integer count matrices and
    then applies these exact numpy expressions, so models compare equal.
    """
    langs = tuple(sorted({lang for lang, _ in labeled}))
    idx = {lang: i for i, lang in enumerate(langs)}
    counts = np.zeros((len(langs), LANGID_BUCKETS), dtype=np.int64)
    docs = np.zeros(len(langs), dtype=np.int64)
    for lang, text in labeled:
        counts[idx[lang]] += langid_bucket_counts(text)
        docs[idx[lang]] += 1
    return langid_model_from_counts(langs, counts, docs)


def langid_model_from_counts(
    langs: tuple[str, ...], counts: np.ndarray, docs: np.ndarray
) -> dict:
    """Shared model-finalization step (single code path for both trainers)."""
    totals = counts.sum(axis=1, keepdims=True).astype(np.float64)
    W = np.log(
        (counts.astype(np.float64) + LANGID_ALPHA)
        / (totals + LANGID_ALPHA * LANGID_BUCKETS)
    )
    prior = np.log(docs.astype(np.float64) / docs.sum())
    return {"langs": langs, "W": W, "prior": prior}


def score_langid(text: str, lid: dict) -> tuple[str, float]:
    """(pred_lang, confidence) for one document.

    Per-gram-normalized scores -> stable softmax; argmax ties break toward
    the lower lang index (langs sorted). Confidence below LANGID_UND_CONF,
    or an empty feature bag, predicts 'und' (fastText's no-confident-label
    behavior) while still reporting the posterior.
    """
    g = char_ngram_buckets(text)
    if len(g) == 0:
        return UNKNOWN_LANG, 0.0
    counts = np.bincount(g.astype(np.int64), minlength=LANGID_BUCKETS)
    scores = lid["prior"] + lid["W"].dot(counts.astype(np.float64))
    # length normalization: per-gram average log-likelihood, so the softmax
    # temperature (and LANGID_UND_CONF) is document-length invariant.
    norm = scores / len(g)
    norm = norm - norm.max()
    probs = np.exp(norm)
    probs /= probs.sum()
    best = int(np.argmax(probs))
    conf = float(probs[best])
    if conf < LANGID_UND_CONF:
        return UNKNOWN_LANG, conf
    return lid["langs"][best], conf


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
    """Stopword vote: (argmax lang, max stopword hits). Retained for the
    stopword_ratio heuristic (the Gopher stop-word rule) and as the
    SQL-expressible langid twin; the pipeline's pred_lang/lang_conf now
    come from the fastText-capability classifier (score_langid)."""
    best_lang, best_c = UNKNOWN_LANG, 0
    for lang in LANGS:  # sorted order = deterministic tie-break
        sw = STOPWORDS[lang]
        c = sum(1 for t in tokens if t in sw)
        if c > best_c:
            best_lang, best_c = lang, c
    return best_lang, best_c


def compute_metrics(
    text: str, model: dict[int, float], lid_model: dict | None = None
) -> DocMetrics:
    if lid_model is None:
        from .synthesize import default_lid_model

        lid_model = default_lid_model()
    tokens = text.split(" ")
    n = len(tokens)
    # mean word length via the spaces identity: total word chars =
    # len(text) - (n-1) single separators. One double division, exact parity
    # with the Spark expression.
    mean_wl = (len(text) - n + 1) / n
    max_wl = max(len(t) for t in tokens)
    _sw_lang, sw_hits = langid(tokens)
    stop_ratio = sw_hits / n
    lang, lang_conf = score_langid(text, lid_model)
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
        lang_conf=lang_conf,
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
    html_bytes: bytes | None,
    model: dict[int, float],
    lid_model: dict | None = None,
) -> tuple[str | None, str | None, bool, int]:
    """Full reference pipeline for one document:
    (extracted_text, scrubbed_text, keep, quality_flag)."""
    text = extract_text(html_bytes)
    if text is None:
        return None, None, False, -9
    m = compute_metrics(text, model, lid_model)
    return text, scrub_text(text), m.keep, 0
