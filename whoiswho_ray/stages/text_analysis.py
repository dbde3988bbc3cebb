"""Text-analysis operators for a training-data pipeline.

Language-ID (stopword/n-gram heuristic), quality scoring (length / punct /
stopword ratios), token counting, and rolling-hash document
fingerprinting — each a vectorized ``map_batches`` stage over the
``documents`` table. The quality/token kernels are defined with exact
ASCII-class semantics so a DuckDB SQL oracle computes identical values.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from whoiswho_ray.functions.hashing import stable_hash64, winnow_fingerprints

_TOKEN_RE = re.compile(r"\S+")
_ALPHA_RE = re.compile(r"[a-zA-Z]")
_DIGIT_RE = re.compile(r"[0-9]")
_PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")  # ASCII punctuation blocks
_UPPER_RE = re.compile(r"[A-Z]")

# small per-language stopword profiles for the heuristic language id
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the a of and to in is that it for on with as at by".split()),
    "de": frozenset("der die das und ist nicht ein eine mit für auf von zu den".split()),
    "fr": frozenset("le la les et de un une est pour dans que sur avec ne pas".split()),
    "es": frozenset("el la los las y de un una es para en que no con por".split()),
}


def token_stats_batch(t: pa.Table, text_col: str = "text", key_col: str = "doc_id") -> pa.Table:
    """(key, n_tokens, n_chars, avg_token_len) — tokens are \\S+ runs.

    SQL oracle: ``array_length(regexp_extract_all(text, '\\S+'))`` etc."""
    texts = t.column(text_col).to_pylist()
    n = len(texts)
    n_tokens = np.empty(n, np.int64)
    n_chars = np.empty(n, np.int64)
    tok_chars = np.empty(n, np.int64)
    for i, x in enumerate(texts):
        x = x or ""
        toks = _TOKEN_RE.findall(x)
        n_tokens[i] = len(toks)
        n_chars[i] = len(x)
        tok_chars[i] = sum(len(w) for w in toks)
    avg = np.where(n_tokens > 0, tok_chars / np.maximum(n_tokens, 1), 0.0)
    return pa.table({
        key_col: t.column(key_col),
        "n_tokens": pa.array(n_tokens),
        "n_chars": pa.array(n_chars),
        "avg_token_len": pa.array(avg),
    })


def quality_score_batch(t: pa.Table, text_col: str = "text", key_col: str = "doc_id") -> pa.Table:
    """ASCII-class character ratios + a blended quality score.

    ratios are count(class)/length (0 for empty text); quality =
    alpha_ratio - punct_ratio - digit_ratio, clamped to [0, 1]."""
    texts = t.column(text_col).to_pylist()
    n = len(texts)
    cols = {k: np.zeros(n, np.float64) for k in ("alpha_ratio", "digit_ratio", "punct_ratio", "upper_ratio")}
    for i, x in enumerate(texts):
        x = x or ""
        ln = len(x)
        if ln == 0:
            continue
        cols["alpha_ratio"][i] = len(_ALPHA_RE.findall(x)) / ln
        cols["digit_ratio"][i] = len(_DIGIT_RE.findall(x)) / ln
        cols["punct_ratio"][i] = len(_PUNCT_RE.findall(x)) / ln
        cols["upper_ratio"][i] = len(_UPPER_RE.findall(x)) / ln
    quality = np.clip(cols["alpha_ratio"] - cols["punct_ratio"] - cols["digit_ratio"], 0.0, 1.0)
    out = {key_col: t.column(key_col)}
    out.update({k: pa.array(v) for k, v in cols.items()})
    out["quality"] = pa.array(quality)
    return pa.table(out)


class LangId:
    """Actor: heuristic language id by stopword-profile hit rate (regexes
    compiled and profiles indexed once per actor)."""

    def __init__(self):
        self.word_re = re.compile(r"[a-zàâäéèêëîïôöùûüçáíóúñß]+")
        self.profiles = {k: v for k, v in _LANG_STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        langs, scores = [], []
        for x in batch["text"]:
            words = self.word_re.findall((x or "").lower())
            best_lang, best = "und", 0.0
            for lang, stops in self.profiles.items():
                if not words:
                    break
                hit = sum(w in stops for w in words) / len(words)
                if hit > best:
                    best_lang, best = lang, hit
            langs.append(best_lang)
            scores.append(best)
        out = batch[["doc_id"]].copy()
        out["pred_lang"] = langs
        out["lang_score"] = scores
        return out


def fingerprint_batch(t: pa.Table, text_col: str = "text", key_col: str = "doc_id",
                      k: int = 5, window: int = 4) -> pa.Table:
    """Winnowed rolling-hash fingerprints over the token sequence
    (Schleimer et al. 2003). Returns (key, n_fingerprints, min_fingerprint,
    fingerprints:list<uint64-as-int64>)."""
    texts = t.column(text_col).to_pylist()
    fps = []
    for x in texts:
        toks = _TOKEN_RE.findall((x or "").lower())
        ids = np.fromiter((stable_hash64(w) for w in toks), dtype=np.int64, count=len(toks))
        fp = winnow_fingerprints(ids, k=k, window=window)
        fps.append((fp >> np.uint64(1)).astype(np.int64))
    return pa.table({
        key_col: t.column(key_col),
        "n_fingerprints": pa.array([f.size for f in fps], pa.int64()),
        "min_fingerprint": pa.array([int(f.min()) if f.size else 0 for f in fps], pa.int64()),
        "fingerprints": pa.array([f.tolist() for f in fps], pa.list_(pa.int64())),
    })


def token_stats(ds: "ray.data.Dataset", **kw) -> "ray.data.Dataset":
    return ds.map_batches(lambda t: token_stats_batch(t, **kw),
                          batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(ds: "ray.data.Dataset", **kw) -> "ray.data.Dataset":
    return ds.map_batches(lambda t: quality_score_batch(t, **kw),
                          batch_format="pyarrow", zero_copy_batch=True)


def lang_id(ds: "ray.data.Dataset", concurrency: int = 4) -> "ray.data.Dataset":
    return ds.map_batches(LangId, batch_format="pandas", batch_size=2048,
                          concurrency=(1, concurrency))


def fingerprints(ds: "ray.data.Dataset", **kw) -> "ray.data.Dataset":
    return ds.map_batches(lambda t: fingerprint_batch(t, **kw),
                          batch_format="pyarrow", zero_copy_batch=True)
