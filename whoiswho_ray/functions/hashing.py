"""Deterministic hashing primitives.

Replaces the reference's implicit identity scheme (paper id ``pid`` plus the
composite ``"{pid}-{authorIdx}"`` key,
``/root/reference/whoiswho/dataset/data_process.py:458-461``) with explicit
content-derived ids, and provides the MinHash / SimHash / rolling-hash
machinery used for hot-block salting and the dedup operators.

Everything here is seed-controlled and process-stable (no Python ``hash()``,
which is salted per process).
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64 = np.uint64
_M1 = _U64(0xBF58476D1CE4E5B9)
_M2 = _U64(0x94D049BB133111EB)


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8", "surrogatepass")).hexdigest()


def record_id_of(repo: str, path: str, commit: str) -> str:
    """Stable record identity for one source-file version — the analog of
    the reference's ``pid-authorIdx`` composite key
    (``data_process.py:458-461``). Unit separator avoids ambiguity."""
    return sha256_hex("\x1f".join((repo, path, commit)))[:40]


def stable_hash64(s: str) -> int:
    """Process-stable 64-bit hash of a string (blake2b, C-speed).

    Returned as a Python int in [0, 2**63) so it fits Arrow int64."""
    d = hashlib.blake2b(s.encode("utf-8", "surrogatepass"), digest_size=8).digest()
    return int.from_bytes(d, "little") >> 1


def hash_tokens64(tokens: list[str] | set[str]) -> np.ndarray:
    """Sorted unique int64 hashes of a token collection (vector-friendly set)."""
    uniq = set(tokens)
    if not uniq:
        return np.empty(0, dtype=np.int64)
    arr = np.fromiter((stable_hash64(t) for t in uniq), dtype=np.int64, count=len(uniq))
    arr.sort()
    return arr


def _mix64(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — wrapping uint64 arithmetic is intentional."""
    v = v.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        v ^= v >> _U64(30)
        v *= _M1
        v ^= v >> _U64(27)
        v *= _M2
        v ^= v >> _U64(31)
    return v


# ---------------------------------------------------------------------------
# MinHash — used both for MinHash-LSH dedup and for hot-block salting
# (SURVEY.md §4 "salted sub-keys"): same-entity records land in the same
# band bucket with high probability, so pairs are generated inside buckets
# and recall is recovered by the transitive-closure pass.
# ---------------------------------------------------------------------------


class MinHasher:
    """k independent minhashes over int64 token ids.

    h_i(x) = splitmix64(x XOR salt_i) — a standard practical family for
    minhash signatures. Deterministic in (num_hashes, seed).
    """

    def __init__(self, num_hashes: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_hashes = num_hashes
        self.salts = rng.randint(0, np.iinfo(np.int64).max, size=num_hashes).astype(_U64)

    def signature(self, token_ids: np.ndarray) -> np.ndarray:
        """uint64[num_hashes] minhash signature; all-max for empty sets."""
        if token_ids.size == 0:
            return np.full(self.num_hashes, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = token_ids.astype(_U64)[:, None] ^ self.salts[None, :]  # (n, k)
        return _mix64(x).min(axis=0)

    def band_keys(self, token_ids: np.ndarray, bands: int, rows: int) -> list[int]:
        """LSH band bucket keys: hash each band of `rows` signature slots.

        Two sets share a band key iff their signatures agree on all `rows`
        slots of that band: P(candidate) = 1 - (1 - J^rows)^bands.
        """
        sig = self.signature(token_ids)[None, :]
        return band_keys_matrix(sig, bands, rows)[0].tolist()

    def signatures_flat(self, values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Vectorized signatures for many sets given flat (values, offsets).

        Returns uint64[n_rows, num_hashes]; empty rows get all-max.

        Hash-major loop with reused 1D buffers: the (tokens × num_hashes)
        matrix formulation streams hundreds of MB of temporaries per batch
        and is memory-bandwidth-bound (measured ~10 s per 4096×60 batch);
        iterating per hash keeps every temporary at token-stream size
        (cache-resident) for the same element count. Bit-identical output
        (same splitmix64 ops, same reduceat segments)."""
        n = offsets.size - 1
        sig = np.full((n, self.num_hashes), np.iinfo(np.uint64).max, dtype=_U64)
        if values.size == 0:
            return sig
        nonempty = np.diff(offsets) > 0
        if not nonempty.any():
            return sig
        vals = values.astype(_U64)
        starts = offsets[:-1][nonempty]
        out = np.empty((self.num_hashes, int(nonempty.sum())), dtype=_U64)
        buf = np.empty_like(vals)
        tmp = np.empty_like(vals)
        with np.errstate(over="ignore"):
            for k in range(self.num_hashes):
                np.bitwise_xor(vals, self.salts[k], out=buf)
                # splitmix64 finalizer, in place (== _mix64)
                np.right_shift(buf, _U64(30), out=tmp)
                buf ^= tmp
                buf *= _M1
                np.right_shift(buf, _U64(27), out=tmp)
                buf ^= tmp
                buf *= _M2
                np.right_shift(buf, _U64(31), out=tmp)
                buf ^= tmp
                out[k] = np.minimum.reduceat(buf, starts)
        sig[nonempty] = out.T
        return sig


def band_keys_matrix(sigs: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """Vectorized LSH band bucket keys for a signature matrix.

    sigs: uint64[n, >=bands*rows] → int64[n, bands]. Each band key is a
    mix64 fold of its `rows` signature slots seeded by the band index, so
    keys collide only when every slot in the band agrees."""
    n = sigs.shape[0]
    out = np.empty((n, bands), dtype=np.int64)
    for b in range(bands):
        acc = _mix64(np.full(n, 0x9E3779B97F4A7C15 + b, dtype=_U64))
        for r in range(rows):
            acc = _mix64(acc ^ sigs[:, b * rows + r])
        out[:, b] = (acc >> _U64(1)).astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(token_ids: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash over int64 token ids (Charikar 2002)."""
    if token_ids.size == 0:
        return 0
    bits = (token_ids.astype(_U64)[:, None] >> np.arange(64, dtype=_U64)[None, :]) & _U64(1)
    w = np.ones(token_ids.size) if weights is None else np.asarray(weights, dtype=np.float64)
    acc = ((bits.astype(np.float64) * 2.0) - 1.0).T @ w  # (64,)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# Rolling-hash document fingerprinting (winnowing, Schleimer et al. 2003)
# ---------------------------------------------------------------------------


def winnow_fingerprints(token_ids: np.ndarray, k: int = 5, window: int = 4) -> np.ndarray:
    """Winnowed k-gram rolling-hash fingerprints over the token *sequence*.

    Returns sorted unique uint64 fingerprints. Deterministic.
    """
    n = int(token_ids.size)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    x = token_ids.astype(_U64)
    base = _U64(1099511628211)
    acc = np.zeros(n - k + 1, dtype=_U64)
    with np.errstate(over="ignore"):
        for j in range(k):  # k is tiny (≤8); vectorized over positions
            acc = acc * base + x[j : n - k + 1 + j]
    grams = _mix64(acc)
    if grams.size <= window:
        return np.unique(grams)
    sw = np.lib.stride_tricks.sliding_window_view(grams, window)
    return np.unique(sw.min(axis=1))
