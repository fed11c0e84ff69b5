"""Arrow-batched executor kernels for the shingle / MinHash / band chain.

The dedup family's per-row work — word-k-gram shingling, md5-based
32-bit set hashing, MinHash permutation minima, band-key digests — was
originally pure Catalyst higher-order functions.  HOF lambdas run
OUTSIDE whole-stage codegen (interpreted Expression.eval per element,
with per-step array allocation), and profiling (r14, guide §1) showed
them dominating executor time in every MinHash operator: ~10-20 s of
task time per pass over a 5k-doc corpus, repeated once per lifecycle
phase in the index loop.

These kernels move that inner loop across an Arrow batch boundary
(guide §4.2: let Spark do distribution and I/O, hand whole batches to
vectorized native code): hashlib's C md5 for the set hashes, one NumPy
matrix pass for all MinHash permutations of a batch, and direct
``pyarrow`` list construction (flat values + offsets — no per-row
Python containers cross back).  They are BIT-IDENTICAL to the Catalyst
chain (pinned by tests/test_kernels.py against the retained expression
implementations, and transitively by every dedup-family DuckDB twin):

- tokens:    split(text, " ") with trailing empties kept; empty and
             NULL text both hash like the empty string (the Catalyst
             chain's ``when(length==0)`` + null-propagating fallback
             collapse to the same single whole-doc shingle).
- shingles:  " "-joined k-grams; docs shorter than k tokens yield one
             whole-doc shingle.
- md5i32:    first 4 md5 bytes big-endian (== conv(substr(md5,1,8),16,10)).
- sh:        first-occurrence-ordered distinct hashes (array_distinct).
- minhash:   min over the set of (a*(h mod P) + b) mod P, P = 2^31-1;
             empty set -> P per slot (the fold's init).  All products
             < 2^62: exact in int64, same as the ANSI-checked fold.
- band key:  md5 hex of concat_ws("_", band_idx, sig slice).

The map stays MAP-ONLY — no explode/regroup shuffle was added to buy
back vectorization — so the 100 TB plan shape of every caller is
unchanged; the only new plan node is one ``MapInArrow`` where the
barrier projection used to be.  Per guide §4.5 the md5/coefficient
setup is held at module level (importable module => reused across
tasks with ``spark.python.worker.reuse``).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pyarrow as pa

MERSENNE_P = (1 << 31) - 1

_COEFF_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _coeffs(n_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    key = (n_hashes, seed)
    got = _COEFF_CACHE.get(key)
    if got is None:
        from minivectordb_spark.operators.hashing import minhash_coeffs

        pairs = minhash_coeffs(n_hashes, seed)
        got = (
            np.array([a for a, _ in pairs], dtype=np.int64),
            np.array([b for _, b in pairs], dtype=np.int64),
        )
        _COEFF_CACHE[key] = got
    return got


def shingle_hashes_py(text: str | None, k: int) -> list[int]:
    """Distinct md5i32 hashes of the word-k-gram shingle set of one doc.
    Exact twin of ``dedup.shingle_hashes_from_tokens`` (see module doc)."""
    toks = text.split(" ") if text else []
    n = len(toks)
    md5 = hashlib.md5
    if n >= k:
        grams = (" ".join(toks[i : i + k]) for i in range(n - k + 1))
    else:
        grams = (" ".join(toks),)
    return list(
        dict.fromkeys(
            int.from_bytes(md5(g.encode("utf-8")).digest()[:4], "big")
            for g in grams
        )
    )


def _sh_columns(batch: pa.RecordBatch, sh_idx: int) -> tuple[np.ndarray, np.ndarray]:
    """(flat_values, lengths) of a list<int64> column, no per-row copies."""
    col = batch.column(sh_idx)
    return (
        np.asarray(col.flatten(), dtype=np.int64),
        np.asarray(col.value_lengths(), dtype=np.int64),
    )


_SCRATCH: dict[str, np.ndarray] = {}


def _scratch(name: str, size: int) -> np.ndarray:
    """Module-level reusable int64 scratch (first-fit grow).  Fresh large
    allocations per batch would re-fault pages every call; reusing one
    buffer keeps the kernel's steady-state allocation-free (guide §4.5
    worker-reuse state, same reason the md5/coeff setup is cached)."""
    buf = _SCRATCH.get(name)
    if buf is None or buf.size < size:
        buf = _SCRATCH[name] = np.empty(max(size, 1 << 18), dtype=np.int64)
    return buf[:size]


def _minhash_flat(
    flat: np.ndarray, lens: np.ndarray, A: np.ndarray, B: np.ndarray
) -> np.ndarray:
    """(n_docs, n_hashes) int64 MinHash matrix from flattened hash sets.
    One 1-D multiply-add-mod pass per permutation into reused scratch
    (no (n_hashes x batch) temporary), per-doc minima via
    ``minimum.reduceat``; empty sets -> P row."""
    n = len(lens)
    nh = len(A)
    out = np.full((n, nh), MERSENNE_P, dtype=np.int64)
    nz = lens > 0
    if not nz.any():
        return out
    m = flat.size
    hm = _scratch("hm", m)
    np.mod(flat, MERSENNE_P, out=hm)
    t = _scratch("t", m)
    nz_lens = lens[nz]
    starts = np.zeros(len(nz_lens), dtype=np.int64)
    np.cumsum(nz_lens[:-1], out=starts[1:])
    cols = out[nz]
    for j in range(nh):
        np.multiply(hm, A[j], out=t)
        t += B[j]
        t %= MERSENNE_P
        cols[:, j] = np.minimum.reduceat(t, starts)
    out[nz] = cols
    return out


def _list_array(flat: np.ndarray, lens: np.ndarray) -> pa.ListArray:
    offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.int64())
    )


def shingle_mapper(
    text_col: str, id_col: str, k: int
) -> Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]]:
    """mapInArrow fn: (id, text) batches -> (id, sh) batches."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            names = batch.schema.names
            ids = batch.column(names.index(id_col))
            texts = batch.column(names.index(text_col)).to_pylist()
            flat: list[int] = []
            lens = np.empty(len(texts), dtype=np.int64)
            for i, t in enumerate(texts):
                hs = shingle_hashes_py(t, k)
                flat.extend(hs)
                lens[i] = len(hs)
            sh = _list_array(np.array(flat, dtype=np.int64), lens)
            yield pa.RecordBatch.from_arrays([ids, sh], [id_col, "sh"])

    return fn


def minhash_mapper(
    id_col: str, n_hashes: int, seed: int, out_col: str = "minhash"
) -> Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]]:
    """mapInArrow fn: (id, sh) batches -> (id, <out_col>) signature batches."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        A, B = _coeffs(n_hashes, seed)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            names = batch.schema.names
            ids = batch.column(names.index(id_col))
            flat, lens = _sh_columns(batch, names.index("sh"))
            sig = _minhash_flat(flat, lens, A, B)
            sig_col = _list_array(
                sig.ravel(), np.full(len(lens), len(A), dtype=np.int64)
            )
            yield pa.RecordBatch.from_arrays([ids, sig_col], [id_col, out_col])

    return fn


def dsir_bucket_mapper(
    text_col: str,
    id_col: str,
    n_buckets: int,
    extra_cols: tuple[str, ...] = (),
) -> Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]]:
    """mapInArrow fn: (id[, extras], text) batches -> (id[, extras], __b)
    batches — the hashed unigram+bigram DSIR feature multiset
    (``prep._dsir_feature_buckets`` over ``text.tokens``), vectorized.

    Exact twin of the Catalyst chain (pinned by tests/test_kernels.py):

    - tokens: empty text -> no features; NULL text -> NULL bucket array
      (``size(NULL)`` is NULL, so the ``concat`` of the expression chain
      null-propagates — downstream ``explode`` drops the row either way,
      but the staged column must match for the retained twin).
    - features: every token, then every " "-joined adjacent pair (bag
      semantics — duplicates kept).
    - bucket: md5i32 (first 4 md5 bytes big-endian) mod ``n_buckets``
      (non-negative dividend, so ``%`` == Java's ``%`` here).

    A per-task memo caches token/bigram buckets (natural-language token
    frequencies are zipfian, so the md5 count collapses to near the
    vocabulary size instead of the occurrence count)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        md5 = hashlib.md5
        memo: dict[str, int] = {}

        def bucket(s: str) -> int:
            got = memo.get(s)
            if got is None:
                got = memo[s] = (
                    int.from_bytes(md5(s.encode("utf-8")).digest()[:4], "big")
                    % n_buckets
                )
            return got

        for batch in batches:
            if batch.num_rows == 0:
                continue
            names = batch.schema.names
            texts = batch.column(names.index(text_col)).to_pylist()
            flat: list[int] = []
            # a null START offset marks that row's list null (verified
            # pyarrow semantics); a null row contributes no values, so its
            # neighbours' extents are unaffected by the overwrite below
            offsets: list[int | None] = [0]
            for t in texts:
                if t is None:
                    offsets[-1] = None
                    offsets.append(len(flat))
                    continue
                toks = t.split(" ") if t else []
                for tok in toks:
                    flat.append(bucket(tok))
                for j in range(len(toks) - 1):
                    flat.append(bucket(toks[j] + " " + toks[j + 1]))
                offsets.append(len(flat))
            b_arr = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(flat, type=pa.int64()),
            )
            out_cols = [batch.column(names.index(id_col))]
            out_names = [id_col]
            for c in extra_cols:
                out_cols.append(batch.column(names.index(c)))
                out_names.append(c)
            out_cols.append(b_arr)
            out_names.append("__b")
            yield pa.RecordBatch.from_arrays(out_cols, out_names)

    return fn


def band_mapper(
    id_col: str, n_hashes: int, band_size: int, seed: int
) -> Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]]:
    """mapInArrow fn: (id, sh) batches -> (id, band_idx, band_hash)
    batches, rows fanned out n_bands per doc (the posexplode twin)."""
    n_bands = n_hashes // band_size

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        A, B = _coeffs(n_hashes, seed)
        md5 = hashlib.md5
        band_range = np.arange(n_bands, dtype=np.int32)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            names = batch.schema.names
            ids = batch.column(names.index(id_col))
            flat, lens = _sh_columns(batch, names.index("sh"))
            sig = _minhash_flat(flat, lens, A, B)
            digests = [
                md5(
                    "_".join(
                        (str(b), *map(str, row[b * band_size : (b + 1) * band_size]))
                    ).encode("utf-8")
                ).hexdigest()
                for row in sig
                for b in range(n_bands)
            ]
            out_ids = ids.take(
                pa.array(np.repeat(np.arange(n, dtype=np.int64), n_bands))
            )
            yield pa.RecordBatch.from_arrays(
                [
                    out_ids,
                    pa.array(np.tile(band_range, n), type=pa.int32()),
                    pa.array(digests, type=pa.string()),
                ],
                [id_col, "band_idx", "band_hash"],
            )

    return fn
