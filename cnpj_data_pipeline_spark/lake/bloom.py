"""Per-file key BLOOM sidecars — the third pruning level for point lookups.

Why range stats aren't enough: a merge-on-read bucket accumulates one delta
file per epoch between compactions, and each delta holds an *arbitrary*
subset of the bucket's keys — its leading-key min/max spans essentially the
whole bucket range, so the manifest kmin/kmax prune (``prune_key_files``)
keeps every generation and an mget reads all of them. Range stats only get
selective AFTER compaction key-clusters the data. A per-file bloom filter
over the leading key column is selective the moment the file is written:
a lookup for keys a delta never touched skips it outright, so point-read
cost tracks the number of generations that actually contain the key
(usually 1-2) instead of the generation count. This is the same trade
Iceberg makes with Puffin blob sidecars and Parquet with column bloom
filters; ours live next to the data file so they share its lifecycle.

Reference analogue: none — Postgres answers point lookups from its B-tree
(``init-db/postgres.sql`` PKs); a file-based lake needs file skipping to
match that access path.

Design constraints, in order:

* **Correctness over availability**: a bloom can only produce false
  POSITIVES (scan a file needlessly), never false negatives — but ONLY if
  build-time and query-time hashing agree bit-for-bit. The hash is
  pandas' vendored SipHash (``pd.util.hash_array`` with pinned keys),
  vectorized and process-stable; every sidecar additionally stores a
  SENTINEL probe (the hash of a fixed string computed at build time). A
  loader that computes a different sentinel (pandas upgrade, endianness,
  any drift) discards the sidecar and the file is scanned — pruning
  degrades to the range-stats level, never to wrong answers.
* **Sidecars are caches, not metadata**: manifests never reference them,
  any file may lack one (legacy tables, stats-less writers, discarded on
  sentinel mismatch), and deleting one is always safe.
* **Hidden filenames** (``.{data_file}.bloom``): Spark's parquet reader
  ingests every visible file in a directory it scans; dot-files are
  skipped by the FS index, so sidecars can live beside their data file.
* **Bounded size**: bits are capped (default 2^24 ≈ 2 MiB packed) — a
  pathologically large file gets a coarser filter, not an unbounded
  sidecar. At the target layout (2^14 buckets, per-epoch deltas of
  10^3..10^5 keys each) sidecars run 1-60 KiB, well under 1% of data.
"""

from __future__ import annotations

import base64
import json
import math
import os

import numpy as np

#: bump when the serialized layout or hash scheme changes; loaders ignore
#: other versions (treated as "no sidecar")
BLOOM_VERSION = 1

#: fixed 16-byte SipHash keys for the two independent hash streams
_HASH_KEY_1 = "cnpj-bloom-h1-k0"
_HASH_KEY_2 = "cnpj-bloom-h2-k0"

#: build-time/load-time agreement probe (see module docstring)
_SENTINEL = "\x00cnpj-bloom-sentinel\x00"

DEFAULT_FPP = 0.01
MIN_BITS = 1 << 8
MAX_BITS = 1 << 24


def sidecar_path(data_path: str) -> str:
    d, base = os.path.split(data_path)
    return os.path.join(d, f".{base}.bloom")


def _normalize(values) -> np.ndarray:
    """Key values → canonical string forms, shared by build and query.
    Lossless for the string/int keys the engine buckets on; any type whose
    str() is stable per value is safe (both sides use THIS function)."""
    return np.asarray(
        ["\x00null" if v is None else str(v) for v in values], dtype=object
    )


def _hashes(norm: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    import pandas as pd

    h1 = pd.util.hash_array(norm, hash_key=_HASH_KEY_1, categorize=False)
    h2 = pd.util.hash_array(norm, hash_key=_HASH_KEY_2, categorize=False)
    return h1.astype(np.uint64), (h2 | np.uint64(1)).astype(np.uint64)


def _sentinel_probe() -> int:
    h1, _ = _hashes(_normalize([_SENTINEL]))
    return int(h1[0])


def _params(n: int, fpp: float) -> tuple[int, int]:
    """(m bits, k probes) for n keys at target fpp, m capped to MAX_BITS
    (k re-derived from the capped m, so probes stay optimal for the filter
    we actually store)."""
    n = max(n, 1)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = max(MIN_BITS, min(m, MAX_BITS))
    k = max(1, min(16, round(m / n * math.log(2))))
    return m, k


def _positions(norm: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(norm), k) probe positions via double hashing."""
    h1, h2 = _hashes(norm)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(
        np.int64
    )


def _distinct_norm(values) -> np.ndarray:
    """Distinct canonical key strings, cheap: the build cost rides INSIDE
    the ingest write tasks, so it's budgeted like merge work, not like
    maintenance. For Arrow string/int columns (the engine's key types) the
    distinct pass is C++ ``dictionary_encode`` and only the ~distinct
    values ever become Python-visible (40k distinct in a 250k-row delta:
    ~40 ms vs ~190 ms for hash-everything + unique-on-strings). Arrow's
    int→string cast renders exactly like Python ``str(int)``, so the fast
    path stays bit-compatible with the query side's ``_normalize``; any
    other type falls back to the Python path."""
    try:
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            t = values.type
            if (
                pa.types.is_string(t)
                or pa.types.is_large_string(t)
                or pa.types.is_integer(t)
            ):
                s = pc.fill_null(pc.cast(values, pa.string()), "\x00null")
                if isinstance(s, pa.ChunkedArray):
                    s = s.combine_chunks()
                d = s.dictionary_encode().dictionary
                return d.to_numpy(zero_copy_only=False).astype(object)
            values = values.to_pylist()
    except ImportError:
        pass
    norm = _normalize(values)
    return np.unique(norm) if len(norm) else norm


def build_bloom(values, fpp: float = DEFAULT_FPP) -> dict:
    """Bloom dict over the given key values — a list, numpy array, or an
    Arrow (Chunked)Array (preferred in write tasks: the distinct pass stays
    in C++). Deltas repeat keys across row versions; sizing on distinct
    count keeps bits tight for the same fpp."""
    norm = _distinct_norm(values)
    m, k = _params(len(norm), fpp)
    bits = np.zeros(m, dtype=bool)
    if len(norm):
        bits[_positions(norm, m, k).ravel()] = True
    return {
        "v": BLOOM_VERSION,
        "m": m,
        "k": k,
        "n": int(len(norm)),
        "sentinel": _sentinel_probe(),
        "bits": base64.b64encode(np.packbits(bits).tobytes()).decode("ascii"),
    }


def write_sidecar(data_path: str, values, fpp: float = DEFAULT_FPP) -> str:
    """Build + atomically write the sidecar for a data file. Returns the
    sidecar path. Atomic (tmp + rename) so a concurrent reader never sees a
    torn filter — it sees either no sidecar (scan) or a complete one."""
    sp = sidecar_path(data_path)
    tmp = sp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(build_bloom(values, fpp), f)
    os.replace(tmp, sp)
    return sp


def load_sidecar(data_path: str) -> dict | None:
    """Parsed + VALIDATED bloom for a data file, or None (missing, torn,
    version/hash-scheme mismatch — all mean 'scan the file')."""
    sp = sidecar_path(data_path)
    try:
        with open(sp) as f:
            b = json.load(f)
    except (OSError, ValueError):
        return None
    if (
        not isinstance(b, dict)
        or b.get("v") != BLOOM_VERSION
        or b.get("sentinel") != _sentinel_probe()
    ):
        return None
    try:
        raw = np.frombuffer(
            base64.b64decode(b["bits"]), dtype=np.uint8
        )
        bits = np.unpackbits(raw)
        if len(bits) < int(b["m"]):
            return None
        b["_bits"] = bits
    except (KeyError, ValueError, TypeError):
        return None
    return b


def may_contain_any(bloom: dict, keys) -> bool:
    """True iff ANY of the keys may be present (bloom semantics: False is
    definite absence). Vectorized over the whole key list."""
    norm = _normalize(keys)
    if not len(norm):
        return False
    pos = _positions(norm, int(bloom["m"]), int(bloom["k"]))
    return bool(bloom["_bits"][pos].all(axis=1).any())


def is_sidecar(filename: str) -> bool:
    return filename.startswith(".") and filename.endswith(".bloom")


def data_file_of_sidecar(sidecar: str) -> str:
    """Inverse of :func:`sidecar_path` (basename form ok)."""
    d, base = os.path.split(sidecar)
    return os.path.join(d, base[1:-len(".bloom")])


def remove_sidecar(data_path: str) -> None:
    try:
        os.remove(sidecar_path(data_path))
    except OSError:
        pass
