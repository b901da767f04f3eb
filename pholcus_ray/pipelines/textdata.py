"""Training-data text operators: dedup family, text analysis, fingerprints.

These are the large-scale-pipeline operators the reference lacks but a
100 TB web-text engine needs (deduplication, quality scoring, language ID,
token counting, fingerprinting). All are expressed Ray-Data-first:
vectorized map_batches for per-doc features; groupby shuffles only over
compact derived keys (hashes, band buckets), never over raw text bodies
where avoidable.

MinHash/LSH follows the standard public construction (Broder's minwise
hashing; banding as in Mining of Massive Datasets ch.3).
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..functions.hashing import hash64_array

_WS = re.compile(r"\s+")
_MERSENNE = (1 << 61) - 1


def _tokens(text: str) -> list[str]:
    t = text.strip()
    return _WS.split(t) if t else []


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(sf_dir: str) -> rd.Dataset:
    """Exact dedup over documents: md5(text) groups -> keeper + copy count.

    Hash computed vectorized per batch; the groupby moves only
    (hash, doc_id) pairs — the classic hash-partition + per-group-first
    dedup. md5 (not hash64) so DuckDB's md5() is a bit-exact oracle.
    """
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def h(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        md5s = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in texts]
        part = (hash64_array(md5s) % np.uint64(64)).astype(np.int32)
        return pa.table(
            {
                "text_md5": pa.array(md5s, pa.string()),
                "doc_id": t["doc_id"],
                "part": pa.array(part),
            }
        )

    def keeper(g: pd.DataFrame) -> pd.DataFrame:
        # coarse partition: one C-level pandas groupby per part, not one
        # python call per hash group
        out = g.groupby("text_md5", sort=True)["doc_id"].agg(["min", "count"])
        return pd.DataFrame(
            {
                "text_md5": out.index,
                "keep_id": out["min"].astype("int64").values,
                "n_copies": out["count"].astype("int64").values,
            }
        )

    return (
        ds.map_batches(h, batch_format="pyarrow")
        .groupby("part")
        .map_groups(keeper, batch_format="pandas")
        .sort("text_md5")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = _tokens(text.lower())
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(hash64_array(shingles) % np.uint64(_MERSENNE))


def _minhash_sig(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # h_i(x) = (a_i * x + b_i) mod p, vectorized over (perm, shingle)
    vals = (a[:, None] * sh[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


class MinHasher:
    """Actor-pool stage: per-doc minhash signatures.

    ``emit="bands"``: one LIGHT row per (doc, band) — (doc_id, band,
    band_hash, bucket_part), ~40 bytes — this is all the LSH shuffle moves.
    ``emit="sigs"``: one (doc_id, sig) row per doc, used to build the
    broadcast signature lookup for pair verification (signatures are ~1 KB;
    shipping them through the band shuffle was 30x the useful payload).
    """

    def __init__(self, num_perm: int = 128, bands: int = 32, shingle_k: int = 3,
                 seed: int = 7, emit: str = "bands"):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = shingle_k
        self.a, self.b = _minhash_params(num_perm, seed)
        self.emit = emit

    def _sigs(self, texts: list[str]) -> np.ndarray:
        sigs = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for i, text in enumerate(texts):
            sigs[i] = _minhash_sig(_shingle_hashes(text, self.k), self.a, self.b)
        return sigs

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sigs = self._sigs(t["text"].to_pylist())
        n = len(doc_ids)
        if self.emit == "sigs":
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids, pa.int64()),
                    "sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
                }
            )
        # vectorized band hashing: mix the rows of each band (splitmix-style)
        bmat = sigs.reshape(n, self.bands, self.rows)
        bh = np.zeros((n, self.bands), dtype=np.uint64)
        MIX = np.uint64(0x9E3779B97F4A7C15)
        for j in range(self.rows):
            bh = (bh ^ bmat[:, :, j]) * MIX
            bh ^= bh >> np.uint64(29)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, self.bands), pa.int64()),
                "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
                "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
                "bucket_part": pa.array(
                    (bh.reshape(-1) % np.uint64(64)).astype(np.int32)
                ),
            }
        )


def _partition_candidates(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate (a, b) pairs for ONE coarse partition of LSH buckets.

    The shuffle key is ``bucket_part = band_hash % 64`` — a coarse partition
    holding many buckets — so the per-group-call overhead is paid 64 times,
    not once per (band, band_hash) bucket; the inner bucket grouping is a
    C-level pandas groupby (per-tiny-group map_groups was 30s+ at 16k
    buckets)."""
    empty = pd.DataFrame(
        {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
    )
    if len(g) < 2:
        return empty
    rows = []
    for (_band, _bh), sub in g.groupby(["band", "band_hash"], sort=True):
        if len(sub) < 2:
            continue
        ids = np.sort(sub["doc_id"].to_numpy())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                rows.append((int(ids[i]), int(ids[j])))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["a", "b"])


def dedup_minhash_lsh(sf_dir: str, threshold: float = 0.5,
                      num_perm: int = 128, bands: int = 32) -> rd.Dataset:
    """MinHash+LSH near-duplicate pairs over documents.

    shingle->minhash per batch (actor pool amortizes the permutation
    table) -> LIGHT (doc_id, band, band_hash) rows through the bucket
    shuffle -> candidate pairs inside coarse partitions -> pair dedup ->
    verify estimated jaccard against a broadcast signature lookup.

    The signatures (~1 KB/doc) deliberately do NOT travel through the band
    shuffle (they were 30x the useful payload); they are broadcast once via
    ray.put. At corpus scale the verify becomes a two-sided bucketed join
    of pairs against the (doc_id, sig) table instead of a broadcast.
    """
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    sig_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands, emit="sigs"),
        batch_format="pyarrow",
        concurrency=2,
    ).take_all()
    sig_ref = ray.put({int(r["doc_id"]): r["sig"] for r in sig_rows})

    pairs = (
        ds.map_batches(
            MinHasher,
            fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands),
            batch_format="pyarrow",
            concurrency=2,
        )
        .groupby("bucket_part")
        .map_groups(_partition_candidates, batch_format="pandas")
    )

    def _dedup_pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
        # a pair colliding in several bands appears once per band; again
        # coarse-partitioned so each call is one C-level drop_duplicates
        return g.drop_duplicates(subset=["a", "b"])

    def _verify(t: pa.Table) -> pa.Table:
        sigs = ray.get(sig_ref)
        a_ids = t["a"].to_pylist()
        b_ids = t["b"].to_pylist()
        est = np.empty(len(a_ids), dtype=np.float64)
        for i, (x, y) in enumerate(zip(a_ids, b_ids)):
            sa = np.frombuffer(sigs[x], dtype=np.uint64)
            sb = np.frombuffer(sigs[y], dtype=np.uint64)
            est[i] = float((sa == sb).mean())
        t = t.drop_columns(["pair_part"]).append_column("est_jaccard", pa.array(est))
        return t.filter(pa.array(est >= threshold))

    out = (
        pairs.map_batches(
            lambda t: t.append_column(
                "pair_part",
                pa.array(
                    (
                        (t["a"].to_numpy(zero_copy_only=False).astype(np.uint64) * np.uint64(1000003)
                         ^ t["b"].to_numpy(zero_copy_only=False).astype(np.uint64))
                        % np.uint64(64)
                    ).astype(np.int32)
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("pair_part")
        .map_groups(_dedup_pairs_partition, batch_format="pandas")
        .map_batches(_verify, batch_format="pyarrow")
    )
    return out.sort(["a", "b"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash64(texts: list[str]) -> np.ndarray:
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, text in enumerate(texts):
        toks = _tokens(text.lower())
        if not toks:
            continue
        h = hash64_array(toks)
        bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        votes = bits.astype(np.int32).sum(axis=0) * 2 - len(toks)
        fused = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
        out[i] = fused.view(np.uint64)[0]
    return out


def simhash_docs(sf_dir: str) -> rd.Dataset:
    """64-bit SimHash per document (Charikar's similarity hash), plus a
    16-bit band decomposition for bucketed near-dup search."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def f(t: pa.Table) -> pa.Table:
        sh = _simhash64(t["text"].to_pylist())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array(sh, pa.uint64()),
                "band0": pa.array((sh & np.uint64(0xFFFF)).astype(np.uint32)),
                "band1": pa.array(((sh >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.uint32)),
                "band2": pa.array(((sh >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.uint32)),
                "band3": pa.array(((sh >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint32)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow").sort("doc_id")


def simhash_near_dups(sf_dir: str, max_hamming: int = 8) -> rd.Dataset:
    """Near-dup pairs by SimHash banding: a pair within hamming distance 3
    of 64 bits must share at least one of 4 16-bit bands (pigeonhole);
    verify the exact distance inside each band bucket."""
    sh = simhash_docs(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        parts = []
        for b in range(4):
            bv = t[f"band{b}"].to_numpy(zero_copy_only=False)
            parts.append(
                pa.table(
                    {
                        "band": pa.array(np.full(t.num_rows, b, dtype=np.int32)),
                        "band_val": t[f"band{b}"],
                        "part": pa.array(
                            ((bv.astype(np.uint64) * np.uint64(2654435761) + np.uint64(b))
                             % np.uint64(64)).astype(np.int32)
                        ),
                        "doc_id": t["doc_id"],
                        "simhash": t["simhash"],
                    }
                )
            )
        return pa.concat_tables(parts)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "hamming": pd.Series(dtype="int64")}
        )
        rows = []
        for (_b, _v), sub in g.groupby(["band", "band_val"], sort=True):
            if len(sub) < 2:
                continue
            sub = sub.sort_values("doc_id")
            ids = sub["doc_id"].to_numpy()
            hs = sub["simhash"].to_numpy().astype(np.uint64)
            for i in range(len(ids)):
                x = np.bitwise_xor(hs[i + 1 :], hs[i])
                d = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
                for j, dist in enumerate(d):
                    if dist <= max_hamming:
                        rows.append((int(ids[i]), int(ids[i + 1 + j]), int(dist)))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["a", "b", "hamming"])

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["a", "b"])

    return (
        sh.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs, batch_format="pandas")
        .map_batches(
            lambda t: t.append_column(
                "pair_part",
                pa.array(
                    ((t["a"].to_numpy(zero_copy_only=False).astype(np.uint64) * np.uint64(1000003)
                      ^ t["b"].to_numpy(zero_copy_only=False).astype(np.uint64))
                     % np.uint64(64)).astype(np.int32)
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("pair_part")
        .map_groups(dedup_pairs, batch_format="pandas")
        .map_batches(lambda t: t.drop_columns(["pair_part"]), batch_format="pyarrow")
        .sort(["a", "b"])
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.3, n: int = 3) -> rd.Dataset:
    """LSH candidates verified with EXACT character-n-gram Jaccard.

    The verify stage broadcasts the doc texts once via ray.put (documents is
    dimension-sized here; at corpus scale the verify becomes a bucketed
    join of pair keys against the doc table instead).
    """
    import pyarrow.parquet as pq

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    texts_ref = ray.put(dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())))
    cands = dedup_minhash_lsh(sf_dir, threshold=0.2)

    def verify(t: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        a_ids = t["a"].to_pylist()
        b_ids = t["b"].to_pylist()
        keep, jac = [], []
        for x, y in zip(a_ids, b_ids):
            sa = _char_ngrams(texts[x], n)
            sb = _char_ngrams(texts[y], n)
            j = len(sa & sb) / max(1, len(sa | sb))
            keep.append(j >= threshold)
            jac.append(round(j, 6))
        t = t.append_column("jaccard", pa.array(jac, pa.float64()))
        return t.filter(pa.array(keep)).drop_columns(["est_jaccard"])

    return cands.map_batches(verify, batch_format="pyarrow")


def _char_ngrams(text: str, n: int) -> set:
    s = _WS.sub(" ", text.strip().lower())
    if len(s) < n:
        return {s} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


# ---------------------------------------------------------------------------
# text analysis: tokens, quality, language, fingerprint
# ---------------------------------------------------------------------------


def token_stats(sf_dir: str) -> rd.Dataset:
    """Per-language token statistics (whitespace tokenization, DuckDB-
    matchable semantics: tokens of trim(text) split on \\s+)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"]
    )

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        ntok = np.array([len(_tokens(x)) for x in texts], dtype=np.int64)
        nchr = np.array([len(x) for x in texts], dtype=np.int64)
        return pa.table(
            {
                "lang": t["lang"],
                "n_tokens": pa.array(ntok),
                "n_chars_py": pa.array(nchr),
            }
        )

    return (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tokens", alias_name="sum_tokens"),
            Sum("n_chars_py", alias_name="sum_chars"),
        )
        .sort("lang")
    )


_BPE_RE = re.compile(r"\w+|[^\w\s]")


def text_quality(sf_dir: str) -> rd.Dataset:
    """Per-doc quality features: whitespace tokens, BPE-ish tokens,
    punct ratio, stopword ratio, mean token length, quality score."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    stop = frozenset("the a an of to in and or is are for on with as at by".split())

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        rows = {
            "doc_id": t["doc_id"],
            "n_tokens": [],
            "n_bpe_tokens": [],
            "punct_ratio": [],
            "stop_ratio": [],
            "mean_token_len": [],
            "quality": [],
        }
        for x in texts:
            toks = _tokens(x)
            bpe = _BPE_RE.findall(x)
            n = max(1, len(toks))
            punct = sum(1 for c in x if not c.isalnum() and not c.isspace())
            pr = round(punct / max(1, len(x)), 6)
            sr = round(sum(1 for w in toks if w.lower() in stop) / n, 6)
            mtl = round(sum(len(w) for w in toks) / n, 6)
            q = round(
                (1.0 if 5 <= len(toks) <= 100000 else 0.3)
                * (1.0 - min(pr * 4, 0.9))
                * (0.5 + min(sr * 2.5, 0.5)),
                6,
            )
            rows["n_tokens"].append(len(toks))
            rows["n_bpe_tokens"].append(len(bpe))
            rows["punct_ratio"].append(pr)
            rows["stop_ratio"].append(sr)
            rows["mean_token_len"].append(mtl)
            rows["quality"].append(q)
        return pa.table(
            {
                "doc_id": rows["doc_id"],
                "n_tokens": pa.array(rows["n_tokens"], pa.int64()),
                "n_bpe_tokens": pa.array(rows["n_bpe_tokens"], pa.int64()),
                "punct_ratio": pa.array(rows["punct_ratio"], pa.float64()),
                "stop_ratio": pa.array(rows["stop_ratio"], pa.float64()),
                "mean_token_len": pa.array(rows["mean_token_len"], pa.float64()),
                "quality": pa.array(rows["quality"], pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow").sort("doc_id")


_LANG_STOP = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "une", "dans", "pour"},
}


def langid_predict(texts: list[str]) -> list[str]:
    """Deterministic n-gram/stopword language heuristic: CJK char ratio
    decides zh; otherwise the stopword profile with the highest hit rate
    (ties -> en)."""
    out = []
    for x in texts:
        if not x:
            out.append("und")
            continue
        cjk = sum(1 for c in x if "一" <= c <= "鿿")
        if cjk / max(1, len(x)) > 0.05:
            out.append("zh")
            continue
        toks = [w.lower() for w in _tokens(x)]
        n = max(1, len(toks))
        best, best_score = "en", -1.0
        for lang in ("en", "es", "de", "fr"):
            score = sum(1 for w in toks if w in _LANG_STOP[lang]) / n
            if score > best_score:
                best, best_score = lang, score
        out.append(best if best_score > 0 else "en")
    return out


def lang_id(sf_dir: str) -> rd.Dataset:
    """Language-ID over documents -> per predicted language counts."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def f(t: pa.Table) -> pa.Table:
        pred = langid_predict(t["text"].to_pylist())
        return pa.table({"lang_pred": pa.array(pred, pa.string())})

    return (
        ds.map_batches(f, batch_format="pyarrow")
        .groupby("lang_pred")
        .aggregate(Count(alias_name="n"))
        .sort("lang_pred")
    )


def doc_fingerprint(sf_dir: str) -> rd.Dataset:
    """Normalized content fingerprint per doc: md5 of lower-cased,
    whitespace-collapsed text (DuckDB-matchable)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def f(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(_WS.sub(" ", x.strip().lower()).encode("utf-8")).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(fps, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# HyperLogLog sketch (mergeable approximate count-distinct)
# ---------------------------------------------------------------------------


def _hll_update(registers: np.ndarray, keys: np.ndarray, p: int) -> None:
    """Standard HLL register update (Flajolet et al. 2007): bucket = top p
    bits; rank = 1 + leading zeros of the remaining 64-p bits."""
    buckets = (keys >> np.uint64(64 - p)).astype(np.int64)
    rest = (keys << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # leading zero count via float64 exponent trick is lossy; use bit scan
    ranks = np.zeros(len(keys), dtype=np.uint8)
    v = rest.copy()
    shift = np.uint64(32)
    cnt = np.zeros(len(keys), dtype=np.uint8)
    for sh in (32, 16, 8, 4, 2, 1):
        mask = v < (np.uint64(1) << np.uint64(64 - sh))
        cnt[mask] += np.uint8(sh)
        v[mask] = v[mask] << np.uint64(sh)
    ranks = cnt + 1
    np.maximum.at(registers, buckets, ranks)


def _hll_estimate(registers: np.ndarray) -> float:
    m = len(registers)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** (-registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def hll_distinct_users(sf_dir: str, p: int = 12) -> rd.Dataset:
    """Approximate distinct users per event_type via mergeable HLL sketches:
    one (event_type, registers) partial per batch (the map-side combiner),
    merged with a C-level max-reduce in a tiny final stage — the shuffle
    moves 4 KB sketches instead of user ids. Error ~1.04/sqrt(2^p) = 1.6%.
    """
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        types, out_regs = [], []
        for ty in np.unique(et):
            sel = et == ty
            keys = hash64_array([f"u{u}" for u in uid[sel]])
            regs = np.zeros(m, dtype=np.uint8)
            _hll_update(regs, keys, p)
            types.append(str(ty))
            out_regs.append(regs.tobytes())
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "sketch": pa.array(out_regs, pa.binary()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        for blob in g["sketch"]:
            regs = np.maximum(regs, np.frombuffer(blob, dtype=np.uint8))
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_users_approx": [int(round(_hll_estimate(regs)))],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
        .sort("event_type")
    )
